package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Bridges Catalyst {@code Expression}s to user-facing {@code Column}s on
 * Spark 4.x, where the Column class is backed by ColumnNode and no longer
 * exposes an Expression constructor. ExpressionUtils is public in bytecode
 * (its Scala access restriction is compile-time only), so a Java caller
 * links against it directly.
 */
public final class ColumnBridge {
    private ColumnBridge() {}

    public static Column column(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    public static Expression expression(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }
}
