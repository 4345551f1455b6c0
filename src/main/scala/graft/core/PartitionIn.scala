package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Partition-pruning In-filters that match the READ-BACK type of the
  * partition column. A layout written with a LONG bucket column comes
  * back from partition-value inference as INT, so a filter built from
  * the writer-side Long values compares through an inserted cast —
  * pruning then relies on Spark pushing the predicate through the
  * cast, which works today but is version-fragile. Casting the
  * VALUES to the inferred column type instead keeps the In on the
  * bare partition attribute, the form PartitionFilters always prunes.
  */
object PartitionIn {

  /** `col(name) IN (vals)` with the values narrowed to `df`'s actual
    * type for `name` — cast-free on the column side.
    */
  def inSet(df: DataFrame, name: String, vals: Seq[Long]): Column = {
    val c = df(name)
    df.schema(name).dataType match {
      case LongType    => c.isInCollection(vals)
      case IntegerType => c.isInCollection(vals.map(_.toInt))
      case ShortType   => c.isInCollection(vals.map(_.toShort))
      case ByteType    => c.isInCollection(vals.map(_.toByte))
      case _           => c.isInCollection(vals)
    }
  }
}
