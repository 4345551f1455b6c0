package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations over chunk/entry frames (§2.7).
  *
  * U1: the reference unions chunk maps with Python `dict |` — RIGHT
  * side wins on key collision (reader.py:194-207; keys are
  * (path, start, end), so collisions only occur for duplicate specs).
  * U2: plain ordered concatenation (reader.py:1154-1158, cli.py:236-263)
  * is `unionByName` with a `specOrd` column.
  */
object SetOps {

  /** Union chunk frames keyed by (path, start, end), LAST occurrence
    * wins — `ft.reduce(dict.__or__, ...)` semantics. Frames must carry
    * a `specOrd` column establishing the union order.
    */
  def unionLastWins(frames: Seq[DataFrame],
                    keyCols: Seq[String] = Seq("path", "start", "end")): DataFrame = {
    val unioned = frames.reduce(_ unionByName _)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("specOrd").desc)
    unioned.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }
}
