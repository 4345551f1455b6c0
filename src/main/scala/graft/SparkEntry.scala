package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (plus the training-data-pipeline extensions); `oracleSql` carries a
  * DuckDB-equivalent ANSI SQL statement for every SQL-expressible
  * query. Column names/types are aligned between both sides — the
  * driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query — the reference's exact cosine top-k retrieval
    * (vectordb.py:190-214) — on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("vdb_topk_cosine")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all

  def oracleSql: Map[String, String] = graft.queries.Queries.allSql
}
