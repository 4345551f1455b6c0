package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the ingest-time answer to the
  * shuffle-on-every-join tax. At 100 TB a fact table is bucketed ONCE
  * when it lands (`bucketBy(n, key).sortBy(key)`); every subsequent
  * equi-join or aggregation on that key reads bucket i against bucket
  * i with ZERO exchange — the join cost drops from
  * shuffle-everything-every-query to a per-bucket merge, and the sort
  * order makes it a streaming merge with no in-memory hash build.
  * Spark's planner proves co-location from the table metadata
  * (`Bucketed: true` scans, no Exchange above them — pinned by
  * BucketingSpec); both sides must agree on the bucketing key, and
  * bucket counts must match or divide (bucket coalescing).
  *
  * The reference runs single-process and never pre-partitions
  * (SURVEY §2 J-family is all in-memory); this operator exists for
  * the scale track, like M7's watermarks.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `key` — the layout every later join/agg on `key` reuses.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog doesn't survive the JVM but the warehouse
    // directory does: a stale location from an earlier session makes
    // CREATE TABLE fail with LOCATION_ALREADY_EXISTS even after the
    // DROP above (which only clears the catalog). Clear it too.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(wh), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Inner equi-join of two bucketed tables on their bucketing key.
    * Just a `join` — the zero-exchange plan comes from the tables'
    * metadata, not from operator trickery; callers compose filters/
    * aggregations on top as usual.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
