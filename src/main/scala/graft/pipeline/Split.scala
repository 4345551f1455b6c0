package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic train/val/test splitting — the corpus-partitioning
  * step every training pipeline runs before anything touches a
  * trainer. Two variants with an explicit exactness/scale contract:
  *
  *  - [[assignSplits]]: map-side proportional assignment by the
  *    engine's deterministic per-row uniform (splitmix64 of
  *    (id, seed)). ZERO shuffle, pure codegen'd column — the 100 TB
  *    default. Split sizes are exact in expectation with O(√n)
  *    binomial error (the same contract as Spark's own
  *    `randomSplit`/`sampleBy`, but reproducible across runs AND
  *    partitionings because the uniform is a pure function of id).
  *
  *  - [[splitStratified]]: EXACT per-stratum quotas — stratum s of
  *    n_s rows contributes precisely floor(cumF_j·n_s) −
  *    floor(cumF_{j−1}·n_s) rows to split j, the rows with the
  *    smallest (u, id) ranks. The per-stratum rank is computed the
  *    distributed way (the [[SeqPack]] pattern): range-repartition by
  *    (stratum, u, id), per-partition window (parallel), driver-side
  *    prefix of the P×(strata spanning each partition) counts —
  *    never a one-reducer per-stratum window, so a single giant
  *    stratum still splits across many partitions. Driver state is
  *    O(P + #strata): the stratum cardinality must be
  *    driver-boundable (lang, source, domain — the usual strata),
  *    the strata SIZES need not be balanced.
  *
  * Both are deterministic per (id, seed): re-running on a grown
  * corpus keeps every previously-assigned row in its split under
  * [[assignSplits]] (append-stable — the property that prevents
  * train/test leakage across dataset versions), while
  * [[splitStratified]] re-cuts exactly (quota shifts move only
  * boundary rows).
  */
object Split {

  private def checkFractions(fractions: Seq[(String, Double)]): Unit = {
    require(fractions.nonEmpty, "at least one split required")
    require(fractions.map(_._1).distinct.size == fractions.size,
      "split names must be distinct")
    require(fractions.forall(_._2 > 0.0), "fractions must be positive")
    val s = fractions.map(_._2).sum
    require(math.abs(s - 1.0) < 1e-9, s"fractions must sum to 1, got $s")
  }

  /** Cumulative fraction bounds in declaration order (IEEE left scan
    * — the Python oracle replays the same additions).
    */
  private def cumBounds(fractions: Seq[(String, Double)]): Seq[Double] =
    fractions.map(_._2).scanLeft(0.0)(_ + _).tail

  /** Map-side proportional split: adds `splitCol` with the name of
    * the split whose cumulative-fraction interval contains the row's
    * deterministic uniform. The last split is the catch-all for
    * u ∈ [cumF_{k−1}, 1), absorbing float-boundary dust.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   fractions: Seq[(String, Double)], seed: Long,
                   splitCol: String = "split"): DataFrame = {
    checkFractions(fractions)
    val u = graft.functions.HashFunctions.unitUniform(col(idCol), seed)
    val bounds = cumBounds(fractions)
    val assigned = fractions.init.zip(bounds.init)
      .foldRight(lit(fractions.last._1)) { case (((name, _), b), rest) =>
        when(u < lit(b), lit(name)).otherwise(rest)
      }
    df.withColumn(splitCol, assigned)
  }

  /** Leakage-safe split: assignment is keyed by the NORMALIZED
    * CONTENT fingerprint ([[TextAnalysis.normalizedFingerprint]]),
    * not the row id — exact and Unicode-equivalent duplicates land in
    * the SAME split by construction, so a duplicate pair can never
    * straddle train/test (the classic eval leak a row-keyed split
    * permits). Buckets are the first two hex chars of the md5
    * fingerprint — 256 uniform buckets whose threshold compare is a
    * pure lowercase-hex STRING compare (hex is lexicographically
    * ordered), so any engine replays the assignment from md5 alone.
    * Fractions round DOWN to 1/256 granularity (cut_j =
    * floor(cumF_j·256); the last split absorbs the remainder); `salt`
    * re-keys the assignment like a seed. Map-side, zero shuffle,
    * whole-stage codegen.
    */
  def splitByContent(df: DataFrame, textCol: String,
                     fractions: Seq[(String, Double)], salt: String = "",
                     splitCol: String = "split"): DataFrame = {
    checkFractions(fractions)
    val fp = md5(concat(lit(salt),
      lower(trim(regexp_replace(
        graft.functions.NormalizeExpressions.nfcNormalize(col(textCol)),
        "\\s+", " ")))).cast(BinaryType))
    val bucket = substring(fp, 1, 2)
    val cuts = cumBounds(fractions).init
      .map(b => f"${math.floor(b * 256).toLong}%02x")
    val assigned = fractions.init.map(_._1).zip(cuts)
      .foldRight(lit(fractions.last._1)) { case ((name, hex), rest) =>
        when(bucket < lit(hex), lit(name)).otherwise(rest)
      }
    df.withColumn(splitCol, assigned)
  }

  /** Exact-quota stratified split: (doc, stratum, split) with every
    * stratum cut precisely at floor(cumF_j · n_s) by (u, id) rank.
    * See the object doc for the distributed-rank construction.
    */
  def splitStratified(spark: SparkSession, df: DataFrame, idCol: String,
                      strataCol: String,
                      fractions: Seq[(String, Double)], seed: Long,
                      numParts: Int = 0): DataFrame = {
    checkFractions(fractions)
    val parts =
      if (numParts > 0) numParts else spark.sessionState.conf.numShufflePartitions
    val u = graft.functions.HashFunctions.unitUniform(col(idCol), seed)
    val base = df
      .select(col(idCol).as("doc"),
        col(strataCol).cast(StringType).as("stratum"), u.as("u"))
      .repartitionByRange(parts, col("stratum"), col("u"), col("doc"))
      .sortWithinPartitions("stratum", "u", "doc")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // P × (strata spanning each partition) counts — each stratum is
    // contiguous in range order, so this collect is O(P + #strata)
    val cnt = base.groupBy(col("pid"), col("stratum")).count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val strata = cnt.keys.map(_._2).toSeq.distinct.sorted
    val pids = cnt.keys.map(_._1).toSeq.distinct.sorted
    // stratum-local offset of each partition = rows of that stratum
    // in all earlier partitions (range order makes "earlier" global)
    val offRows = for {
      s <- strata; p <- pids
      if cnt.contains((p, s))
    } yield {
      val off = pids.filter(_ < p).map(q => cnt.getOrElse((q, s), 0L)).sum
      (p, s, off)
    }
    // exact cut points per stratum: floor(cumF_j · n_s), last = n_s
    val bounds = cumBounds(fractions)
    val cutRows = strata.map { s =>
      val n = pids.map(p => cnt.getOrElse((p, s), 0L)).sum
      val cuts = bounds.init.map(b => math.floor(b * n).toLong) :+ n
      (s, cuts)
    }
    import spark.implicits._
    val offDf = offRows.toDF("pid", "stratum", "off")
    val cutDf = cutRows.toDF("stratum", "cuts")
    val w = Window.partitionBy(col("pid"), col("stratum"))
      .orderBy(col("u"), col("doc"))
    val names = fractions.map(_._1)
    val assigned = names.init.zipWithIndex
      .foldRight(lit(names.last)) { case ((name, j), rest) =>
        when(col("rank0") < col("cuts")(j), lit(name)).otherwise(rest)
      }
    base.join(broadcast(offDf), Seq("pid", "stratum"))
      .join(broadcast(cutDf), Seq("stratum"))
      .withColumn("rank0", row_number().over(w).cast(LongType) - 1L + col("off"))
      .withColumn("split", assigned)
      .select(col("doc"), col("stratum"), col("u"), col("split"))
  }
}
