package graft.pipeline

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic weighted corpus mixing — the "data mixture" step of a
  * training pipeline: given per-stratum sampling weights (language,
  * source, quality bucket, ...), emit each row `floor(w)` times plus
  * one more with probability `frac(w)`, so a stratum with weight 0.25
  * is 4×-downsampled, weight 1.0 passes through, and weight 2.5 is
  * repeated 2–3× (expected 2.5) — epoch mixing and downsampling in one
  * relational pass.
  *
  * Scale shape: a pure map-side operator — the keep/repeat decision is
  * `splitmix64(id + seed)` per row (codegen'd, no UDF), there is no
  * shuffle, no aggregation, and no driver state beyond the weight map
  * literal. At 100 TB this is exactly a scan with a generator; the
  * decision is reproducible row-by-row from (id, seed) alone, so
  * re-runs, retries, and other engines (the Python oracle) agree
  * bit-for-bit, and changing one stratum's weight does not reshuffle
  * any other stratum's sample (per-row hashes are independent of the
  * weight table).
  */
object Mix {

  /** Sample/repeat `df` by per-stratum weight. Output keeps all input
    * columns and appends `copy` (0-based repetition index, LongType) —
    * downstream packing/shuffling can use (id, copy) as the row key.
    *
    * @param weights  stratum value → weight ≥ 0; missing strata fall
    *                 back to `defaultWeight`. Weights need not sum to
    *                 anything: they are per-row multiplicities, not a
    *                 distribution.
    */
  def byWeight(df: DataFrame, idCol: String, stratumCol: String,
               weights: Map[String, Double], defaultWeight: Double = 1.0,
               seed: Long = 42L): DataFrame = {
    require(weights.values.forall(_ >= 0.0) && defaultWeight >= 0.0,
      "weights must be non-negative")
    val reserved = Seq("copy", "__copies", "__pos", "__one")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"byWeight appends a `copy` column and uses ${reserved.tail.mkString("/")}" +
        s" internally; rename ${clash.mkString(", ")} first")
    val wMap = typedlit(weights)
    // try_element_at: ANSI mode (Spark 4 default) makes plain
    // element_at throw on a missing map key; absent strata must fall
    // back to defaultWeight instead.
    val w = coalesce(try_element_at(wMap, col(stratumCol).cast("string")),
      lit(defaultWeight))
    // A null (or, under non-ANSI configs, non-castable) id leaves the
    // per-row sampling decision undefined — the `when(u < frac)` below
    // would silently resolve to 0 extra copies and fractional-weight
    // strata would be floor-dropped forever. Fail loudly instead.
    val idLong = coalesce(col(idCol).cast(LongType),
      raise_error(lit(s"Mix.byWeight: id column '$idCol' must be " +
        "non-null and castable to BIGINT — the repeat decision is a " +
        "pure function of (id, seed)")))
    // copies = floor(w) + [u < frac(w)]; u is the exact dyadic uniform
    // from the row id, so the fractional part admits one extra copy
    // with probability frac(w), independently per row. The seed folds
    // in INSIDE the hash expression — `id + seed` as plan arithmetic
    // would throw (not wrap) on overflow under ANSI mode.
    val u = HashFunctions.unitUniform(idLong, seed)
    val base = floor(w).cast("int")
    val copies = base + when(u < (w - floor(w)), lit(1)).otherwise(lit(0))
    // generator outputs get collision-proof aliases: a user column
    // named `pos`/`col` must pass through untouched
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .select(df.columns.map(col) :+
        posexplode(array_repeat(lit(1), col("__copies")))
          .as(Seq("__pos", "__one")): _*)
      .withColumn("copy", col("__pos").cast(LongType))
      .drop("__pos", "__one", "__copies")
  }

  /** Deterministic global training-order shuffle: append
    * `skey = splitmix64(id + seed)` and sort by it. The sort is
    * Spark's distributed range-partitioned sort — sampled range
    * bounds, no single-partition window, no driver materialization —
    * and the order is a pure function of (id, seed): stable across
    * re-runs, engines, and partitionings, and re-keyable per epoch by
    * bumping the seed. (A training pipeline wants exactly this before
    * sequence packing: mixture-independent, reproducible order.)
    */
  /** Temperature-scaled stratum re-weighting — the mT5/XLM-R
    * multilingual sampling recipe (Xue et al. 2021 §3.1; Conneau et
    * al. 2020 α-sampling): target share q_s ∝ p_s^(1/τ), so τ = 1
    * keeps the natural distribution and larger τ flattens it toward
    * uniform (up-sampling low-resource strata, down-sampling the
    * head). Per-row multiplicity w_s = (q_s/p_s) normalized to keep
    * the expected corpus size: w_s = (r_s/Z)·N/n_s with
    * r_s = p_s^(1/τ), Z = Σ r_s.
    *
    * Scale shape: ONE pruned count aggregation over the stratum
    * column (driver state = #strata, the usual lang/source
    * cardinality), then the map-side [[byWeight]] pass — no further
    * shuffle. Determinism: the weight table is computed driver-side
    * with a FIXED fold order (strata sorted) and, for τ = 2, the
    * correctly-rounded `sqrt` (IEEE-exact in every engine — the
    * oracle fixture pins τ = 2; general τ goes through `pow`, which
    * is 1-ulp across platforms and therefore spec-covered, not
    * oracle-hashed).
    */
  def byTemperature(df: DataFrame, idCol: String, stratumCol: String,
                    tau: Double, seed: Long = 42L): DataFrame = {
    require(tau > 0.0, "temperature must be positive")
    val counts = df.groupBy(col(stratumCol).cast("string").as("s"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(!counts.contains(null),
      "byTemperature: stratum column must be non-null")
    val n = counts.values.sum.toDouble
    val strata = counts.keys.toSeq.sorted
    def root(p: Double): Double =
      if (tau == 2.0) math.sqrt(p) else math.pow(p, 1.0 / tau)
    val rs = strata.map(s => s -> root(counts(s).toDouble / n))
    val z = rs.map(_._2).sum // fixed fold order: sorted strata
    val weights = rs.map { case (s, r) =>
      s -> ((r / z) * n / counts(s).toDouble)
    }.toMap
    byWeight(df, idCol, stratumCol, weights, defaultWeight = 1.0, seed)
  }

  def shuffleOrder(df: DataFrame, idCol: String, seed: Long = 42L): DataFrame =
    df.withColumn("skey",
        graft.functions.HashFunctions.splitmix64(
          col(idCol).cast(LongType), seed))
      .orderBy(col("skey"), col(idCol))
}
