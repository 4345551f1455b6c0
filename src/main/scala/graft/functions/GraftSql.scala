package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration of the engine's scalar functions, so `spark.sql`
  * users get the same surface as the Column API:
  * `SELECT cosine_sim_d(a, b)`, `dot_d`, `l2norm_d`.
  */
object GraftSql {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_d",
      exprs => DotProductD(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2norm_d",
      exprs => L2NormD(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim_d",
      exprs => CosineSimD(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("int8_cosine_sim",
      exprs => Int8CosineSim(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("splitmix64",
      Splitmix64.fromArgs, "scala_udf")
    reg.createOrReplaceTempFunction("race_key",
      graft.pipeline.RaceKey.fromArgs, "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      NormalizeExpressions.nfcFromArgs, "scala_udf")
    reg.createOrReplaceTempFunction("strip_accents",
      NormalizeExpressions.stripFromArgs, "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes",
      SqlBuilders.shingleHashes, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      SqlBuilders.simhash64, "scala_udf")
    reg.createOrReplaceTempFunction("lang_id",
      SqlBuilders.langId, "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_sim",
      SqlBuilders.jaccardSim, "scala_udf")
    reg.createOrReplaceTempFunction("mul_div_floor",
      SqlBuilders.mulDivFloor, "scala_udf")
    reg.createOrReplaceTempFunction("fingerprint",
      SqlBuilders.fingerprint, "scala_udf")
    reg.createOrReplaceTempFunction("normalized_fingerprint",
      SqlBuilders.normalizedFingerprint, "scala_udf")
  }
}
