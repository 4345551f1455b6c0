package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-native registration of the engine's SQL surface:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * `dot_d` / `l2norm_d` / `cosine_sim_d` available in every session of
  * every application — no driver-side [[GraftSql.register]] call, and
  * the functions exist before any user code runs (thrift server, SQL
  * notebooks, cross-language clients). [[GraftSql.register]] stays for
  * ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_d"),
      info("dot_d", "dot_d(a, b) - sequential-double dot product"),
      (exprs: Seq[Expression]) => DotProductD(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("l2norm_d"),
      info("l2norm_d", "l2norm_d(a) - sequential-double L2 norm"),
      (exprs: Seq[Expression]) => L2NormD(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim_d"),
      info("cosine_sim_d", "cosine_sim_d(a, b) - sequential-double cosine"),
      (exprs: Seq[Expression]) => CosineSimD(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("int8_cosine_sim"),
      info("int8_cosine_sim",
        "int8_cosine_sim(a, b) - cosine over BINARY int8 codes"),
      (exprs: Seq[Expression]) => Int8CosineSim(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("splitmix64"),
      info("splitmix64",
        "splitmix64(x[, seed]) - deterministic 64-bit mix (sampling/shuffle key)"),
      (exprs: Seq[Expression]) => Splitmix64.fromArgs(exprs)))
    ext.injectFunction((FunctionIdentifier("race_key"),
      info("race_key",
        "race_key(id, w[, seed]) - A-ES weighted-sampling race key " +
          "(k smallest = weighted sample without replacement)"),
      (exprs: Seq[Expression]) => graft.pipeline.RaceKey.fromArgs(exprs)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - UAX #15 NFC canonicalization (pre-dedup)"),
      (exprs: Seq[Expression]) => NormalizeExpressions.nfcFromArgs(exprs)))
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      info("strip_accents",
        "strip_accents(s) - NFD + drop combining marks (CCNet canon)"),
      (exprs: Seq[Expression]) => NormalizeExpressions.stripFromArgs(exprs)))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(text, w) - rolling 64-bit w-token window hashes"),
      (exprs: Seq[Expression]) => SqlBuilders.shingleHashes(exprs)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit near-dup signature"),
      (exprs: Seq[Expression]) => SqlBuilders.simhash64(exprs)))
    ext.injectFunction((FunctionIdentifier("lang_id"),
      info("lang_id",
        "lang_id(text) - heuristic language id (struct lang, score)"),
      (exprs: Seq[Expression]) => SqlBuilders.langId(exprs)))
    ext.injectFunction((FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim",
        "jaccard_sim(a, b) - exact Jaccard of two BIGINT shingle arrays"),
      (exprs: Seq[Expression]) => SqlBuilders.jaccardSim(exprs)))
    ext.injectFunction((FunctionIdentifier("mul_div_floor"),
      info("mul_div_floor",
        "mul_div_floor(a, b, c) - exact floor(a*b/c), overflow-safe"),
      (exprs: Seq[Expression]) => SqlBuilders.mulDivFloor(exprs)))
    ext.injectFunction((FunctionIdentifier("fingerprint"),
      info("fingerprint",
        "fingerprint(text) - md5 of whitespace/case-normalized text"),
      (exprs: Seq[Expression]) => SqlBuilders.fingerprint(exprs)))
    ext.injectFunction((FunctionIdentifier("normalized_fingerprint"),
      info("normalized_fingerprint",
        "normalized_fingerprint(text) - NFC-canonical dedup fingerprint"),
      (exprs: Seq[Expression]) => SqlBuilders.normalizedFingerprint(exprs)))
  }
}
