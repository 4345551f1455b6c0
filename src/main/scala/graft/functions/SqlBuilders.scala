package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared arg-list builders for the text/dedup kernels' SQL surface
  * ([[GraftSql]] ad-hoc registration and [[GraftExtensions]] cluster
  * injection register the same names): a `spark.sql` user gets the
  * dedup/fingerprint/quality kernels without touching the Scala API —
  * `SELECT fingerprint(text)`, `simhash64(text)`,
  * `jaccard_sim(shingle_hashes(a, 3), shingle_hashes(b, 3))`, etc.
  */
object SqlBuilders {

  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.size == n,
      s"$name expects $n argument(s), got ${exprs.size}")

  def shingleHashes(exprs: Seq[Expression]): Expression = {
    arity("shingle_hashes", exprs, 2)
    ShingleHashes(exprs.head, exprs(1))
  }

  def simhash64(exprs: Seq[Expression]): Expression = {
    arity("simhash64", exprs, 1)
    Simhash64(exprs.head)
  }

  def langId(exprs: Seq[Expression]): Expression = {
    arity("lang_id", exprs, 1)
    LangId(exprs.head)
  }

  def jaccardSim(exprs: Seq[Expression]): Expression = {
    arity("jaccard_sim", exprs, 2)
    JaccardSim(exprs.head, exprs(1))
  }

  def mulDivFloor(exprs: Seq[Expression]): Expression = {
    arity("mul_div_floor", exprs, 3)
    MulDivFloor(exprs.head, exprs(1), exprs(2))
  }

  // The fingerprint compositions are built as RESOLVED catalyst trees
  // (not via the Column API, whose lazily-resolved nodes don't
  // survive function-registry splicing) — the same
  // md5(lower(trim(regexp_replace(…, \s+, ' '))))::binary fold as
  // TextAnalysis.fingerprint / normalizedFingerprint.
  private def fpTree(text: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BinaryType, StringType}
    Md5(Cast(Lower(StringTrim(RegExpReplace(text,
      Literal.create("\\s+", StringType),
      Literal.create(" ", StringType)))), BinaryType))
  }

  def fingerprint(exprs: Seq[Expression]): Expression = {
    arity("fingerprint", exprs, 1)
    fpTree(exprs.head)
  }

  def normalizedFingerprint(exprs: Seq[Expression]): Expression = {
    arity("normalized_fingerprint", exprs, 1)
    fpTree(NfcNormalize(exprs.head))
  }
}
