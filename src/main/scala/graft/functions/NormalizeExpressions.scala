package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization as native codegen expressions — the
  * standard pre-dedup step (CCNet normalizes before hashing; so do
  * the Dolma/RefinedWeb recipes): visually-identical strings whose
  * byte encodings differ (composed é vs e + U+0301) must hash
  * identically or every downstream dedup/fingerprint family
  * under-merges.
  *
  * [[NfcNormalize]] is UAX #15 NFC via the JDK's `java.text.Normalizer`
  * (DuckDB's `nfc_normalize` implements the same algorithm, which is
  * what lets the oracle replay the bytes exactly). [[StripAccentsExpr]]
  * is NFD + drop non-spacing marks — CCNet's `strip_accents`, and
  * byte-equal to DuckDB's `strip_accents` on Latin-script input.
  *
  * 100 TB shape: pure per-row map work inside whole-stage codegen, no
  * UDF boundary; the hot path short-circuits via
  * `Normalizer.isNormalized`, so an already-NFC corpus (nearly all
  * real text — ASCII is trivially normalized) pays one scan of the
  * char array and ZERO allocation, and only the rare denormalized row
  * pays the normalization allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NormalizeExpressions.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.NormalizeExpressions.nfc($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(s: Any): Any =
    NormalizeExpressions.stripAccents(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.NormalizeExpressions.stripAccents($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NormalizeExpressions {
  /** NFC with the normalized-input fast path: returns the INPUT
    * UTF8String untouched (no copy) when already normalized.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD, then drop COMBINING marks (category Mn) — ASCII input short-
    * circuits on the isNormalized probe plus a mark scan that finds
    * nothing, allocating only the decomposed buffer when marks exist.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFD)) str
      else Normalizer.normalize(str, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < nfd.length && !hasMark) {
      if (Character.getType(nfd.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) { if (nfd eq str) s else UTF8String.fromString(nfd) }
    else {
      val b = new java.lang.StringBuilder(nfd.length)
      i = 0
      while (i < nfd.length) {
        val c = nfd.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) b.append(c)
        i += 1
      }
      UTF8String.fromString(b.toString)
    }
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def stripAccents(c: Column): Column =
    ColumnBridge.column(StripAccentsExpr(ColumnBridge.expression(c)))

  /** SQL-surface builders (GraftSql / GraftExtensions). */
  def nfcFromArgs(exprs: Seq[Expression]): NfcNormalize = exprs match {
    case Seq(s) => NfcNormalize(s)
    case _ => throw new IllegalArgumentException(
      s"nfc_normalize expects 1 argument, got ${exprs.size}")
  }
  def stripFromArgs(exprs: Seq[Expression]): StripAccentsExpr = exprs match {
    case Seq(s) => StripAccentsExpr(s)
    case _ => throw new IllegalArgumentException(
      s"strip_accents expects 1 argument, got ${exprs.size}")
  }
}
