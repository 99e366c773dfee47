package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_nfc(s)` — Unicode NFC normalization as a native codegen'd
 * expression (java.text.Normalizer, JDK-only). Web-crawl text mixes
 * composed and decomposed forms of the same grapheme ("é" as U+00E9 vs
 * e + U+0301); every hash-keyed operator in the pipeline — exact dedup,
 * shingles, fingerprints — treats those as different bytes unless the
 * corpus is normalized first, so NFC is the canonical first cleaning
 * pass. NFC is a Unicode-standard algorithm, so DuckDB's
 * `nfc_normalize` produces identical output — `text_unicode_clean` is
 * fully oracle-checked.
 *
 * Codegen: one static call per row (stays inside the whole-stage span —
 * no CodegenFallback projection break); the helper takes the
 * is-already-normalized fast path, which for ASCII corpora means zero
 * allocation per row.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.NfcNormalize.nfc($v);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  /** NFC-normalize; returns the input object untouched when already
    * normalized (the ASCII fast path — `isNormalized` scans without
    * allocating). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
