package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (SURVEY.md §2 H9 / E23): canonical
  * composition via the JDK's `java.text.Normalizer` (pure JDK, no ICU
  * dependency) — the first stage of text canonicalization a corpus
  * pipeline runs so that byte-level dedup/hashing sees "é" and
  * "e + COMBINING ACUTE" as the same document. NFC is stable across
  * Unicode versions for assigned code points (the W3C/Unicode stability
  * policy), which is what makes the cross-engine oracle possible:
  * DuckDB's utf8proc `nfc_normalize` produces byte-identical output on
  * the same input.
  *
  * Scale shape: a NARROW per-row projection inside whole-stage codegen
  * (one static call, the BpeEncode convention) — no shuffle, no UDF
  * serialization.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-level entry point: `NfcNormalize($"text")`. */
  def apply(t: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(t)))

  /** Static per-row call (the XXH64/BpeEncode convention — generated
    * code calls this directly, whole-stage codegen intact). Fast path:
    * `Normalizer.isNormalized` is O(n) with no allocation for the
    * already-NFC common case, so clean ASCII corpora pay no copy.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
