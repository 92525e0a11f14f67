package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization every exact-dedup /
  * exact-decontamination pass needs BEFORE hashing text: "café" arrives
  * from real crawls both precomposed (U+00E9) and decomposed
  * (e + U+0301 combining acute), visually identical, byte-distinct —
  * an exact hash treats them as different documents and a blocklist
  * term silently fails to match. NFC (canonical composition) is the
  * W3C-recommended web form.
  *
  * Why a kernel: Spark has no builtin Unicode normalizer; a Scala UDF
  * would pay per-row serialization. `java.text.Normalizer` is the
  * JDK's ICU-derived implementation of the STANDARDIZED algorithm
  * (UAX #15 — bit-identical across conforming implementations, which
  * is what makes the DuckDB `nfc_normalize` oracle exact), and the
  * fast-path check `Normalizer.isNormalized` skips the copy for the
  * overwhelmingly-already-NFC case, so the per-row cost on clean ASCII
  * is one scan. Stays inside whole-stage codegen like every graft
  * kernel (one static call per row).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
