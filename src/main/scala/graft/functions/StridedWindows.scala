package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Strided token windows (chunking / passage segmentation) in one
  * codegen'd pass — the kernel form of the two interpreted
  * `transform(sequence(1, LAST, stride), s => concat_ws(" ", slice(words,
  * s, w)))` chains used by chunkTokens and dropBoilerplatePassages, which
  * differ only in LAST:
  *
  *  - `cover = true` (passages): LAST = `greatest(len, 1)` — start points
  *    tile the WHOLE document, the tail windows are partial, every doc
  *    emits >= 1 window;
  *  - `cover = false` (chunks): LAST = `greatest(len - w + 1, 1)` — the
  *    classic sliding window; a doc shorter than `w` emits exactly one
  *    partial chunk.
  *
  * Windows keep their order (position = index * stride + 1, 1-based), no
  * dedup — callers posexplode. Bit-identical to the HOF chains
  * (property-pinned in PropertiesSpec); also end-to-end gated by the
  * boilerplate_passages / doc_chunks / pack_sequences oracles. */
case class StridedWindows(child: Expression, w: Int, stride: Int,
    cover: Boolean) extends UnaryExpression {
  require(w >= 1, s"need w >= 1, got $w")
  require(stride >= 1, s"need stride >= 1, got $stride")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strided_windows requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "strided_windows"

  override protected def nullSafeEval(input: Any): Any =
    StridedWindows.compute(input.asInstanceOf[ArrayData], w, stride, cover)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.StridedWindows.compute($input, $w, $stride, $cover);")

  override protected def withNewChildInternal(newChild: Expression): StridedWindows =
    copy(child = newChild)
}

object StridedWindows {

  private val sep = UTF8String.fromString(" ")

  /** Called from generated code — one virtual call per row. */
  def compute(toks: ArrayData, w: Int, stride: Int, cover: Boolean): ArrayData = {
    val nTok = toks.numElements()
    val last = math.max(if (cover) nTok else nTok - w + 1, 1) // 1-based
    val nWin = (last - 1) / stride + 1
    val out = new Array[Any](nWin)
    var k = 0
    while (k < nWin) {
      val start = k * stride // 0-based
      val end = math.min(start + w, nTok) // exclusive; tail may be partial
      val parts = new Array[UTF8String](math.max(end - start, 0))
      var j = start
      while (j < end) { parts(j - start) = toks.getUTF8String(j); j += 1 }
      out(k) = UTF8String.concatWs(sep, parts: _*)
      k += 1
    }
    new GenericArrayData(out)
  }
}
