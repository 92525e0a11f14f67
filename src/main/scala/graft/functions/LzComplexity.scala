package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** LZ78 complexity of a document — the compressibility quality signal
  * (Gopher-style "compression ratio" heuristic: boilerplate and
  * template spam compress far better than natural prose) computed as
  * the classical Lempel–Ziv 1978 phrase count over the UTF-8 bytes.
  *
  * Why LZ78 and not Deflater: `java.util.zip` delegates to whatever
  * zlib build the JDK bundles, so compressed SIZES can differ across
  * JDK builds — a quality gate that flips between cluster images is a
  * correctness bug. The LZ78 parse is a 20-line SPECIFIED algorithm:
  * walk the bytes, extend the current phrase while (prefix, byte) is in
  * the dictionary, otherwise emit the phrase and add it. One hash probe
  * per byte, O(n), bit-deterministic on every JVM.
  *
  * Why a kernel: the parse is inherently sequential per document (each
  * step depends on the dictionary built so far) — no Column composition
  * expresses it, and a Scala UDF would pay serialization per row. As a
  * native Expression the call compiles into whole-stage codegen like the
  * other graft kernels (one virtual call per row, tight loop inside).
  *
  * Output: struct(n_bytes, n_phrases, lz_ratio = phrases/bytes — ~0 for
  * highly repetitive text (phrases grow as sqrt(n) on pure repetition),
  * approaching ~1 for incompressible noise; null on empty input).
  */
case class LzComplexity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lz_complexity requires string, got ${other.sql}")
  }

  override def dataType: DataType = LzComplexity.schema
  override def prettyName: String = "lz_complexity"

  override protected def nullSafeEval(input: Any): Any =
    LzComplexity.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.LzComplexity.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): LzComplexity =
    copy(child = newChild)
}

object LzComplexity {

  val schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_phrases", LongType, nullable = false),
    StructField("lz_ratio", DoubleType, nullable = true)))

  /** Called from generated code — one virtual call per row. Dictionary
    * keys pack (phrase id << 8 | next byte): phrase ids stay below the
    * byte count, so the key is injective for any document under 2^55
    * bytes. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val dict = new java.util.HashMap[java.lang.Long, Integer](math.max(16, n))
    var phrases = 0L
    var cur = 0L // 0 = root; phrase ids start at 1
    var nextId = 1
    var i = 0
    while (i < n) {
      val key = java.lang.Long.valueOf((cur << 8) | (bytes(i) & 0xffL))
      val hit = dict.get(key)
      if (hit != null) {
        cur = hit.longValue()
      } else {
        phrases += 1L
        dict.put(key, Integer.valueOf(nextId))
        nextId += 1
        cur = 0L
      }
      i += 1
    }
    if (cur != 0L) phrases += 1L // unterminated final phrase
    new GenericInternalRow(Array[Any](
      n.toLong, phrases,
      if (n == 0) null else phrases.toDouble / n.toDouble))
  }
}
