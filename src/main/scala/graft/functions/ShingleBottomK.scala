package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass bottom-k md5 fingerprint over a token array: build each
  * n-token shingle, md5 it, and keep the k lexicographically-smallest hex
  * digests — inside ONE codegen'd expression.
  *
  * Why a kernel: the `array_distinct(wordShingles)` -> `transform(md5)` ->
  * `sort_array` -> `slice` chain runs INTERPRETED (HOFs have no codegen)
  * and materializes + fully sorts every shingle hash per row to keep 8.
  * The kernel hashes each shingle once and maintains a bounded TreeSet —
  * O(shingles * log k), no intermediate arrays.
  *
  * Exactness: md5 hex (lowercase) is what `md5(col)` computes, and
  * lexicographic order of hex equals Spark's StringType sort order, so
  * the output matches the expression chain element-for-element (dedup on
  * the DIGEST equals the oracle's `DISTINCT md5(...)`; distinct shingles
  * collide only on an md5 collision). Property-pinned bit-identical in
  * PropertiesSpec. Fewer than n tokens -> empty array (no fingerprint),
  * exactly like `wordShingles`. */
case class ShingleBottomK(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1, s"need n >= 1, got $n")
  require(k >= 1, s"need k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_bottom_k requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_bottom_k"

  override protected def nullSafeEval(input: Any): Any =
    ShingleBottomK.compute(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.ShingleBottomK.compute($input, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleBottomK =
    copy(child = newChild)
}

object ShingleBottomK {

  private val sep = UTF8String.fromString(" ")

  /** Called from generated code — one virtual call per row. */
  def compute(toks: ArrayData, n: Int, k: Int): ArrayData = {
    val nTok = toks.numElements()
    val nSh = nTok - (n - 1)
    if (nSh < 1) return new GenericArrayData(Array.empty[Any])
    val bottom = new java.util.TreeSet[String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < nSh) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val shingle = UTF8String.concatWs(sep, parts: _*)
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(shingle.getBytes)
      // TreeSet dedupes identical digests; drop anything past the k-th
      if (bottom.size < k) bottom.add(hex)
      else if (hex.compareTo(bottom.last()) < 0) {
        if (bottom.add(hex)) bottom.pollLast()
      }
      i += 1
    }
    val out = new Array[Any](bottom.size)
    val it = bottom.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}
