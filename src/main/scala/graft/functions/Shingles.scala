package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingling over a token array, inside a codegen'd
  * expression.
  *
  * Why a kernel: `wordShingles` is a `transform(sequence(...), slice +
  * concat_ws)` higher-order function — HOFs run INTERPRETED (no codegen),
  * every element allocates a sliced sub-array, and the downstream
  * `array_distinct` is another interpreted pass. That chain is the single
  * largest cost in every n-gram operator (contamination scoring at sf0.1
  * spent ~90% of its wall time building shingles). The kernel emits the
  * shingles in one loop — O(tokens * n) with no intermediate arrays — and
  * dedupes inline when `distinct` is set.
  *
  * Exactness (property-pinned bit-identical in PropertiesSpec):
  * `ShingleStrings(toks, n, distinct = false)` == `wordShingles(text, n)`
  * and `distinct = true` == `array_distinct(wordShingles(text, n))` —
  * `concatWs` is the engine's own concat, and the inline dedup keeps
  * FIRST-occurrence order exactly like `array_distinct`. Fewer than n
  * tokens -> empty array. */
case class ShingleStrings(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"need n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override protected def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.ShingleStrings.compute($input, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {

  private val sep = UTF8String.fromString(" ")

  /** Called from generated code — one virtual call per row. */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val nSh = toks.numElements() - (n - 1)
    if (nSh < 1) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    if (distinct) {
      // LinkedHashSet == array_distinct semantics: first occurrence wins
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < nSh) {
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](nSh)
      var i = 0
      while (i < nSh) {
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Distinct xxhash64 word-shingle hashes of a token array — the one-pass
  * codegen'd replacement for
  * `array_distinct(transform(wordShingles(text, n), s => xxhash64(s)))`
  * (the hashed-shingle-set substrate of the Jaccard verify joins).
  *
  * Each shingle string is materialized once (the hash must cover the
  * exact bytes `concat_ws(" ", ...)` produces) and hashed with the
  * engine's own xxhash64 (seed 42, `XxHash64Function.hashUnsafeBytes`),
  * so the output longs are bit-identical to the expression chain; dedup
  * keeps first-occurrence order exactly like `array_distinct`
  * (property-pinned in PropertiesSpec). Fewer than n tokens -> empty. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"need n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($input, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val sep = UTF8String.fromString(" ")
  private val seed = 42L // the xxhash64() function's fixed seed

  /** Called from generated code — one virtual call per row. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val nSh = toks.numElements() - (n - 1)
    if (nSh < 1) return new GenericArrayData(Array.emptyLongArray)
    val parts = new Array[UTF8String](n)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nSh)
    var o = 0
    var i = 0
    while (i < nSh) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(sep, parts: _*)
      val h = XxHash64Function.hash(s, StringType, seed)
      if (seen.add(h)) { out(o) = h; o += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }
}
