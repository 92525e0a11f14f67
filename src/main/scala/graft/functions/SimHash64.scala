package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash kernel over a token array: hash every token once
  * (xxh64, seed 42 — the same hash `xxhash64(col)` computes), accumulate
  * the standard +1/-1 per-bit counts weighted by natural token multiplicity,
  * and emit the sign-bit signature — all inside ONE codegen'd expression.
  *
  * Why a kernel: the previous formulation `explode(tokens)` + 64 conditional
  * `sum` aggregates shuffled EVERY TOKEN ROW in the corpus — at 100 TB that
  * Exchange is the whole job. As a per-row projection the signature never
  * shuffles at all; only the (id, 8-byte simhash) pairs downstream do.
  * Arithmetic is identical to the aggregate formulation (per-bit counts are
  * order-independent), so signatures are bit-for-bit unchanged.
  *
  * (Capability: SimHash near-dup, SURVEY.md §2 #27; reference-scale analog
  * of the near-dup detection the pipeline needs for training-data curation.)
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $input.numElements(); $i++) {
         |  $utf8 $s = $input.getUTF8String($i);
         |  long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
