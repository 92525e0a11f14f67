package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash+LSH banding kernel: given a document's (distinct)
  * shingle array, computes the full `numPerm`-slot minhash signature AND
  * collapses it into `bands` band hashes — all inside ONE codegen'd
  * expression, so signatures are a pure per-row projection with ZERO
  * shuffle (the previous formulation exploded shingle rows and ran
  * numPerm min-aggregates: one full shuffle of every shingle).
  *
  * Emitting band hashes (not the raw signature) from a single expression
  * also sidesteps the CollapseProject trap: a signature column referenced
  * by `bands` downstream expressions would be inlined and re-evaluated
  * bands times (measured 75x slowdown on the first minhash attempt).
  *
  * Hashing: each shingle's bytes are xxh64-hashed ONCE, then the
  * `numPerm` "permutations" are universal multiply-add hashes of that one
  * 64-bit value (odd multiplier + bias per slot, both derived from
  * xxh64(p)) — the standard MinHash optimization that replaces numPerm
  * full byte-hashes per shingle with one byte-hash plus numPerm
  * multiply-adds; band hash = xxh64 fold over the band's slice.
  */
case class MinHashBands(child: Expression, numPerm: Int, bands: Int)
    extends UnaryExpression {
  require(numPerm % bands == 0, "bands must divide numPerm")

  private val rowsPerBand = numPerm / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val sig = new Array[Long](numPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var p = 0
      while (p < numPerm) {
        val h = MinHashBands.mulA(p) * h0 + MinHashBands.addB(p)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(sig(b * rowsPerBand + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val sig = ctx.freshName("sig")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val b = ctx.freshName("b"); val r = ctx.freshName("r")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      // per-perm multiply/add constants hoisted into mutable state
      val obj = MinHashBands.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val muls = ctx.addMutableState("long[]", "minhashMulA",
        v => s"""$v = new long[$numPerm];
                 |for (int q = 0; q < $numPerm; q++) { $v[q] = $obj.mulA(q); }
               """.stripMargin)
      val adds = ctx.addMutableState("long[]", "minhashAddB",
        v => s"""$v = new long[$numPerm];
                 |for (int q = 0; q < $numPerm; q++) { $v[q] = $obj.addB(q); }
               """.stripMargin)
      val h0 = ctx.freshName("h0")
      s"""
         |long[] $sig = new long[$numPerm];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $input.numElements(); $i++) {
         |  $utf8 $s = $input.getUTF8String($i);
         |  long $h0 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $p = 0; $p < $numPerm; $p++) {
         |    long $h = $muls[$p] * $h0 + $adds[$p];
         |    if ($h < $sig[$p]) $sig[$p] = $h;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 42L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $acc = $xxh.hashLong($sig[$b * $rowsPerBand + $r], $acc);
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  /** Odd multiplier for permutation slot p (odd => bijective mod 2^64). */
  def mulA(p: Int): Long = XXH64.hashLong(p.toLong, 7L) | 1L
  /** Additive bias for permutation slot p. */
  def addB(p: Int): Long = XXH64.hashLong(p.toLong, 13L)
}
