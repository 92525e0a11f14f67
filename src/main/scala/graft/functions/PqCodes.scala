package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization coding kernel: assign an `array<float>`
  * vector its nearest-centroid code in EVERY subspace in one per-row pass,
  * emitting `array<int>` of m code indices.
  *
  * Why a dedicated kernel instead of m [[NearestCells]] expressions: the
  * m inlined kernel bodies plus the downstream explode/aggregate land in
  * ONE whole-stage-codegen method whose bytecode exceeds the JIT's huge-
  * method limit (8 KB), so the hot method runs INTERPRETED — measured
  * ~425 us/row (~100x slow) at m=16/ksub=64 on 40k vectors. One compact
  * triple loop over a flattened codebook array stays far under the limit
  * and JITs. (Same playbook as MinHashBands: fold the per-row fan-out
  * into one expression.)
  *
  * Distance is the ranking-equivalent squared L2 `-2·v·c + |c|²` with
  * IEEE accumulation in element order and ties toward the lower code
  * index — bit-identical assignments to per-subspace [[NearestCells]]
  * (property-pinned). */
case class PqCodes(
    child: Expression,
    books: Array[Array[Array[Double]]]) extends UnaryExpression {
  private val m: Int = books.length
  require(m >= 1, "need at least one subspace codebook")
  private val ksub: Int = books(0).length
  require(books.forall(_.length == ksub), "equal-size codebooks per subspace")
  private val d: Int = books(0)(0).length
  require(books.forall(_.forall(_.length == d)), "equal-dim centroids")

  /** codebooks flattened to [j][cell][dim] order for a cache-friendly scan. */
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * d)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(books(j)(c), 0, a, (j * ksub + c) * d, d)
        c += 1
      }
      j += 1
    }
    a
  }
  /** |c|² per (subspace, cell), same left-fold order as NearestCells. */
  private lazy val flatSq: Array[Double] = {
    val a = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        a(j * ksub + c) = books(j)(c).map(x => x * x).sum
        c += 1
      }
      j += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<float>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    // UnsafeArrayData.getFloat is not bounds-checked: a short/ragged
    // vector would silently code garbage reads, so fail loudly instead
    // (mirrors the first-row dim require in pqCodesAndTables)
    if (vec.numElements() < m * d)
      throw new IllegalArgumentException(
        s"pq_codes: vector has ${vec.numElements()} elements, need ${m * d}")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < ksub) {
        var s = 0.0
        var i = 0
        val base = (j * ksub + c) * d
        val off = j * d
        while (i < d) {
          s += vec.getFloat(off + i).toDouble * flat(base + i)
          i += 1
        }
        val score = -2.0 * s + flatSq(j * ksub + c)
        if (best < 0 || score < bestScore) { best = c; bestScore = score }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val gad = classOf[GenericArrayData].getName
      val fl = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val sq = ctx.addReferenceObj("pqFlatSq", flatSq, "double[]")
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore"); val score = ctx.freshName("score")
      val base = ctx.freshName("base"); val off = ctx.freshName("off")
      s"""
         |if ($input.numElements() < ${m * d}) {
         |  throw new IllegalArgumentException(
         |    "pq_codes: vector has " + $input.numElements() +
         |    " elements, need ${m * d}");
         |}
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = -1;
         |  double $bestScore = 0.0;
         |  int $off = $j * $d;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $base = ($j * $ksub + $c) * $d;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $s += ((double) $input.getFloat($off + $i)) * $fl[$base + $i];
         |    }
         |    double $score = -2.0 * $s + $sq[$j * $ksub + $c];
         |    if ($best < 0 || $score < $bestScore) { $best = $c; $bestScore = $score; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}
