package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native IVF cell-assignment kernel: score an `array<float>` vector against
  * every centroid of a (tiny, driver-built) centroid matrix in ONE pass and
  * emit the `n` nearest cell names, distance-ascending.
  *
  * Distance is the ranking-equivalent squared L2: `-2·v·c + |c|²` (`|v|²` is
  * constant per row). Products and accumulation are IEEE doubles in element
  * order, and `|c|²` is the same left-fold the previous formulation used, so
  * assignments are bit-for-bit identical to the interpreted
  * `aggregate(zip_with(...))` version this kernel replaces — that version
  * evaluated one interpreted higher-order expression PER CENTROID per row
  * (nCells× the work, outside codegen): the scale-killer at 100 TB corpus
  * sizes. Ties break toward the lower cell index; `cells` is passed sorted,
  * so that matches the old (distance, name) struct sort.
  */
case class NearestCells(
    child: Expression,
    centroids: Array[Array[Double]],
    cells: Array[String],
    n: Int) extends UnaryExpression {
  require(centroids.length == cells.length, "one centroid per cell")
  require(n >= 1 && n <= cells.length, s"need 1 <= n <= ${cells.length}, got $n")

  /** |c|² per cell, same left-fold order as the driver-side sum the previous
    * formulation embedded as a literal. */
  private lazy val cellSq: Array[Double] = centroids.map(c => c.map(x => x * x).sum)
  private lazy val utf8Cells: Array[UTF8String] = cells.map(UTF8String.fromString)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<float>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def scoreAll(vec: ArrayData): Array[Double] = {
    val scores = new Array[Double](centroids.length)
    var ci = 0
    while (ci < centroids.length) {
      val c = centroids(ci)
      val m = math.min(vec.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < m) {
        s += vec.getFloat(i).toDouble * c(i)
        i += 1
      }
      scores(ci) = -2.0 * s + cellSq(ci)
      ci += 1
    }
    scores
  }

  override protected def nullSafeEval(input: Any): Any = {
    val scores = scoreAll(input.asInstanceOf[ArrayData])
    val used = new Array[Boolean](scores.length)
    val out = new Array[AnyRef](n)
    var r = 0
    while (r < n) {
      var best = -1
      var ci = 0
      while (ci < scores.length) {
        if (!used(ci) && (best < 0 || scores(ci) < scores(best))) best = ci
        ci += 1
      }
      used(best) = true
      out(r) = utf8Cells(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val cents = ctx.addReferenceObj("nearestCents", centroids, "double[][]")
      val sq = ctx.addReferenceObj("nearestCellSq", cellSq, "double[]")
      val names = ctx.addReferenceObj("nearestCellNames", utf8Cells, s"$utf8[]")
      val scores = ctx.freshName("scores"); val used = ctx.freshName("used")
      val out = ctx.freshName("out"); val cc = ctx.freshName("cc")
      val ci = ctx.freshName("ci"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val r = ctx.freshName("r"); val best = ctx.freshName("best")
      val nc = centroids.length
      s"""
         |double[] $scores = new double[$nc];
         |for (int $ci = 0; $ci < $nc; $ci++) {
         |  double[] $cc = $cents[$ci];
         |  int $m = java.lang.Math.min($input.numElements(), $cc.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += ((double) $input.getFloat($i)) * $cc[$i];
         |  }
         |  $scores[$ci] = -2.0 * $s + $sq[$ci];
         |}
         |boolean[] $used = new boolean[$nc];
         |$utf8[] $out = new $utf8[$n];
         |for (int $r = 0; $r < $n; $r++) {
         |  int $best = -1;
         |  for (int $ci = 0; $ci < $nc; $ci++) {
         |    if (!$used[$ci] && ($best < 0 || $scores[$ci] < $scores[$best])) $best = $ci;
         |  }
         |  $used[$best] = true;
         |  $out[$r] = $names[$best];
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
