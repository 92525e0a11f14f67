package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH bucket kernel: one pass over an
  * `array<float>` vector computes the signed projection onto every plane of
  * a (seeded, broadcast-literal) plane matrix and packs the sign bits into a
  * long bucket id.
  *
  * Replaces the previous `aggregate(zip_with(...))`-per-plane formulation —
  * higher-order functions are INTERPRETED in Spark, so that version ran
  * nPlanes interpreted expressions per row. Accumulation here is IEEE double
  * in element order, exactly the fold order the HOF version used, so bucket
  * ids are bit-for-bit unchanged.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64, "need 1..64 planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires array<float>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val m = math.min(vec.numElements(), pl.length)
      var s = 0.0
      var i = 0
      while (i < m) {
        s += vec.getFloat(i).toDouble * pl(i)
        i += 1
      }
      if (s >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val pls = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val bits = ctx.freshName("bits"); val p = ctx.freshName("p")
      val pl = ctx.freshName("pl"); val m = ctx.freshName("m")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |long $bits = 0L;
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $pl = $pls[$p];
         |  int $m = java.lang.Math.min($input.numElements(), $pl.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += ((double) $input.getFloat($i)) * $pl[$i];
         |  }
         |  if ($s >= 0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
