package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatCosine, FloatDotProduct}

/** Session extension point for the engine's native expressions — the
  * idiomatic way to ship custom Catalyst code: users add
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) and the kernels
  * become first-class SQL functions, usable from pure SQL alongside the
  * DataFrame API.
  *
  * Registered functions:
  *  - `float_dot(a, b)` — codegen'd array<float> dot product
  *    (see [[graft.functions.FloatDotProduct]]);
  *  - `float_cosine(a, b)` — single-pass codegen'd cosine similarity
  *    (see [[graft.functions.FloatCosine]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, build: (Expression, Expression) => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(getClass.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$name takes exactly 2 arguments")
      build(children.head, children(1))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("float_dot", FloatDotProduct(_, _)))
    ext.injectFunction(binary("float_cosine", FloatCosine(_, _)))
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}
