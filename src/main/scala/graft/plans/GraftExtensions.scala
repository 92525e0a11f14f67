package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FloatDotProduct

/** Session extension point for the engine's native expressions — the
  * idiomatic way to ship custom Catalyst code: users add
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) and the kernels
  * become first-class SQL functions, usable from pure SQL alongside the
  * DataFrame API.
  *
  * Registered functions:
  *  - `float_dot(a, b)` — codegen'd array<float> dot product
  *    (see [[graft.functions.FloatDotProduct]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "float_dot takes exactly 2 arguments")
        FloatDotProduct(children.head, children(1))
      }))
  }
}
