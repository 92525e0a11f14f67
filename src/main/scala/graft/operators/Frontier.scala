package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction — "best trade-off" queries such
  * as largest-size-for-lowest-price, highest-quality-for-fewest-tokens:
  * a row survives iff no other row is at least as good on BOTH
  * dimensions and strictly better on one.
  */
object Frontier {

  /** 2-D skyline: rows MAXIMIZING `maxCol` while MINIMIZING `minCol`.
    * Dominance: b dominates a iff b.max >= a.max, b.min <= a.min, and at
    * least one is strict. Returns ALL non-dominated rows — duplicates of
    * a frontier point all survive (no strict dominance among equals).
    * Rows with a null in either dimension are excluded (dominance is
    * undefined on null).
    *
    * SCALE: the textbook formulation is a quadratic NOT EXISTS self-join
    * (the oracle uses exactly that). This one exploits that dominance
    * depends only on the (maxCol, minCol) VALUE pair:
    *   1. one map-side-combined groupBy to per-`maxCol` minima — the only
    *      data-sized work, and its Exchange is bounded by the number of
    *      DISTINCT `maxCol` values;
    *   2. a running strict-min Window over that value table, ordered
    *      maxCol DESC (single pass; the table is value-sized, so the
    *      unpartitioned window is deliberate, not a corpus-wide sort);
    *   3. the per-value verdict broadcasts back onto the corpus scan —
    *      a row is on the frontier iff it attains its value's minimum
    *      AND beats the strict minimum over all LARGER values.
    * For a low-cardinality discrete dimension (sizes, ratings, bucketed
    * scores) the shuffled data is value-sized; for a continuous `maxCol`,
    * bucketize it first or step 1 degenerates to corpus size. */
  def skyline2D(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val defined = df.filter(col(maxCol).isNotNull && col(minCol).isNotNull)
    val stats = defined.groupBy(col(maxCol)).agg(min(col(minCol)).as("__minp"))
    val w = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdict = stats.withColumn("__strict", min(col("__minp")).over(w))
    defined
      .join(broadcast(verdict), Seq(maxCol))
      .filter(col(minCol) === col("__minp") &&
        (col("__strict").isNull || col(minCol) < col("__strict")))
      .drop("__minp", "__strict")
  }
}
