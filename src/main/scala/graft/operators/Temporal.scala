package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from primitives the
  * optimizer understands (preference (a) of the custom-operator ladder).
  *
  * As-of join: for each right row, the LATEST left row with
  * left_ts <= right_ts in the same key group — the point-in-time lookup
  * behind feature stores ("state of X when Y happened"). Composed as ONE
  * union + ONE keyed window with a carry-forward `last(ignoreNulls)`:
  * a single shuffle on the key, linear state, no range-join explosion
  * (the naive `l.ts <= r.ts` join is O(|L| x |R|) per key and what Spark
  * would plan for the range predicate).
  */
object Temporal {

  /** `right` rows enriched with `asof_<leftTs>` and `asof_<c>` for each
    * left payload column (null when no left row precedes). Ties on equal
    * timestamps resolve left-before-right (<= semantics) and within the
    * left side by the payload struct order. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, leftPayload: Seq[String]): DataFrame = {
    val lvFields = leftTs +: leftPayload
    val l = left.select(
      col(key), col(leftTs).as("__ts"), lit(0).as("__side"),
      struct(lvFields.map(col): _*).as("__lv"))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__lv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u
      .withColumn("__asof", last(col("__lv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val asofCols = lvFields.map(f => col("__asof").getField(f).as(s"asof_$f"))
    carried.select(right.columns.map(col) ++ asofCols: _*)
  }

  /** Bucketized range (interval) join: each `points` row whose timestamp
    * falls inside a `intervals` row's `[startTs, endTs)` — with NO
    * non-equi join in the plan.
    *
    * Why an operator: Spark plans a bare range predicate as a broadcast
    * nested-loop (or cartesian) join — O(|P| x |I|) compares, the classic
    * non-starter at scale. This composes the standard bucketization: both
    * sides map to fixed-width time bins (an interval explodes to every bin
    * it covers; a point has exactly ONE bin), the join becomes an
    * equi-join on (bin [+ keys]) that hash-partitions like any other, and
    * the exact range filter runs post-join on candidates only. A
    * (point, interval) pair can meet only in the point's single bin, so no
    * dedup pass is needed. Replication is bounded by interval_length /
    * binWidth + 1 rows per interval — pick `binWidthUs` near the typical
    * interval length.
    *
    * Equivalence to the naive range join is property-tested
    * (PropertiesSpec); the registered query is DuckDB-oracle-checked. */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      ptTs: String, startTs: String, endTs: String,
      binWidthUs: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidthUs > 0, "binWidthUs must be positive")
    // __bin is the operator's internal equi-join key: a pre-existing column
    // of that name would be silently overwritten and corrupt the join
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not contain the reserved column __bin")
    val p = points.withColumn("__bin",
      floor(unix_micros(col(ptTs)) / binWidthUs).cast("long"))
    val iv = intervals
      .filter(col(endTs) > col(startTs)) // empty intervals match nothing
      .withColumn("__bin", explode(sequence(
        floor(unix_micros(col(startTs)) / binWidthUs).cast("long"),
        floor((unix_micros(col(endTs)) - 1) / binWidthUs).cast("long"))))
    p.join(iv, Seq("__bin") ++ keys)
      .filter(col(ptTs) >= col(startTs) && col(ptTs) < col(endTs))
      .drop("__bin")
  }
}
