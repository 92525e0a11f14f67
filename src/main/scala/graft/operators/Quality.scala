package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gates the reference applies before every stage/load:
  * duplicate-row and missing-value checks that abort the pipeline on
  * violation (reference: dags/scripts/rust_twitter_steam_facts.py:53-56,
  * 153-157 — `raise Exception("Data Contains Duplicate Rows")`).
  *
  * Implemented as ONE aggregation pass over the frame (a single job, no
  * per-check scans) that yields a small report; `assertClean` collects just
  * that report (a handful of rows) and throws like the reference.
  */
object Quality {

  /** One row per check: (check_name, violations). */
  def report(df: DataFrame, naturalKey: Seq[String], notNull: Seq[String]): DataFrame = {
    val dupCheck =
      (count(lit(1)) - countDistinct(naturalKey.head, naturalKey.tail: _*))
        .cast("long")
        .as("dup_natural_key")
    val nullChecks = notNull.map { c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"null_$c")
    }
    val agg = df.agg(dupCheck, nullChecks: _*)
    val pairs = agg.columns.flatMap(c => Seq(lit(c), col(c)))
    agg
      .select(explode(map(pairs: _*)).as(Seq("check_name", "violations")))
      .orderBy("check_name")
  }

  /** Referential-integrity orphan check: child rows whose foreign key has
    * no parent. The reference's fact loads resolve FKs with INNER JOINs
    * (sql_queries.py:20-31), which silently DROP orphans — this gate makes
    * them visible before the load. A left-anti join: one shuffle on the
    * key (or a broadcast when the parent key set is dim-sized). */
  def orphans(child: DataFrame, fk: org.apache.spark.sql.Column,
      parent: DataFrame, pk: org.apache.spark.sql.Column): DataFrame =
    child.join(parent.select(pk), fk === pk, "left_anti")

  /** One (check_name, violations) row per named orphan check. */
  def referentialReport(
      checks: Seq[(String, DataFrame, org.apache.spark.sql.Column, DataFrame, org.apache.spark.sql.Column)]
  ): DataFrame = {
    require(checks.nonEmpty, "referentialReport needs at least one check")
    checks.map { case (name, child, fk, parent, pk) =>
      orphans(child, fk, parent, pk)
        .agg(count(lit(1)).cast("long").as("violations"))
        .withColumn("check_name", lit(name))
        .select("check_name", "violations")
    }.reduce(_ unionByName _).orderBy("check_name")
  }

  /** Throws if any check reports violations (the reference's hard gate). */
  def assertClean(df: DataFrame, naturalKey: Seq[String], notNull: Seq[String]): Unit = {
    val bad = report(df, naturalKey, notNull)
      .filter(col("violations") > 0)
      .collect()
    if (bad.nonEmpty) {
      val msg = bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
      throw new IllegalStateException(s"Data quality violations: $msg")
    }
  }
}
