package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4, "graft-bucketing-test")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join strategy question
    s
  }

  test("joining two tables bucketed on the key needs no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", buckets = 4, bucketCols = Seq("o_orderkey"), sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_b", buckets = 4, bucketCols = Seq("l_orderkey"), sortCols = Seq("l_orderkey"))

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))

    // the join itself is co-located: no exchange below the join
    val joinOnly = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.hasShuffle(joinOnly), joinOnly.queryExecution.executedPlan.toString)

    // and it still computes the right thing
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() > 0 && joinOnly.count() == expected)
  }
}
