package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerGroup

class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-topk-test")
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("heap top-k equals the window row_number formulation") {
    val src = Tables.part(spark, sf).select("p_brand", "p_partkey", "p_retailprice")
    val custom = TopKPerGroup(src, Seq("p_brand"),
        Seq(("p_retailprice", true), ("p_partkey", false)), k = 3)
      .orderBy($"p_brand", $"p_retailprice".desc, $"p_partkey")
      .collect().toSeq
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    val windowed = src.withColumn("__rn", row_number().over(w))
      .filter($"__rn" <= 3).drop("__rn")
      .orderBy($"p_brand", $"p_retailprice".desc, $"p_partkey")
      .collect().toSeq
    assert(custom == windowed)
  }

  test("k <= 0 is rejected up front, not an NPE at execution") {
    val src = Tables.part(spark, sf).select("p_brand", "p_partkey")
    for (k <- Seq(0, -1)) {
      val e = intercept[IllegalArgumentException] {
        TopKPerGroup(src, Seq("p_brand"), Seq(("p_partkey", false)), k = k)
      }
      assert(e.getMessage.contains("k >= 1"), e.getMessage)
    }
  }

  test("plans as partial -> exchange -> final") {
    val src = Tables.part(spark, sf).select("p_brand", "p_partkey")
    val df = TopKPerGroup(src, Seq("p_brand"), Seq(("p_partkey", false)), k = 2)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert("TopKPerGroup 2".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange hashpartitioning(p_brand"), plan)
  }

  test("groups smaller than k pass through whole; ties break by the order") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 10.0),
      ("b", 9, 1.0)
    ).toDF("g", "id", "v")
    val out = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), k = 2)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq == Seq(("a", 1), ("a", 2), ("b", 9)))
  }
}
