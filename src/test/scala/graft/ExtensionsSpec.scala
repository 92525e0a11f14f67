package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FloatDotProduct
import graft.plans.GraftExtensions

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-ext-test")
  import spark.implicits._

  test("GraftExtensions injects float_dot; the kernel runs from SQL") {
    // the extension class applies cleanly to a fresh extension registry
    new GraftExtensions().apply(new SparkSessionExtensions)
    // same builder registered in the live session for SQL use
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot",
      exprs => FloatDotProduct(exprs.head, exprs(1)),
      "built-in")
    val d = spark.sql(
      """SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(d == 11.0)
  }

  test("simhash64 and minhash_bands run from SQL via the extension builders") {
    new GraftExtensions().apply(new SparkSessionExtensions)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      exprs => graft.functions.SimHash64(exprs.head),
      "built-in")
    val viaSql = spark.sql("SELECT simhash64(array('a', 'b', 'a')) AS s")
      .head().getLong(0)
    val viaDf = Seq("a b a").toDF("text")
      .select(graft.functions.simhash64(graft.functions.wsTokens(col("text"))))
      .head().getLong(0)
    assert(viaSql == viaDf)
    // non-literal numPerm/bands must be rejected (they shape the kernel)
    intercept[IllegalArgumentException] {
      graft.plans.GraftExtensions.requireIntLiteral(
        org.apache.spark.sql.catalyst.expressions.Literal("x"))
    }
  }

  test("lz_complexity, repetition_stats and word_shingles run from SQL") {
    new GraftExtensions().apply(new SparkSessionExtensions)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lz_complexity",
      exprs => graft.functions.LzComplexity(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_stats",
      exprs => graft.functions.RepetitionStats(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => graft.functions.ShingleStrings(exprs.head,
        GraftExtensions.requireIntLiteral(exprs(1)),
        GraftExtensions.requireBoolLiteral(exprs(2))),
      "built-in")
    val lz = spark.sql("SELECT lz_complexity('aaaaaaaaaa').n_phrases AS p")
      .head().getLong(0)
    assert(lz == 4L) // a|aa|aaa|aaaa
    val rep = spark.sql(
      "SELECT repetition_stats(array('a','a','b')).dup_token_frac AS f")
      .head().getDouble(0)
    assert(rep == 1.0 / 3.0)
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2, false) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("a b", "b c"))
    intercept[IllegalArgumentException] {
      GraftExtensions.requireBoolLiteral(
        org.apache.spark.sql.catalyst.expressions.Literal(1))
    }
  }

  test("float_dot stays inside whole-stage codegen") {
    // arrays derived from range's id so ConstantFolding can't evaluate the
    // expression at optimize time — it must survive into codegen
    val df = spark.range(1)
      .select(
        array(($"id" + 1).cast("float"), lit(0.0f)).as("a"),
        array(lit(0.5f), lit(0.5f)).as("b"))
      .select(graft.functions.dotFast(col("a"), col("b")).as("d"))
    // "*(1) Project [float_dot(...)]" — the star marks a WholeStageCodegen
    // stage containing our expression (a non-codegen expression would fall
    // back to an unstarred Project)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [float_dot"), plan)
    assert(df.head().getDouble(0) == 0.5)
  }

  test("interpreted eval path (nullSafeEval) agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val mk = (xs: Array[Float]) =>
      Literal.create(ArrayData.toArrayData(xs), ArrayType(FloatType))
    val v = FloatDotProduct(mk(Array(1.5f, 2.0f)), mk(Array(2.0f, -1.0f))).eval(null)
    assert(v == 1.0)
  }
}
