package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst can push filters and prune
  * columns into the scan — queries should `.select` early and let the
  * optimizer shrink `ReadSchema`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * parquet across testdata generations, so the loader is schema-driven:
    * NANOS (which Spark 4 refuses to read as a timestamp) is read as a
    * long via the legacy conf and converted with exact integer division to
    * microseconds (matching DuckDB's ns->us truncation); MICROS arrives as
    * TIMESTAMP_NTZ (isAdjustedToUTC=false) and is cast to the session-TZ
    * timestamp — a wall-clock identity under the UTC session. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // ---- typed views (case-class Encoders) for callers that want compile-
  // time safety; same scans underneath, Catalyst still prunes columns ----

  case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  def documentsDS(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._
    documents(s, d).as[Document]
  }
  def embeddingsDS(s: SparkSession, d: String): Dataset[Embedding] = {
    import s.implicits._
    embeddings(s, d).as[Embedding]
  }
  def customerDS(s: SparkSession, d: String): Dataset[Customer] = {
    import s.implicits._
    customer(s, d).select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment").as[Customer]
  }
}
