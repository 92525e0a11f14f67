package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `pandas.json_normalize(record_path=..., meta=...)` re-expressed as
  * declarative Spark: `from_json` with an explicit schema, `explode` down
  * the record path, and struct flattening — all codegen'd, no driver-side
  * JSON handling (reference: dags/scripts/rust_twitter_steam_dims.py:21-23,
  * rust_twitter_steam_facts.py:21-25 where every transform starts with
  * json_normalize over the raw S3 payload).
  *
  * At 100 TB the explicit schema matters: schema inference would scan the
  * data twice, and a typed `from_json` lets Catalyst prune unused leaves.
  */
object JsonNormalize {

  /** Parse `jsonCol` with `schema`, walk `recordPath` (exploding every array
    * along the way), keep `meta` columns from the enclosing row, and flatten
    * the record struct's top-level fields into columns. */
  def normalize(
      df: DataFrame,
      jsonCol: String,
      schema: DataType,
      recordPath: Seq[String] = Nil,
      meta: Seq[String] = Nil
  ): DataFrame = {
    val parsed = df.withColumn("__rec", from_json(col(jsonCol), schema))
    val walked = recordPath.foldLeft(parsed) { (d, field) =>
      val stepped = d.withColumn("__rec", col("__rec").getField(field))
      stepped.schema("__rec").dataType match {
        case _: ArrayType => stepped.withColumn("__rec", explode(col("__rec")))
        case _            => stepped
      }
    }
    val recCols: Seq[Column] = walked.schema("__rec").dataType match {
      case s: StructType =>
        s.fieldNames.toSeq.map(f => col("__rec").getField(f).as(f))
      case _ => Seq(col("__rec").as("value"))
    }
    walked.select(meta.map(col) ++ recCols: _*)
  }
}
