package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's year/month/day partitioned staging layout (reference:
  * dags/scripts/rust_twitter_steam_dims.py:56-66 — CSVs under
  * `stage/.../{year}/{month}/{day}/`), re-expressed as a Hive-partitioned
  * parquet write.
  *
  * Scale notes: `partitionBy(y, m, d)` gives partition PRUNING on read —
  * an incremental hourly load touches one leaf directory out of the whole
  * lake, which is what makes the reference's idempotent hourly cadence
  * workable at 100 TB. Parquet (columnar + stats) replaces the
  * reference's CSV so downstream scans also get predicate pushdown and
  * column pruning.
  */
object Staging {

  /** Derive the y/m/d partition columns from a timestamp column. */
  def withDateParts(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("y", year(col(tsCol)).cast(LongType))
      .withColumn("m", month(col(tsCol)).cast(LongType))
      .withColumn("d", dayofmonth(col(tsCol)).cast(LongType))

  /** Stage a frame under `path/y=…/m=…/d=…` (overwrite = idempotent
    * re-run, like the reference's keyed S3 object paths). */
  def writeStaged(df: DataFrame, tsCol: String, path: String,
      format: String = "parquet"): Unit =
    withDateParts(df, tsCol)
      .write.mode("overwrite").format(format)
      .partitionBy("y", "m", "d")
      .save(path)

  /** Read a staged table back (partition columns y/m/d come back as
    * directory-derived columns; filters on them prune directories).
    * `mergeSchema = true` reconciles slices written with EVOLVED schemas
    * (a column added mid-stream): the read exposes the union schema and
    * pre-evolution rows surface the new columns as null — the standard
    * additive-evolution contract of a parquet lake. Off by default: the
    * merged-schema inference lists every file's footer, which is the
    * expensive path at lake scale (prefer it only on evolved tables). */
  def readStaged(spark: SparkSession, path: String,
      format: String = "parquet", mergeSchema: Boolean = false): DataFrame = {
    val r = spark.read.format(format)
    (if (mergeSchema) r.option("mergeSchema", "true") else r).load(path)
  }

  /** Interval-bounded incremental staging run (reference:
    * dags/scripts/helpers.py:10-47 — every hourly run extracts only
    * `[data_interval_start, data_interval_end)` and stages under that run's
    * y/m/d key). The slice filter sits directly on the timestamp column so
    * it pushes into the source scan, and the write uses DYNAMIC partition
    * overwrite: a re-run of the same interval replaces only the slice's own
    * y/m/d partitions — idempotent like the reference's keyed S3 puts —
    * without ever truncating the rest of the lake (plain `overwrite` would). */
  def writeSlice(df: DataFrame, tsCol: String, start: String, end: String,
      path: String, format: String = "parquet"): Unit =
    withDateParts(
        df.filter(col(tsCol) >= to_timestamp(lit(start)) &&
          col(tsCol) < to_timestamp(lit(end))),
        tsCol)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .format(format)
      .partitionBy("y", "m", "d")
      .save(path)

  /** Keyed snapshot diff — the CDC step between two corpus/table
    * snapshots: classify every key as added / removed / changed /
    * unchanged by comparing an md5 fingerprint over `cols` (multi-column
    * content folded with a \u0001 separator, so column boundaries can't
    * alias). This is what turns "yesterday's lake + today's dump" into
    * the small delta the rest of an incremental pipeline (re-embed,
    * re-dedup, re-shard) actually processes.
    *
    * Scale shape: each side is projected to (key, fingerprint) BEFORE the
    * join — the full-outer join shuffles two key+32-byte-hash streams,
    * never document bodies, and it is the only Exchange. At 100 TB both
    * sides co-partition on the key (bucketed snapshots make it
    * shuffle-free); the output is classification rows, typically consumed
    * filtered to the non-`unchanged` minority. */
  def snapshotDiff(base: DataFrame, cur: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one content column")
    def fp(df: DataFrame, as: String): DataFrame = df.select(col(keyCol),
      md5(concat_ws("\u0001", cols.map(col): _*)).as(as))
    fp(base, "__fp_b").join(fp(cur, "__fp_c"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__fp_b").isNull, lit("added"))
          .when(col("__fp_c").isNull, lit("removed"))
          .when(col("__fp_b") =!= col("__fp_c"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
