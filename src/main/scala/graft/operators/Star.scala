package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType}

import graft.functions.{smartDateKey, weekDayName}
import Cleaning.CleaningOps

/** Star-schema construction: the reference's dimension builds, date
  * dimension, surrogate-key fact resolution, and upsert semantics
  * (reference: dags/scripts/sql_queries.py, database_build/data_warehouse.sql).
  *
  * Scale notes:
  *  - Surrogate keys are assigned with `dense_rank` over the deduped natural
  *    key. Dimensions are orders of magnitude smaller than facts (players/
  *    games vs per-hour facts), so the single-reducer window on the DIM side
  *    is bounded; for dimensions that rival fact cardinality use [[hashSk]]
  *    (pure hash, fully distributed, no total order needed).
  *  - Fact resolution joins are hint-broadcast when the dim is known-small
  *    (date dim, enum dims); otherwise left to AQE, which will still pick a
  *    broadcast join when the built dim fits the threshold.
  *  - Upserts never collect: DO NOTHING is a left-anti join; DO UPDATE is a
  *    single keyed window (latest-wins), each one shuffle on the key.
  */
object Star {

  /** Build a dimension: dedup the natural key (deterministic keep-first) and
    * assign a dense surrogate key ordered by the natural key — the
    * distributed analog of the reference's `nextval` sequences
    * (reference: data_warehouse.sql:25,33,67,...).
    *
    * CONTRACT: the SK window is a bare global `dense_rank` — ONE task
    * holds the whole deduped dim. Fine for genuinely bounded dims (enum
    * tables, the 25-row nation dim); for anything that could grow with
    * the data use [[buildDimDistributed]] (bitwise the same SKs, spec-
    * pinned, no single-task window) or [[hashSk]]/[[hashSk128]] when no
    * dense sequence is needed at all. */
  def buildDim(
      df: DataFrame,
      naturalKey: Seq[String],
      skName: String,
      keepFirstBy: Seq[Column]
  ): DataFrame = {
    val deduped = df.dedupKeepFirst(naturalKey, keepFirstBy)
    val w = Window.orderBy(naturalKey.map(col): _*)
    deduped.withColumn(skName, dense_rank().over(w).cast(LongType))
  }

  /** [[buildDim]] without the single-task window: after the keep-first
    * dedup the natural key is UNIQUE, so `dense_rank` over it equals the
    * plain global rank — which [[graft.operators.Ranking.withGlobalRank]]
    * computes distributed (range repartition + partition offsets + an
    * in-partition running count; driver state is one partition-count
    * array). Same columns, same SK values bitwise (spec-pinned); the
    * result is backed by the machinery's eager checkpoint. This is the
    * default for any dimension that scales with the data. */
  def buildDimDistributed(
      df: DataFrame,
      naturalKey: Seq[String],
      skName: String,
      keepFirstBy: Seq[Column]
  ): DataFrame = {
    val deduped = df.dedupKeepFirst(naturalKey, keepFirstBy)
    val (ranked, _) =
      Ranking.withGlobalRank(deduped, naturalKey.map(col), skName)
    ranked
  }

  /** Fully-distributed alternative SK for huge dimensions: a 64-bit hash of
    * the natural key. No total order, no single-reducer window.
    *
    * Collision contract (birthday bound): P(any collision) ~ n^2 / 2^65 —
    * negligible below ~10^8 distinct keys (~0.03% at 10^8) but REAL at
    * 10^9 (~2.7%). For dimensions in that regime use [[hashSk128]]. */
  def hashSk(naturalKey: Seq[Column]): Column = xxhash64(naturalKey: _*)

  /** 128-bit SK for the regime where dim cardinality rivals the fact table
    * (the exact use case this API targets — where 64 bits hits the birthday
    * bound above): two INDEPENDENTLY-seeded xxhash64 halves as a 16-byte
    * struct key. The second half prepends a constant to the key columns,
    * which reseeds the whole xxhash chain, giving an independent family
    * member; P(any collision) ~ n^2 / 2^129 — ~10^-21 even at 10^9 rows.
    * Still a pure map-side codegen projection: no total order, no window,
    * and struct equality joins/groups like any other key. */
  def hashSk128(naturalKey: Seq[Column]): Column =
    struct(
      xxhash64(naturalKey: _*).as("h1"),
      xxhash64((lit(0x9E3779B97F4A7C15L) +: naturalKey): _*).as("h2"))

  /** Generate the Date_Dim from the observed date range of a column —
    * `sequence` + `explode`, computed distributed with no driver loop
    * (reference: data_warehouse.sql:65-74; loaded externally there).
    * date_sk is the smart key yyyymmdd (no sequence state). */
  def dateDim(df: DataFrame, dateCol: Column): DataFrame =
    df.agg(min(dateCol.cast(DateType)).as("lo"), max(dateCol.cast(DateType)).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("full_date"))
      .select(
        smartDateKey(col("full_date")).as("date_sk"),
        col("full_date"),
        dayofmonth(col("full_date")).cast(LongType).as("day"),
        month(col("full_date")).cast(LongType).as("month"),
        year(col("full_date")).cast(LongType).as("year"),
        weekDayName(col("full_date")).as("week_day")
      )

  /** Resolve one surrogate key on a fact: join staging rows to a dimension
    * on the natural key and keep the dim's SK — the Spark form of the
    * reference's `INSERT .. SELECT .. INNER JOIN dims`
    * (reference: sql_queries.py:20-31). `broadcastDim` for known-small dims. */
  def resolveSk(
      fact: DataFrame,
      dim: DataFrame,
      joinOn: Column,
      skCol: String,
      broadcastDim: Boolean
  ): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    fact.join(d, joinOn, "inner")
  }

  /** `ON CONFLICT DO NOTHING`: keep every existing row; add only incoming
    * rows whose key is unseen (first occurrence within incoming wins,
    * deterministically) (reference: sql_queries.py:30,131,159). */
  def upsertDoNothing(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      firstBy: Seq[Column]
  ): DataFrame = {
    val fresh = incoming
      .dedupKeepFirst(keys, firstBy)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
    existing.unionByName(fresh)
  }

  /** `ON CONFLICT DO UPDATE` (SCD-1): incoming beats existing per key, and
    * within incoming the latest wins (reference: sql_queries.py:95-101).
    * One union + one keyed window — a single shuffle. */
  def upsertDoUpdate(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      latestBy: Seq[Column]
  ): DataFrame = {
    val tagged = existing
      .withColumn("__pri", lit(0))
      .unionByName(incoming.withColumn("__pri", lit(1)))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col("__pri").desc +: latestBy.map(_.desc)): _*)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
  }

  /** CDC MERGE — apply a changelog of upserts AND deletes to a base
    * table, last-writer-wins: the lakehouse `MERGE INTO` semantic
    * (Delta/Iceberg) that [[upsertDoUpdate]] lacks a delete leg for.
    * `changes` shares the base schema plus `opCol` ('U' upsert / 'D'
    * delete); versions order by `versionCol`, with the changelog beating
    * the base on a version tie (the re-delivered-batch case — CDC
    * replays must be idempotent). A key whose LATEST op is a delete
    * vanishes; a delete older than the surviving upsert is a no-op.
    * Shape: one union + ONE keyed window (the upsert posture, one
    * shuffle) — delete handling costs nothing extra because the filter
    * runs on the already-ranked winner row. */
  def mergeChangelog(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCol: Column,
      opCol: String = "op"
  ): DataFrame = {
    val tagged = base
      .withColumn(opCol, lit("U")).withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(versionCol.desc, col("__src").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", "__src", opCol)
  }

  /** SCD Type-2 batch apply — the versioned-dimension counterpart of the
    * reference's overwrite upserts: one change batch folded into a
    * history-keeping dimension. `current` holds the SCD2 table (closed
    * versions have `validTo` set, exactly one open `validTo IS NULL` row
    * per key); `changes` holds at most one new attribute snapshot per key
    * stamped `tsCol`. Per key:
    *   - no change row, or the snapshot equals the open row's attrs
    *     (null-safe) -> the open row survives untouched;
    *   - a NEW key -> one new open row (`validFrom` = ts);
    *   - a changed snapshot -> the open row CLOSES (`validTo` = ts) and a
    *     new open row starts at ts.
    * Closed history passes through untouched.
    *
    * Shape: ONE key-co-partitionable full-outer join between the open
    * slice and the batch (both key+attrs streams, the batch typically
    * day-sized), each joined key emitting its 1-2 output rows from a
    * per-row struct array — no window, no second shuffle; history rides a
    * union. At 100 TB the open slice joins the day batch the same way
    * dedup_incremental's index does. */
  def scd2Apply(current: DataFrame, changes: DataFrame, key: String,
      attrs: Seq[String], tsCol: String,
      validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val vtType = current.schema(validTo).dataType
    val hist = current.filter(col(validTo).isNotNull)
    val open = current.filter(col(validTo).isNull)
    val ch = changes.select(
      col(key) +: (attrs.map(a => col(a).as(s"__n_$a")) :+ col(tsCol).as("__ts")): _*)
    val unchanged = attrs.map(a => col(a) <=> col(s"__n_$a")).reduce(_ && _)
    val openNull = lit(null).cast(vtType).as(validTo)
    val keepOpen = struct(
      attrs.map(col) :+ col(validFrom).as(validFrom) :+ openNull: _*)
    val closed = struct(
      attrs.map(col) :+ col(validFrom).as(validFrom) :+ col("__ts").as(validTo): _*)
    val newOpen = struct(
      attrs.map(a => col(s"__n_$a").as(a)) :+ col("__ts").as(validFrom) :+ openNull: _*)
    val rows =
      when(col("__ts").isNull || (col(validFrom).isNotNull && unchanged),
        array(keepOpen))
        .when(col(validFrom).isNull, array(newOpen))
        .otherwise(array(closed, newOpen))
    val applied = open.join(ch, Seq(key), "full_outer")
      .select(col(key), explode(rows).as("__r"))
      .select(col(key) +:
        (attrs :+ validFrom :+ validTo).map(f => col("__r").getField(f).as(f)): _*)
    hist.select((key +: attrs :+ validFrom :+ validTo).map(col): _*)
      .unionByName(applied)
  }
}
