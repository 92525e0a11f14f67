package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

import graft.operators.Cleaning.CleaningOps

/** JDBC-shaped warehouse load sink — the structural analog of the
  * reference's Postgres load operators (LoadDimsOperator / LoadFactsOperator
  * execute `INSERT .. ON CONFLICT DO NOTHING / DO UPDATE` per staged frame:
  * dags/custom_operators/LoadDimsOperator.py, dags/scripts/sql_queries.py).
  *
  * Shape, not a driver binding: no JDBC driver ships in this environment, so
  * the statement executor is a narrow injectable trait (`SqlExecutor`) — a
  * production deployment implements it over `java.sql.Connection` +
  * `PreparedStatement` verbatim; tests implement it over an in-memory table
  * that honors ON CONFLICT semantics. Everything that matters at scale is
  * real:
  *  - each micro-batch is pre-deduped to ONE row per key (latest wins), so
  *    concurrent partition writers never race on a key within a batch;
  *  - each partition opens its own executor and writes one transaction
  *    (rollback on failure), the standard per-partition JDBC contract —
  *    rows never funnel through the driver;
  *  - the DML is idempotent (`ON CONFLICT`), so Structured Streaming's
  *    at-least-once `foreachBatch` re-deliveries are harmless — exactly the
  *    reference's idempotent hourly re-run property.
  */
object WarehouseSink {

  /** The narrow slice of a JDBC connection the sink needs. One instance per
    * partition per micro-batch; implementations are created ON THE EXECUTOR
    * (the factory is shipped, never a live connection). */
  trait SqlExecutor {
    /** Execute one parameterized DML statement (a PreparedStatement
      * executeUpdate in the JDBC binding). */
    def execute(sql: String, params: Seq[Any]): Unit
    def commit(): Unit
    def rollback(): Unit
    def close(): Unit
  }

  /** The reference's upsert DML, parameterized
    * (reference: dags/scripts/sql_queries.py:30,95-101,131,159). */
  def upsertSql(table: String, cols: Seq[String], keys: Seq[String],
      doUpdate: Boolean): String = {
    require(keys.nonEmpty && keys.forall(cols.contains), "keys must be columns")
    val base = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.mkString(", ")})"
    if (doUpdate) {
      val sets = cols.filterNot(keys.contains)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"$base DO UPDATE SET $sets"
    } else s"$base DO NOTHING"
  }

  /** Write one micro-batch: dedup to the latest row per key, then upsert
    * partition-parallel, one transaction per partition. */
  def writeBatch(batch: DataFrame, table: String, keys: Seq[String],
      latestBy: Seq[String], doUpdate: Boolean,
      newExecutor: () => SqlExecutor): Unit = {
    val cols = batch.columns.toSeq
    val sql = upsertSql(table, cols, keys, doUpdate)
    val deduped = batch.dedupKeepFirst(keys, latestBy.map(c => col(c).desc))
    deduped.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val ex = newExecutor()
        try {
          rows.foreach(r => ex.execute(sql, cols.map(c => r.getAs[Any](c))))
          ex.commit()
        } catch {
          case t: Throwable => ex.rollback(); throw t
        } finally ex.close()
      }
    }
  }

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(WarehouseSink.sink(...))`. */
  def sink(table: String, keys: Seq[String], latestBy: Seq[String],
      doUpdate: Boolean, newExecutor: () => SqlExecutor): (DataFrame, Long) => Unit =
    (batch, _) => writeBatch(batch, table, keys, latestBy, doUpdate, newExecutor)
}
