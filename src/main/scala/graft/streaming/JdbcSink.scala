package graft.streaming

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.cdc.Envelope

/** Generic JDBC micro-batch sink — the role the reference's ClickHouse JDBC
  * writer plays (spark-jobs/cdc_processor.py:105-117): `foreachBatch` →
  * append the flattened signed rows to a warehouse table.
  *
  * Replay safety: a `<table>_batches` ledger records committed batch ids, so
  * a replayed batch (checkpoint recovery, foreachBatch re-invocation) is a
  * no-op. Every data row additionally carries its `batch_id`, and an
  * UNcommitted replay first deletes any rows with that batch_id before
  * appending — so a crash exactly between the distributed append and the
  * ledger insert (the window the ledger alone cannot close) is repaired on
  * replay instead of double-counted. Net: effectively-once for any backend
  * that supports DELETE; the batch_id column also lets downstream dedup
  * defensively.
  *
  * Scale: the append itself is Spark's distributed JDBC write (one
  * connection per partition, batched inserts); the ledger probe is a
  * driver-side single-row query, and ledger EXISTENCE is cached per
  * (url, table) for the query lifetime — no per-batch catalog scan.
  */
object JdbcSink {

  /** Ledgers already verified to exist, keyed url#ledger — the existence
    * probe (and CREATE race) runs once per query lifetime, not per batch.
    */
  private val ledgerReady =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def ensureLedger(url: String, ledger: String): Unit =
    if (!ledgerReady.contains(s"$url#$ledger")) {
      withConn(url) { con =>
        // SELECT-probe instead of a full getTables catalog scan; the
        // backend's table-missing SQLException means "create it" (SQLState
        // for exists/missing differs per backend — Derby X0Y32/42X05,
        // Postgres 42P07/42P01 — so probe by behavior, not state codes),
        // and the create itself is race-guarded for concurrent queries.
        // The DDL is dialect-routed: ClickHouse ledgers need an engine
        // clause, ANSI ones a PRIMARY KEY (SinkDialect).
        val exists =
          try { con.createStatement().executeQuery(s"SELECT 1 FROM $ledger WHERE 1=0").close(); true }
          catch { case _: java.sql.SQLException => false }
        if (!exists)
          try con.createStatement().executeUpdate(
            SinkDialect.forUrl(url).ledgerDdl(ledger))
          catch { case _: java.sql.SQLException => () /* lost the create race */ }
      }
      ledgerReady.add(s"$url#$ledger")
    }

  /** foreachBatch body: skip if `batchId` is in the ledger, else repair any
    * half-appended rows from a crashed attempt, append the batch (stamped
    * with its batch_id) and record the id.
    */
  def idempotentJdbc(url: String, table: String,
      props: Properties = new Properties,
      keyCols: Seq[String] = Seq("id"))(batch: DataFrame, batchId: Long): Unit = {
    val ledger = s"${table}_batches"
    val dialect = SinkDialect.forUrl(url)
    ensureLedger(url, ledger)
    val committed = withConn(url) { con =>
      val rs = con.createStatement()
        .executeQuery(s"SELECT 1 FROM $ledger WHERE batch_id = $batchId")
      try rs.next() finally rs.close()
    }
    if (!committed) {
      // crash-window repair: a previous attempt may have appended rows and
      // died before its ledger insert. The probe-by-behavior guard only
      // skips the DELETE when the data table doesn't exist yet (first
      // batch); on an existing table a DELETE failure PROPAGATES and fails
      // the batch — silently skipping would reopen the duplicate-replay
      // window this repair exists to close.
      withConn(url) { con =>
        val tableExists =
          try { con.createStatement().executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
          catch { case _: java.sql.SQLException => false }
        if (tableExists)
          con.createStatement().executeUpdate(
            s"DELETE FROM $table WHERE ${quoteId(con, "batch_id")} = $batchId")
      }
      // engine-appropriate table creation when the writer provisions the
      // table: ClickHouse gets the reference's ReplacingMergeTree clause
      // (init-clickhouse.sql:18-19); ANSI engines need no options
      val engineOpts = dialect.createTableOptions(keyCols)
      val writer = batch.withColumn("batch_id", lit(batchId)).write.mode("append")
      (if (engineOpts.nonEmpty) writer.option("createTableOptions", engineOpts)
       else writer).jdbc(url, table, props)
      // best-effort index so the repair DELETE is a key lookup, not a table
      // scan growing with sink size (exists / race / unsupported → ignore)
      ensureBatchIndex(url, table)
      withConn(url)(_.createStatement()
        .executeUpdate(s"INSERT INTO $ledger VALUES ($batchId)"))
    }
  }

  /** The backend's own identifier quote (MySQL backticks, ANSI double
    * quotes elsewhere) — Spark's JDBC writer creates columns with
    * dialect-quoted, case-preserved names, so raw SQL must quote the same
    * way or the name case-folds and misses the column.
    */
  private def quoteId(con: java.sql.Connection, name: String): String =
    con.getMetaData.getIdentifierQuoteString match {
      case null => s""""$name""""
      case s if s.trim.isEmpty => name
      case s => s"${s.trim}$name${s.trim}"
    }

  private val indexReady =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def ensureBatchIndex(url: String, table: String): Unit =
    if (!indexReady.contains(s"$url#$table")) {
      withConn(url) { con =>
        try con.createStatement().executeUpdate(
          s"CREATE INDEX ${table}_batch_idx ON $table (${quoteId(con, "batch_id")})")
        catch { case _: java.sql.SQLException => () /* exists / race / unsupported */ }
      }
      indexReady.add(s"$url#$table")
    }

  private def withConn[A](url: String)(f: java.sql.Connection => A): A = {
    val con = DriverManager.getConnection(url)
    try f(con) finally con.close()
  }

  /** One table's CDC pipeline terminating in a JDBC warehouse — the
    * reference's process_stream shape (cdc_processor.py:100-124) with the
    * sink swapped from ClickHouse to any JDBC url.
    */
  def run(spark: org.apache.spark.sql.SparkSession, src: CdcPipeline.Source,
      payloadSchema: StructType, url: String, table: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Envelope.parse(CdcPipeline.read(spark, src), payloadSchema)
      .writeStream
      .foreachBatch(idempotentJdbc(url, table) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
