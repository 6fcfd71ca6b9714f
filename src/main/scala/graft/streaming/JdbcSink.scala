package graft.streaming

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.cdc.Envelope

/** Generic JDBC micro-batch sink — the role the reference's ClickHouse JDBC
  * writer plays (spark-jobs/cdc_processor.py:105-117): `foreachBatch` →
  * append the flattened signed rows to a warehouse table.
  *
  * Replay safety: a `<table>_batches` ledger records committed batch ids, so
  * a replayed batch (checkpoint recovery, foreachBatch re-invocation) is a
  * no-op. The data append and the ledger insert are separate connections —
  * Spark's JDBC writer opens its own per-partition connections — so a crash
  * exactly between them replays the batch as duplicates: at-least-once, the
  * same guarantee the reference's append sink has, with the ledger closing
  * the common replay path. Sinks needing hard exactly-once should append
  * `batch_id` as a column and dedup downstream (or use the parquet
  * manifest sink in Sinks.scala).
  *
  * Scale: the append itself is Spark's distributed JDBC write (one
  * connection per partition, batched inserts); only the ledger probe is a
  * driver-side single-row query.
  */
object JdbcSink {

  /** foreachBatch body: skip if `batchId` is in the ledger, else append the
    * batch to `table` and record the id.
    */
  def idempotentJdbc(url: String, table: String,
      props: Properties = new Properties)(batch: DataFrame, batchId: Long): Unit = {
    val ledger = s"${table}_batches"
    val committed = withConn(url) { con =>
      // CREATE-if-missing, portably: probe the catalog first (SQLState for
      // "table exists" differs per backend — Derby X0Y32, Postgres 42P07,
      // MySQL 42S01), and race-guard the create for concurrent batches.
      val rs0 = con.getMetaData.getTables(null, null, "%", null)
      val exists = Iterator.continually(rs0)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME"))
        .exists(_.equalsIgnoreCase(ledger))
      rs0.close()
      if (!exists)
        try con.createStatement().executeUpdate(
          s"CREATE TABLE $ledger (batch_id BIGINT PRIMARY KEY)")
        catch { case _: java.sql.SQLException => () /* lost the create race */ }
      val rs = con.createStatement()
        .executeQuery(s"SELECT 1 FROM $ledger WHERE batch_id = $batchId")
      try rs.next() finally rs.close()
    }
    if (!committed) {
      batch.write.mode("append").jdbc(url, table, props)
      withConn(url)(_.createStatement()
        .executeUpdate(s"INSERT INTO $ledger VALUES ($batchId)"))
    }
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
