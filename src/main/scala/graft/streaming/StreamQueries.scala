package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.operators.Analytics

/** Batch/stream unification queries: the same aggregation logic as the
  * batch mart, executed as a Structured Streaming query over a file stream
  * of the same table — checked against the same DuckDB oracle.
  */
object StreamQueries {

  /** `events_hourly` via readStream → Complete-mode agg → memory sink.
    * Identical grouping to Analytics.eventsHourly, so the driver's batch
    * oracle applies verbatim.
    */
  def eventsHourlyStream(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    // File-stream sources want a directory; expose the single parquet file
    // through a symlinked temp dir.
    val inDir = Files.createTempDirectory("graft_hourly_in")
    Files.createSymbolicLink(inDir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))
    val raw = s.readStream.schema(schema).parquet(inDir.toString)
    val ev =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(CAST(floor(ts / 1000) AS LONG))"))
      else raw
    val sinkName = "graft_hourly_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val tmp = Files.createTempDirectory("graft_hourly").toString
    val q = Analytics.hourlyAgg(ev)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sinkName)
  }

  /** `events_quantile_sketch` with the SKETCH BUILD running as a streaming
    * aggregation: the (event_type, bucket) counter table is the only
    * stateful part — a Complete-mode count-agg holding ≤ ~512 rows per type
    * no matter how long the stream runs (counter merge is addition, so each
    * micro-batch partial-aggregates and folds into state like any running
    * count). Quantile extraction + the exact audit run on the materialized
    * sketch — the same split a live dashboard makes. The batch oracle
    * applies verbatim: the stream must land the exact same bucket table.
    */
  def eventsQuantileStream(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Sketches
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    val inDir = Files.createTempDirectory("graft_qsk_in")
    Files.createSymbolicLink(inDir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))
    val raw = s.readStream.schema(schema).parquet(inDir.toString)
    val sinkName = "graft_qsk_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val tmp = Files.createTempDirectory("graft_qsk").toString
    val q = Sketches.quantileBuckets(Sketches.quantileCents(raw))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Sketches.quantileExtract(s.table(sinkName),
      Sketches.quantileCents(graft.Tables.events(s, d)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hourly_stream" -> eventsHourlyStream,
    "events_quantile_stream" -> eventsQuantileStream,
  )

  val oracles: Map[String, String] = Map(
    "events_hourly_stream" -> Analytics.oracles("events_hourly"),
    "events_quantile_stream" -> graft.operators.Sketches.oracles("events_quantile_sketch"),
  )
}
