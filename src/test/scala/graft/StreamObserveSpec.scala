package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{CdcSim, Envelope}
import graft.streaming.StreamMetrics

/** StreamMetrics: the observe() counters summed over all micro-batches must
  * equal the batch-computed truth — including malformed lines (null op) and
  * tombstones — and arrive without any extra aggregation in the sink path.
  */
class StreamObserveSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("per-batch observed metrics sum to the batch truth over a dirty feed") {
    val tmp = Files.createTempDirectory("graft_observe").toString
    // the malformedStats mix: real changelog + deterministic garbage
    val garbage = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 17 === 0)
      .select(concat(lit("{broken json "), col("o_orderkey")).as("value"))
    val feed = CdcSim.ordersChangelog(spark, sf).select("value").unionByName(garbage)
    feed.repartition(8).write.mode("overwrite").text(s"$tmp/in")

    val parsed = Envelope.parse(
      spark.readStream.option("maxFilesPerTrigger", "3").text(s"$tmp/in"),
      CdcSim.payloadSchema)
    val sink = "observe_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = StreamMetrics.withEnvelopeMetrics(parsed)
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val obs = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get(StreamMetrics.MetricName)))
    assert(obs.size > 1, s"expected several micro-batches, got ${obs.size}")
    val (rows, bad, tomb) = (
      obs.map(_.getAs[Long]("n_events")).sum,
      obs.map(_.getAs[Long]("n_malformed")).sum,
      obs.map(_.getAs[Long]("n_tombstones")).sum)
    val maxTs = obs.flatMap(r => Option(r.getAs[java.lang.Long]("max_ts_ms")))
      .map(_.toLong).max

    val truth = Envelope.parse(feed, CdcSim.payloadSchema).agg(
      count(lit(1)), sum(when(col("op").isNull, 1L).otherwise(0L)),
      sum(when(col("op") === "d", 1L).otherwise(0L)), max(col("ts_ms"))).head()
    assert(rows === truth.getLong(0))
    assert(bad === truth.getLong(1) && bad > 0)
    assert(tomb === truth.getLong(2) && tomb > 0)
    assert(maxTs === truth.getLong(3))
    // and the sink saw every row exactly once (observe added no pass/filter)
    assert(spark.table(sink).count() === rows)
  }
}
