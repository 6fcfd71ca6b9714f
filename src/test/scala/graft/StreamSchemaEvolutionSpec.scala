package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.CdcSim
import graft.streaming.CdcStream

/** Schema evolution through the STREAMING path: the same v1/v2 mixed feed
  * the batch `cdc_schema_evolution` query reads must flow through the
  * stateful upsert stream unchanged — v1 envelopes (no `status` key) parse
  * to null-backfilled rows mid-stream, and the final streamed snapshot
  * equals the batch snapshot key for key.
  */
class StreamSchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("streamed upsert over a mid-stream DDL feed equals the batch snapshot") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_evo_stream").toString
    CdcSim.evolvedChangelog(spark, sf).select("value")
      .write.mode("overwrite").text(s"$tmp/in")

    val sink = "evo_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = CdcStream.parseStream(
        spark.readStream.option("maxFilesPerTrigger", "2").text(s"$tmp/in"))
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Update,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(CdcStream.upsert _)
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table(sink)
      .groupBy(col("id"))
      .agg(max_by(col("custkey"), col("ts_ms")).as("custkey"),
        max_by(col("price"), col("ts_ms")).as("price"),
        max_by(col("status"), col("ts_ms")).as("status"),
        max_by(col("deleted"), col("ts_ms")).as("deleted"),
        max(col("ts_ms")).as("ts_ms"))
      .filter(!col("deleted"))
      .select("id", "custkey", "price", "status", "ts_ms")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        Option(r.getString(3)), r.getLong(4)))).toMap
    val batch = graft.cdc.CdcQueries.schemaEvolution(spark, sf)
      .select("id", "custkey", "price", "status", "ts_ms")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        Option(r.getString(3)), r.getLong(4)))).toMap
    assert(streamed.size === batch.size)
    assert(streamed === batch)
    // and the null backfill really flowed through the stream
    assert(streamed.values.count(_._3.isEmpty) > 0,
      "expected v1-generation keys with null-backfilled status")
  }
}
