package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{CdcSim, Envelope}
import graft.streaming.StreamDedup

class StreamDedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("streaming redelivery guard drops exact duplicates within the watermark") {
    val tmp = Files.createTempDirectory("graft_sdedup").toString
    val ch = CdcSim.ordersChangelog(spark, sf)
    // simulate at-least-once: keys with id%3==0 delivered twice
    val redelivered = ch.unionByName(ch.filter(col("key") % 3 === 0))
    redelivered.select("value").write.mode("overwrite").text(s"$tmp/in")

    val sinkName = "sdedup_sink"
    val q = StreamDedup.dedupChanges(
      Envelope.parse(spark.readStream.text(s"$tmp/in"), CdcSim.payloadSchema),
      keyCols = Seq("id"), delay = "10 minutes")
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.table(sinkName)
    val batchDeduped = Envelope.parse(ch, CdcSim.payloadSchema)
    // every redelivery collapsed: same multiset as the clean batch changelog
    assert(out.count() === batchDeduped.count())
    assert(out.groupBy("id", "ts_ms", "op").count()
      .filter(col("count") > 1).count() === 0)
    assert(out.exceptAll(batchDeduped).count() === 0)
  }
}
