package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{CdcSim, Envelope}
import graft.streaming.CdcPipeline

class CdcPipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("multi-table pipeline runs concurrently and is replay-idempotent") {
    val tmp = Files.createTempDirectory("graft_pipe").toString
    val ch = CdcSim.ordersChangelog(spark, sf)
    // Two "topics": even and odd keys of the simulated changelog.
    ch.filter(org.apache.spark.sql.functions.col("key") % 2 === 0)
      .select("value").write.mode("overwrite").text(s"$tmp/in0")
    ch.filter(org.apache.spark.sql.functions.col("key") % 2 === 1)
      .select("value").write.mode("overwrite").text(s"$tmp/in1")

    def launch() = CdcPipeline.runAll(spark, Seq(
      (CdcPipeline.Files(s"$tmp/in0"), CdcSim.payloadSchema, s"$tmp/sink0", s"$tmp/chk0"),
      (CdcPipeline.Files(s"$tmp/in1"), CdcSim.payloadSchema, s"$tmp/sink1", s"$tmp/chk1")))

    launch().foreach(_.awaitTermination())
    def sinkCount(i: Int): Long =
      spark.read.parquet(s"$tmp/sink$i/batch=*").count()
    val (c0, c1) = (sinkCount(0), sinkCount(1))
    assert(c0 + c1 === ch.count())

    // Relaunch against the same checkpoints: no new input → no new rows.
    launch().foreach(_.awaitTermination())
    assert(sinkCount(0) === c0 && sinkCount(1) === c1)

    // Sink content = the envelope-parsed changelog (signed rows).
    val parsed = Envelope.parse(ch, CdcSim.payloadSchema)
    val sunk = spark.read.parquet(s"$tmp/sink0/batch=*")
      .unionByName(spark.read.parquet(s"$tmp/sink1/batch=*"))
    assert(sunk.exceptAll(parsed).count() === 0)
    assert(parsed.exceptAll(sunk).count() === 0)
  }
}
