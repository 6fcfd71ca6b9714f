package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{CdcOps, CdcQueries, CdcSim, Envelope}
import graft.streaming.CdcPipeline

/** The reference's heterogeneous multi-table fan-out
  * (cdc_processor.py:16-47,139-142): three topics with three different
  * payload schemas and key spaces run concurrently through the one pipeline
  * code path, and each sink materializes the same snapshot the batch path
  * computes.
  */
class MultiTableCdcSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("three distinct payload schemas stream concurrently to correct snapshots") {
    val tmp = Files.createTempDirectory("graft_multi").toString
    val topics = Seq(
      ("orders", CdcSim.ordersChangelog(spark, sf), CdcSim.payloadSchema, Seq("custkey", "price", "status")),
      ("customer", CdcSim.customerChangelog(spark, sf), CdcSim.customerSchema, Seq("name", "nationkey", "bal")),
      ("part", CdcSim.partChangelog(spark, sf), CdcSim.partSchema, Seq("ptype", "price")))
    topics.foreach { case (name, ch, _, _) =>
      ch.select("value").write.mode("overwrite").text(s"$tmp/in_$name")
    }
    CdcPipeline.runAll(spark, topics.map { case (name, _, schema, _) =>
      (CdcPipeline.Files(s"$tmp/in_$name"): CdcPipeline.Source,
        schema, s"$tmp/sink_$name", s"$tmp/chk_$name")
    }).foreach(_.awaitTermination())

    topics.foreach { case (name, ch, schema, payloadCols) =>
      val sunk = spark.read.parquet(s"$tmp/sink_$name/batch=*")
      val streamed = CdcOps.snapshotLatest(sunk, Seq("id"), "ts_ms", payloadCols)
      val batch = CdcOps.snapshotLatest(Envelope.parse(ch, schema), Seq("id"), "ts_ms", payloadCols)
      assert(streamed.exceptAll(batch).count() === 0, s"$name: extra rows in streamed snapshot")
      assert(batch.exceptAll(streamed).count() === 0, s"$name: missing rows in streamed snapshot")
    }
  }

  test("multi-table snapshot summary has one sane row per table") {
    val rows = CdcQueries.multiTableSnapshot(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("orders", "customer", "part"))
    // customer: id%7 deleted → 6/7 of keys survive
    val nCustomer = Tables.customer(spark, sf).count()
    assert(rows("customer").getLong(1) ===
      nCustomer - Tables.customer(spark, sf).filter(col("c_custkey") % 7 === 0).count())
    assert(rows.values.forall(_.getDouble(2) > 0))
  }
}
