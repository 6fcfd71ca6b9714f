package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.{CdcQueries, CdcSim}
import graft.streaming.{CdcPipeline, IncrementalSnapshot}

class IncrementalSnapshotSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("snapshot converges to batch semantics across incremental file drops") {
    val tmp = Files.createTempDirectory("graft_inc").toString
    val in = s"$tmp/in"; Files.createDirectories(Paths.get(in))
    val ch = CdcSim.ordersChangelog(spark, sf)

    def drop(name: String, filter: org.apache.spark.sql.Column): Unit = {
      ch.filter(filter).select("value").coalesce(1)
        .write.mode("overwrite").text(s"$tmp/stage_$name")
      val src = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".txt")).head
      Files.copy(src.toPath, Paths.get(in, s"$name.txt"))
    }
    def run(): Unit = {
      val q = IncrementalSnapshot.start(spark, CdcPipeline.Files(in),
        CdcSim.payloadSchema, Seq("id"), s"$tmp/snap", s"$tmp/chk")
      q.awaitTermination()
    }

    // first drop: creates + updates only; snapshot must contain every key
    drop("a", expr("get_json_object(value, '$.op')") =!= "d")
    run()
    val mid = IncrementalSnapshot.readSnapshot(spark, s"$tmp/snap").get
    assert(mid.filter(col("id") % 10 === 0).count() > 0) // deletes not applied yet

    // second drop: the tombstones; snapshot must now equal the batch result
    drop("b", expr("get_json_object(value, '$.op')") === "d")
    run()
    val fin = IncrementalSnapshot.readSnapshot(spark, s"$tmp/snap").get
    val expected = CdcQueries.snapshotLatest(spark, sf)
    assert(fin.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(fin).count() === 0)

    // replaying with the same checkpoint is a no-op
    run()
    val again = IncrementalSnapshot.readSnapshot(spark, s"$tmp/snap").get
    assert(again.count() === expected.count())
  }
}
