package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.{CdcQueries, CdcSim}
import graft.streaming.{CdcPipeline, IncrementalScd2}

class IncrementalScd2Spec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("maintained SCD2 history converges to batch semantics across file drops") {
    val tmp = Files.createTempDirectory("graft_iscd2").toString
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
      val q = IncrementalScd2.start(spark, CdcPipeline.Files(in),
        CdcSim.payloadSchema, Seq("id"), s"$tmp/hist", s"$tmp/chk")
      q.awaitTermination()
    }

    // first drop: creates + updates; every key still has exactly one open
    // interval (no tombstones yet)
    drop("a", expr("get_json_object(value, '$.op')") =!= "d")
    run()
    val mid = IncrementalScd2.readHistory(spark, s"$tmp/hist").get
    val openPerKey = mid.filter(col("is_current") === 1)
      .groupBy(col("id")).count().filter(col("count") =!= 1).count()
    assert(openPerKey === 0, "each key must have exactly one open interval")

    // second drop: tombstones close the deleted keys' intervals; the full
    // history must now equal the batch scd2 of the whole log
    drop("b", expr("get_json_object(value, '$.op')") === "d")
    run()
    val fin = IncrementalScd2.readHistory(spark, s"$tmp/hist").get
      .select("id", "custkey", "price", "status", "valid_from", "valid_to", "is_current")
    val expected = CdcQueries.scd2History(spark, sf)
    assert(fin.exceptAll(expected).count() === 0, "incremental-only rows")
    assert(expected.exceptAll(fin).count() === 0, "missing rows")

    // deleted keys carry no open interval
    assert(fin.filter(col("id") % 10 === 0 && col("is_current") === 1)
      .count() === 0)

    // replaying with the same checkpoint is a no-op
    run()
    assert(IncrementalScd2.readHistory(spark, s"$tmp/hist").get.count()
      === expected.count())
  }

  test("history intervals are disjoint and chained per key") {
    val tmp = Files.createTempDirectory("graft_iscd2b").toString
    val ch = CdcSim.parsedChangelog(spark, sf).localCheckpoint()
    // split by event time parity of day to force multi-batch keys
    val mid = ch.agg(expr("(min(ts_ms) + max(ts_ms)) div 2")).head().getLong(0)
    IncrementalScd2.merge(s"$tmp/h", Seq("id"), CdcQueries.payloadCols)(
      ch.filter(col("ts_ms") <= mid), 0L)
    IncrementalScd2.merge(s"$tmp/h", Seq("id"), CdcQueries.payloadCols)(
      ch.filter(col("ts_ms") > mid), 1L)
    val hist = IncrementalScd2.readHistory(spark, s"$tmp/h").get
    // every closed interval's valid_to equals the key's next valid_from
    // (chained), and open intervals are unique per key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("valid_from"))
    val chained = hist
      .withColumn("nxt_from", lead(col("valid_from"), 1).over(w))
      .filter(col("nxt_from").isNotNull)
      .filter(col("valid_to") =!= col("nxt_from"))
    assert(chained.count() === 0, "closed intervals must chain to the successor")
    assert(hist.filter(col("is_current") === 1).groupBy(col("id")).count()
      .filter(col("count") > 1).count() === 0)
  }
}
