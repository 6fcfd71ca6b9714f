package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StatsIndex

/** Data-skipping contract: on a range-clustered layout a narrow range
  * query reads a small fraction of the files and returns exactly what the
  * full-scan filter returns; on a random layout the index honestly prunes
  * nothing (and still returns the right answer).
  */
class StatsIndexSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def writeLayout(clustered: Boolean): String = {
    val dir = Files.createTempDirectory("graft_stats").toString + "/ev"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("tsm"))
    val framed = if (clustered) ev.repartitionByRange(16, col("tsm"))
      else ev.repartition(16) // hash layout: every file spans the ts range
    framed.write.parquet(dir)
    dir
  }

  test("clustered layout: narrow range reads few files, result equals full scan") {
    val dir = writeLayout(clustered = true)
    val stats = StatsIndex.build(spark, dir, Seq("tsm")).localCheckpoint()
    assert(stats.count() === 16)
    val Array(lo, hi) = Tables.events(spark, sf)
      .agg(expr("percentile(unix_millis(ts), array(0.40, 0.45))")).collect()(0)
      .getSeq[Double](0).map(_.toLong).toArray
    val (df, read, total) = StatsIndex.prunedRead(spark, dir, stats, "tsm", lo, hi)
    val expected = spark.read.parquet(dir)
      .filter(col("tsm") >= lo && col("tsm") <= hi)
    info(s"clustered: read $read of $total files")
    assert(read.toLong < total / 2, s"a 5% range should skip most of a clustered layout")
    assert(df.count() === expected.count() && df.count() > 0)
    assert(df.exceptAll(expected).count() === 0)

    // a range past the data's max: zero files, empty result
    val max = Tables.events(spark, sf).agg(expr("max(unix_millis(ts))")).collect()(0).getLong(0)
    val (none, readNone, _) = StatsIndex.prunedRead(spark, dir, stats, "tsm", max + 1, max + 2)
    assert(readNone === 0 && none.count() === 0)
  }

  test("random layout: index prunes nothing but stays correct") {
    val dir = writeLayout(clustered = false)
    val stats = StatsIndex.build(spark, dir, Seq("tsm")).localCheckpoint()
    val Array(lo, hi) = Tables.events(spark, sf)
      .agg(expr("percentile(unix_millis(ts), array(0.40, 0.45))")).collect()(0)
      .getSeq[Double](0).map(_.toLong).toArray
    val (df, read, total) = StatsIndex.prunedRead(spark, dir, stats, "tsm", lo, hi)
    info(s"random: read $read of $total files")
    assert(read.toLong === total, "hash layout spans the range in every file")
    val expected = spark.read.parquet(dir)
      .filter(col("tsm") >= lo && col("tsm") <= hi)
    assert(df.count() === expected.count())
  }
}
