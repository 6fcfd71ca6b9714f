package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.streaming.Compaction

/** Compaction contract: fragmented partitions collapse to one file with
  * row-identical content; healthy partitions (single-file, or at/over
  * target size) are untouched byte for byte; a second run is a no-op.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def fileNames(dir: String): Map[String, Set[String]] =
    Compaction.stats(spark, dir, "month").map { p =>
      val d = new java.io.File(s"$dir/month=${p.value}")
      p.value -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => s"${f.getName}@${f.lastModified}").toSet
    }.toMap

  test("fragmented partitions compact to one file, content intact, rerun no-op") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/mart"
    // a deliberately fragmented mart: up to 6 files per month partition
    val daily = Analytics.dailyRevenue(spark, sf)
      .withColumn("month", substring(col("order_day"), 1, 7))
    daily.repartition(6).write.partitionBy("month").parquet(dir)
    val before = Compaction.stats(spark, dir, "month")
    assert(before.exists(_.files > 1), "test premise: fragmentation exists")
    val content = spark.read.parquet(dir).collect()
      .map(_.toString).sorted

    // targetBytes = 0: nothing is eligible, nothing moves
    assert(Compaction.compact(spark, dir, "month", 0L) === Seq.empty)
    val untouched = fileNames(dir)

    // generous target: every fragmented partition compacts to ONE file
    val rewritten = Compaction.compact(spark, dir, "month", 1L << 30)
    assert(rewritten.toSet === before.filter(_.files > 1).map(_.value).toSet)
    val after = Compaction.stats(spark, dir, "month")
    assert(after.forall(_.files === 1), s"still fragmented: $after")
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted
      === content, "compaction changed the data")
    // single-file partitions from the first write were not rewritten
    before.filter(_.files === 1).foreach { p =>
      assert(fileNames(dir)(p.value) === untouched(p.value),
        s"healthy partition ${p.value} was rewritten")
    }

    // idempotent: a second run finds nothing to do and moves nothing
    val names = fileNames(dir)
    assert(Compaction.compact(spark, dir, "month", 1L << 30) === Seq.empty)
    assert(fileNames(dir) === names)
  }
}
