package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Mart
import graft.operators.Analytics

class MartSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("daily revenue mart writes month partitions and round-trips") {
    val out = Files.createTempDirectory("graft_mart").toString
    Mart.writeDailyRevenue(spark, sf, out)
    // month=YYYY-MM partition dirs on disk → partition pruning is real
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("month=\\d{4}-\\d{2}")))
    // content round-trips (modulo the derived partition column)
    val back = Mart.readDailyRevenue(spark, out).drop("month")
    val src = Analytics.dailyRevenue(spark, sf)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
    // idempotent re-run: same content, no duplication
    Mart.writeDailyRevenue(spark, sf, out)
    assert(Mart.readDailyRevenue(spark, out).count() === src.count())
    // partition pruning reaches the scan
    val pruned = Mart.readDailyRevenue(spark, out).filter(col("month") === dirs.head.drop(6))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"), plan)
  }
}
