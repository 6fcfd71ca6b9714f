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

  test("daily-report job (the Airflow DAG role): full run, month backfill, idempotent") {
    val out = Files.createTempDirectory("graft_daily_report").toString
    // full run — every month materialized
    val line1 = graft.tools.DailyReportJob.run(spark, sf, out, None)
    assert(line1.contains("month=ALL"))
    val full = Mart.readDailyRevenue(spark, out).cache()
    val nFull = full.count()
    val months = full.select("month").distinct().collect().map(_.getString(0)).sorted
    assert(months.length > 1, "need >1 month to prove partition-scoped backfill")
    // month-scoped backfill (the @daily ds re-run): replaces ONE partition,
    // leaves the rest byte-identical, total content unchanged
    val target = months.head
    val untouched = full.filter(col("month") =!= target).drop("month")
      .collect().toSet
    full.unpersist()
    val line2 = graft.tools.DailyReportJob.run(spark, sf, out, Some(target))
    assert(line2.contains(s"month=$target"))
    val after = Mart.readDailyRevenue(spark, out).cache()
    assert(after.count() === nFull, "backfill changed the mart's cardinality")
    assert(after.filter(col("month") =!= target).drop("month")
      .collect().toSet === untouched, "backfill touched other partitions")
    // and the backfilled month still matches the source aggregation
    val src = Analytics.dailyRevenue(spark, sf)
      .filter(substring(col("order_day"), 1, 7) === target)
    assert(after.filter(col("month") === target).drop("month")
      .exceptAll(src).count() === 0)
    after.unpersist()
  }
}
