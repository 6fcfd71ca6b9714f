package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Batch mart jobs — the role of `daily_report.py` + the Airflow DAG
  * (dags/trigger_spark_job.py): scheduled batch aggregation written to a
  * partitioned columnar mart.
  *
  * Partitioning by month keeps file counts sane while giving the partition
  * pruning every dashboard query wants; `overwrite` + dynamic partition
  * mode makes re-runs idempotent per partition (re-running a day's job
  * rewrites only that day's partitions — the batch twin of the streaming
  * idempotent sink).
  */
object Mart {

  def writeDailyRevenue(s: SparkSession, sfDir: String, outDir: String,
      monthFilter: Option[String] = None): Unit =
    Analytics.dailyRevenue(s, sfDir)
      .withColumn("month", substring(col("order_day"), 1, 7))
      // month-scoped runs (the Airflow ds-backfill shape) compute and
      // replace exactly one partition; dynamic overwrite leaves the rest
      .transform(df => monthFilter.fold(df)(m => df.filter(col("month") === m)))
      .write
      .partitionBy("month")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(outDir)

  def readDailyRevenue(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
