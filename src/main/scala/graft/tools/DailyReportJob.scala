package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.Mart

/** The scheduled-orchestration entry point — the role of the reference's
  * Airflow DAG (dags/trigger_spark_job.py:12-45: an `@daily`
  * SparkSubmitOperator launching daily_report.py). Here the schedule stays
  * with the orchestrator (Airflow, cron, whatever the deployment has); this
  * is the job it submits:
  *
  * {{{
  * spark-submit --class graft.tools.DailyReportJob graft.jar \
  *   <sfDir> <martDir> [yyyy-MM]
  * }}}
  *
  * Runs the daily-revenue aggregation and writes the partitioned mart.
  * Idempotent by construction: the writer uses dynamic-partition overwrite
  * (Mart.writeDailyRevenue), so re-running a day — the first thing an
  * on-call does after a bad upstream load — rewrites exactly the affected
  * month partitions and leaves the rest byte-identical. The optional third
  * arg restricts the run to one month (the Airflow `ds`-scoped backfill
  * shape): only that month's rows are computed and only that partition is
  * replaced.
  *
  * Exit code contract for the orchestrator: 0 on success with a one-line
  * summary on stdout; nonzero (an uncaught exception) marks the task
  * failed for retry.
  */
object DailyReportJob {

  /** The job body, session-agnostic so the spec drives it on the shared
    * test session; main owns the session lifecycle for spark-submit.
    * Returns the summary line it printed.
    */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      martDir: String, monthFilter: Option[String]): String = {
    Mart.writeDailyRevenue(spark, sfDir, martDir, monthFilter)
    val written = Mart.readDailyRevenue(spark, martDir)
      .transform(df => monthFilter.fold(df)(m => df.filter(col("month") === m)))
      .agg(count(lit(1)), sum(col("revenue"))).head()
    val line = s"[daily-report] month=${monthFilter.getOrElse("ALL")} " +
      s"days=${written.getLong(0)} revenue=${written.get(1)} -> $martDir"
    println(line)
    line
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DailyReportJob <sfDir> <martDir> [yyyy-MM month filter]")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args(0), args(1), args.lift(2))
    finally spark.stop()
  }
}
