package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max statistics index + data-skipping reads — the
  * Delta/Iceberg manifest-stats role (and ClickHouse's sparse primary
  * index role) for a plain parquet directory: ONE scan builds a stats
  * table bounded by the file count; a range query then reads only the
  * files whose [min,max] interval intersects the predicate, with the
  * predicate re-applied as a residual filter inside the pruned scan
  * (stats prune files, they never answer queries).
  *
  * Worth it exactly when the layout clusters the column — the z-order /
  * range-partitioned writes this library already produces — so the
  * intervals are narrow and disjoint; on a random layout every file
  * intersects and the index honestly prunes nothing (StatsIndexSpec
  * measures both). At 100 TB the stats table is #files rows (metadata
  * scale), the build is one map-side-partial aggregate, and the pruned
  * read's file list is a driver-side metadata decision — the same shape
  * every table format performs on its manifests.
  */
object StatsIndex {

  /** One row per file: `file`, and `<c>_min`/`<c>_max` per stats column. */
  def build(s: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    s.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose stats interval intersects [lo, hi] on `c`. */
  def candidateFiles(stats: DataFrame, c: String, lo: Long, hi: Long): Seq[String] =
    stats.filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** The skipping read: pruned file list + the residual predicate. Returns
    * (frame, filesRead, filesTotal) so callers — and the spec — can see
    * the pruning rate.
    */
  def prunedRead(s: SparkSession, dir: String, stats: DataFrame, c: String,
      lo: Long, hi: Long): (DataFrame, Int, Long) = {
    val files = candidateFiles(stats, c, lo, hi)
    val total = stats.count()
    val df =
      if (files.isEmpty) s.read.parquet(dir).filter(lit(false))
      else s.read.parquet(files: _*).filter(col(c) >= lo && col(c) <= hi)
    (df, files.size, total)
  }
}
