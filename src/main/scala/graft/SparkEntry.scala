package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.CdcQueries
import graft.streaming.StreamQueries
import graft.operators.{Analytics, AsOf, Audit, Dedup, Econ, Experiments, Graph, Lifecycle, Multimodal, Olap, Quality, Sampling, Scale, Search, Similarity, Sketches, TextAudit, TextQueries, TimeSeries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  /** Flagship: the CDC snapshot — envelope parse + ReplacingMergeTree FINAL
    * semantics end to end (the reference's core loop). */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.snapshotLatest(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ CdcQueries.queries ++ TextQueries.queries ++ Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ StreamQueries.queries ++ Scale.queries ++ AsOf.queries ++ Sampling.queries ++ Olap.queries ++ Graph.queries ++ Sketches.queries ++ Search.queries ++ Experiments.queries ++ Lifecycle.queries ++ Audit.queries ++ Quality.queries ++ Econ.queries ++ TimeSeries.queries ++ TextAudit.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ CdcQueries.oracles ++ TextQueries.oracles ++ Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++ StreamQueries.oracles ++ Scale.oracles ++ AsOf.oracles ++ Sampling.oracles ++ Olap.oracles ++ Graph.oracles ++ Sketches.oracles ++ Search.oracles ++ Experiments.oracles ++ Lifecycle.oracles ++ Audit.oracles ++ Quality.oracles ++ Econ.oracles ++ TimeSeries.oracles ++ TextAudit.oracles

  /** Scale-affordable oracle OVERRIDES for the members whose gate oracles
    * are quadratic by design (brute all-pairs, recursive-over-brute,
    * interpreted per-pair folds): value-identical SQL that stays inside a
    * per-query budget at sf1+ (`tools/check_one.py --oracles=scale`). Keys
    * are a subset of [[oracleSql]]; the driver gate keeps the brute forms.
    */
  def scaleOracleSql: Map[String, String] =
    Dedup.scaleOracles ++ TextQueries.scaleOracles ++ Similarity.scaleOracles ++ Graph.scaleOracles
}
