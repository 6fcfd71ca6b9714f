package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic CDC apply/materialize operators over a flattened change stream
  * (payload cols + op/ts_ms/sign — the shape Envelope.parse emits).
  *
  * These reproduce what ClickHouse `ReplacingMergeTree(ts_ms, sign)` +
  * `FINAL` does for the reference (init-clickhouse.sql), as one-shuffle
  * Spark aggregations.
  *
  * Scale: snapshot is `max_by(struct(...), version)` — associative +
  * commutative, so Spark runs it with map-side partial aggregation and one
  * hash shuffle on the key; no global sort, no per-key row explosion. Skewed
  * hot keys partial-aggregate before the shuffle, so a key updated millions
  * of times ships O(#map-partitions) rows, not O(#updates).
  */
object CdcOps {

  /** Latest version per key; tombstoned keys (latest sign = −1) dropped.
    * Ties on `versionCol` break by the later op in `tieBreak` order.
    */
  def snapshotLatest(changes: DataFrame, keyCols: Seq[String], versionCol: String,
      payloadCols: Seq[String], tieBreak: Column = lit(0)): DataFrame = {
    val ver = struct(col(versionCol), tieBreak)
    val picked = payloadCols.map(c => max_by(col(c), ver).as(c)) :+
      max_by(col("sign"), ver).as("sign") :+
      max(col(versionCol)).as(versionCol)
    changes.groupBy(keyCols.map(col): _*)
      .agg(picked.head, picked.tail: _*)
      .filter(col("sign") === 1)
      .drop("sign")
  }

  /** ReplacingMergeTree `FINAL` at an arbitrary past instant (time travel):
    * the current state the table had at `asOf` = the latest version per key
    * among events with version <= `asOf`, tombstones dropped. The predicate
    * lands on the scan (pushed filter), then the same one-shuffle partial
    * `max_by` as [[snapshotLatest]] — no SCD2 interval materialization, no
    * window over the changelog.
    */
  def snapshotAsOf(changes: DataFrame, keyCols: Seq[String], versionCol: String,
      payloadCols: Seq[String], asOf: Column, tieBreak: Column = lit(0)): DataFrame =
    snapshotLatest(changes.filter(col(versionCol) <= asOf),
      keyCols, versionCol, payloadCols, tieBreak)

  /** At-least-once redelivery guard: drop exact redeliveries of the same
    * (key, version, op). One shuffle; at scale this is the cheap idempotence
    * layer in front of snapshot/SCD2.
    */
  def dedupRedelivery(changes: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame =
    changes.dropDuplicates(keyCols :+ versionCol :+ "op")

  /** Kafka-cleaner log compaction — the TOPIC view, not the table view
    * ([[snapshotLatest]] is the table view): the latest record per key
    * survives, INCLUDING delete tombstones, which are retained only while
    * within `tombstoneRetention` version units of the log head
    * (`delete.retention.ms`: a late-joining consumer must still observe
    * recent deletes; aged-out tombstones disappear with their key).
    *
    * Scale: the same one-shuffle map-side-partial `max_by` as the snapshot,
    * plus a 1-row global max broadcast into the retention filter — no
    * second pass over the log, no window.
    */
  def logCompact(changes: DataFrame, keyCols: Seq[String], versionCol: String,
      payloadCols: Seq[String], tombstoneRetention: Long): DataFrame = {
    val picked = max_by(col("op"), col(versionCol)).as("op") +:
      payloadCols.map(c => max_by(col(c), col(versionCol)).as(c)) :+
      max(col(versionCol)).as(versionCol)
    val latest = changes.groupBy(keyCols.map(col): _*)
      .agg(picked.head, picked.tail: _*)
    val head = changes.agg(max(col(versionCol)).as("head_ver"))
    latest.join(broadcast(head))
      .filter(col("op") =!= "d" ||
        col(versionCol) >= col("head_ver") - lit(tombstoneRetention))
      .drop("head_ver")
  }

  /** SCD-2 history: every state row (sign=1) becomes a version valid from its
    * ts until the next event on the key (including a tombstone, which closes
    * the final interval). Window partitions are per-key — bounded state at
    * any scale.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("nxt", lead(col(versionCol), 1).over(w))
      .filter(col("sign") === 1)
      .withColumn("valid_to", coalesce(col("nxt"), lit(-1L)))
      .withColumn("is_current", when(col("nxt").isNull, lit(1)).otherwise(lit(0)))
      .drop("nxt", "sign", "op", versionCol)
  }

  /** Per-op observability: the ops-mix counters you'd chart for a CDC feed. */
  def changelogStats(changes: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame =
    changes.groupBy(col("op"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(keyCols.head), keyCols.tail.map(col): _*).as("n_keys"),
        min(col(versionCol)).as("min_ts"),
        max(col(versionCol)).as("max_ts"))
}
