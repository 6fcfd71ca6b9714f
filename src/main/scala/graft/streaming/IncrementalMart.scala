package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.cdc.Envelope

/** Incrementally-maintained aggregate mart over the CDC stream — the
  * ClickHouse `AggregatingMergeTree` role next to IncrementalSnapshot's
  * `ReplacingMergeTree`: `mart ≡ SELECT group, count(*), sum(value) FROM
  * current-snapshot GROUP BY group` after every micro-batch, maintained by
  * DELTAS, never by re-aggregating the snapshot.
  *
  * The changelog alone cannot drive this: update events carry no `before`
  * image (Debezium's default replica identity), so the retraction for a
  * key's previous contribution must come from maintained state. Each batch
  * therefore diffs the two adjacent snapshot VERSIONS restricted to the
  * batch's touched keys:
  *
  *   delta = (+1) · new-version rows of touched keys
  *         ∪ (−1) · old-version rows of touched keys
  *   mart  = Σ-merge(stored mart, Σ delta)   — groups with count 0 drop out.
  *
  * Scale: touched keys per batch ≪ snapshot, and both version reads are
  * pruned by a semi-join on them; the mart itself is one row per group.
  * Measures sum in DECIMAL(18,4), so the incremental total is bit-equal to
  * the batch aggregate regardless of addition order (proved in
  * IncrementalMartSpec).
  *
  * Exactly-once: the same version-dir + manifest-marker + _LATEST protocol
  * as IncrementalSnapshot, committed AFTER the snapshot's own commit — a
  * crash between the two replays the batch, whose snapshot merge no-ops and
  * whose mart delta re-reads the SAME two immutable version dirs
  * (versionBefore, not the already-moved pointer), landing the identical
  * mart. Ref: init-clickhouse.sql (the mart tables), daily_report.py (the
  * report this keeps perpetually fresh).
  */
object IncrementalMart {

  def readMart(s: SparkSession, dir: String): Option[DataFrame] =
    IncrementalSnapshot.latestVersion(dir).map(v => s.read.parquet(s"$dir/v=$v"))

  /** foreachBatch body: merge the batch into the snapshot, then fold the
    * touched-key delta into the stored mart.
    */
  def merge(snapDir: String, martDir: String, keyCols: Seq[String],
      payloadCols: Seq[String], groupCol: String, valueCol: String)
      (batch: DataFrame, batchId: Long): Unit = {
    IncrementalSnapshot.merge(snapDir, keyCols, payloadCols)(batch, batchId)
    val manifest = Paths.get(martDir, "_manifest")
    Files.createDirectories(manifest)
    val marker = manifest.resolve(batchId.toString)
    if (Files.exists(marker)) {
      if (!IncrementalSnapshot.pointerVersion(martDir).exists(_ >= batchId))
        IncrementalSnapshot.flipLatest(martDir, batchId)
      return
    }
    val s = batch.sparkSession
    val touched = batch.select(keyCols.map(col): _*).distinct()
    def contrib(version: Option[Long], sign: Int): Option[DataFrame] =
      version.map { v =>
        s.read.parquet(s"$snapDir/v=$v")
          .join(touched, keyCols, "left_semi")
          .select(col(groupCol), lit(sign).as("sign"),
            col(valueCol).cast("decimal(18,4)").as("val"))
      }
    val plus = contrib(Some(batchId), 1).get
    val minus = contrib(IncrementalSnapshot.versionBefore(snapDir, batchId), -1)
    val delta = minus.map(plus.unionByName(_)).getOrElse(plus)
      .groupBy(col(groupCol))
      .agg(sum(col("sign")).cast("long").as("n"),
        sum(col("sign") * col("val")).cast("decimal(18,4)").as("total"))
    val merged = readMart(s, martDir)
      .map(_.unionByName(delta))
      .getOrElse(delta)
      .groupBy(col(groupCol))
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("total")).cast("decimal(18,4)").as("total"))
      .filter(col("n") > 0)
    merged.write.mode("overwrite").parquet(s"$martDir/v=$batchId")
    Files.createFile(marker)
    IncrementalSnapshot.flipLatest(martDir, batchId)
  }

  /** Stream a CDC source into a maintained (snapshot, mart) pair. */
  def start(s: SparkSession, src: CdcPipeline.Source, payloadSchema: StructType,
      keyCols: Seq[String], groupCol: String, valueCol: String,
      snapDir: String, martDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val payloadCols = payloadSchema.fieldNames.toSeq.filterNot(keyCols.contains)
    Envelope.parse(CdcPipeline.read(s, src), payloadSchema)
      .writeStream
      .foreachBatch(merge(snapDir, martDir, keyCols, payloadCols, groupCol, valueCol) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
