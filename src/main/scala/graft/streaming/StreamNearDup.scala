package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.Dedup

/** Ingestion-time near-dup gate: every micro-batch of incoming documents is
  * checked against a static reference corpus with the SAME verified jaccard
  * pipeline the batch dedup uses (Dedup.nearDupsAgainst), and flagged pairs
  * land in a per-batch output partition — the operational form of corpus
  * dedup: new data is gated as it arrives instead of re-deduping the whole
  * corpus per refresh.
  *
  * Scale: the reference postings are materialized ONCE and reused across
  * batches (at lake scale: a persisted/bucketed postings table); each batch
  * joins only its own shingles against them. Output per batch overwrites
  * `batch=<id>`, so checkpoint replays are idempotent.
  */
object StreamNearDup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Gate against an ALREADY-materialized postings table — the deployment
    * shape for a long-lived gate (persisted/bucketed postings, rebuilt on
    * corpus refresh, shared across query restarts).
    */
  def startWithPostings(s: SparkSession, inDir: String, refPost: DataFrame,
      outDir: String, checkpointDir: String, tau: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(docSchema).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.nearDupsAgainst(batch, refPost, tau)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Convenience: derive the postings from raw reference docs, materialized
    * to RELIABLE storage (not localCheckpoint: query-lifetime state must
    * survive executor loss — the same rule dedup_clusters' iteration state
    * follows).
    */
  def start(s: SparkSession, inDir: String, reference: DataFrame,
      outDir: String, checkpointDir: String, tau: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startWithPostings(s, inDir,
      Dedup.durable(Dedup.referencePostings(reference)),
      outDir, checkpointDir, tau, trigger)

  def readFlagged(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
