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

  def start(s: SparkSession, inDir: String, reference: DataFrame,
      outDir: String, checkpointDir: String, tau: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // static side: one materialization for the life of the query
    val refPost = Dedup.referencePostings(reference).localCheckpoint()
    s.readStream.schema(docSchema).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.nearDupsAgainst(batch, refPost, tau)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  def readFlagged(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
