package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{Dedup, TextQueries}

/** The WHOLE ingestion gate as one pass — the production shape of a
  * training-data intake pipeline: every micro-batch of incoming documents
  * is (1) scored by the trained quality classifier, (2) probed against the
  * benchmark Bloom filter for contamination, and (3) checked for near-dups
  * against the reference corpus, and ONE admit/reject decision with the
  * losing reason lands per doc. Running the three gates as separate
  * nightly jobs re-reads the batch three times and leaves the admit
  * semantics implicit in job ordering; composed, the batch is read once
  * and the decision rule is code.
  *
  * Scale: gates (1) and (2) are per-row literal folds — zero shuffle, no
  * state (their standalone gates prove the parity; this pipeline reuses
  * the same expressions). Gate (3) is the one join: the batch's shingles
  * against the ONCE-materialized reference postings (the StreamNearDup
  * core — at lake scale a persisted/bucketed postings table). Reject
  * precedence is fixed (quality < contaminated < near_dup — the cheapest
  * signal that fires names the reason) so outputs are deterministic.
  * Per-batch output overwrites `batch=<id>`; replays are no-ops.
  */
object StreamIngestPipeline {

  def start(s: SparkSession, inDir: String, model: TextQueries.QmModel,
      bloom: TextQueries.BloomIndex, refPost: DataFrame, outDir: String,
      checkpointDir: String, tau: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(StreamQualityGate.docSchema).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint() // read once: scored side + shingle side
        val scored = b
          .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
          .select(col("doc_id"),
            TextQueries.qmScore(model).as("qm_score"),
            // the when-guard, not &&: sequence() inside gramArray would run
            // DESCENDING for docs shorter than N (Spark && does not
            // short-circuit the right operand)
            when(size(col("toks")) >= TextQueries.DecontamN,
              exists(TextQueries.gramArray,
                g => TextQueries.bloomHitOn(bloom, g)))
              .otherwise(lit(false)).as("contaminated"))
        val ndup = Dedup.nearDupsAgainst(b, refPost, tau)
          .groupBy(col("in_id").as("doc_id"))
          .agg(count(lit(1)).as("ndup_refs"))
        scored.join(ndup, Seq("doc_id"), "left_outer")
          .withColumn("ndup_refs", coalesce(col("ndup_refs"), lit(0L)))
          .withColumn("reject_reason",
            when(col("qm_score") <= 0, lit("quality"))
              .when(col("contaminated"), lit("contaminated"))
              .when(col("ndup_refs") > 0, lit("near_dup")))
          .withColumn("admit",
            when(col("reject_reason").isNull, lit(1)).otherwise(lit(0)))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  def readDecisions(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
