package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextQueries

/** Ingestion-time benchmark-decontamination gate: every micro-batch of
  * incoming documents probes the SAME literal Bloom bitmap the batch
  * `text_decontaminate_bloom` query uses (built once over the benchmark's
  * grams), flagging docs that share any 5-gram with the held-out slice —
  * the operational form of decontamination: the crawl is screened as it
  * arrives instead of re-joined against the benchmark nightly.
  *
  * Scale: the filter is a literal in a per-row expression — the gram array
  * and all BloomK probes evaluate inside `filter`/`size` higher-order
  * functions, so scoring adds ZERO shuffle and no state to the stream (the
  * StreamQualityGate shape; the benchmark never ships anywhere — it IS the
  * expression). Per-batch output overwrites `batch=<id>`, so checkpoint
  * replays are idempotent.
  */
object StreamDecontamGate {

  def start(s: SparkSession, inDir: String, bloom: TextQueries.BloomIndex,
      outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(StreamQualityGate.docSchema).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
          .filter(size(col("toks")) >= TextQueries.DecontamN)
          .withColumn("grams", TextQueries.gramArray)
          .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
            size(filter(col("grams"), g => TextQueries.bloomHitOn(bloom, g)))
              .cast("long").as("n_flagged"))
          .withColumn("contaminated",
            when(col("n_flagged") > 0, lit(1)).otherwise(lit(0)))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  def readFlags(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
