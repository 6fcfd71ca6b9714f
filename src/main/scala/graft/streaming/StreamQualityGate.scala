package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.functions.TextFunctions.tokens
import graft.operators.TextQueries

/** Ingestion-time model-based quality gate: every micro-batch of incoming
  * documents is scored with the SAME trained literal-weight classifier the
  * batch `text_quality_model` query uses (TextQueries.qmScore — weights
  * trained once, embedded in the expression), and rows land in a per-batch
  * output partition carrying (qm_score, pred). The operational form of
  * model-based filtering: the crawl is triaged as it arrives, not in a
  * nightly re-score of the whole corpus.
  *
  * Scale: the model is a literal lookup table inside a per-row expression —
  * scoring adds ZERO shuffle and no state to the stream; per-batch output
  * overwrites `batch=<id>`, so checkpoint replays are idempotent (the
  * StreamNearDup contract).
  */
object StreamQualityGate {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def start(s: SparkSession, inDir: String, model: TextQueries.QmModel,
      outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(docSchema).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("toks", tokens(col("text")))
          .select(col("doc_id"), TextQueries.qmScore(model).as("qm_score"))
          .withColumn("pred", when(col("qm_score") > 0, lit(1)).otherwise(lit(0)))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  def readScored(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
