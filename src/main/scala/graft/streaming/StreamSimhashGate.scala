package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Ingestion-time SimHash gate — the hamming-radius twin of
  * [[StreamNearDup]]: every micro-batch of incoming documents is
  * fingerprinted and checked against a static reference corpus with the
  * SAME exact-radius multi-chunk banding the batch `dedup_simhash` uses.
  * By pigeonhole the check is COMPLETE: an incoming doc within the hamming
  * radius of any reference doc shares at least one key table entry, so it
  * cannot slip through the gate.
  *
  * Scale: the reference key table is built ONCE from the reference corpus
  * size's geometry and reliable-checkpointed (query-lifetime state must
  * survive executor loss); each batch shuffles only its own C(m,c) keys per
  * doc against it. Output per batch overwrites `batch=<id>` — replay
  * idempotent.
  */
object StreamSimhashGate {

  /** Gate against an already-keyed reference table + its geometry — the
    * deployment shape (persisted key table, rebuilt on corpus refresh).
    */
  def startWithKeys(s: SparkSession, inDir: String, refKeyed: DataFrame,
      widths: Seq[Int], combos: Seq[Seq[Int]], outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(StreamNearDup.docSchema).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bKeyed = Dedup.simhashKeys(
          Dedup.simhashFingerprintsOf(batch), widths, combos)
        bKeyed.as("a").join(refKeyed.as("b"),
            col("a.t") === col("b.t") && col("a.key") === col("b.key"))
          .select(col("a.doc_id").as("in_id"), col("b.doc_id").as("ref_id"),
            bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
          .filter(col("hamming") <= Dedup.SimhashRadius)
          .distinct()
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Convenience: derive geometry from the reference corpus size and key
    * the reference once, reliable-checkpointed.
    */
  def start(s: SparkSession, inDir: String, reference: DataFrame,
      outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val (widths, combos) = Dedup.simhashGeometry(reference.count())
    val refKeyed = Dedup.durable(
      Dedup.simhashKeys(Dedup.simhashFingerprintsOf(reference), widths, combos))
    startWithKeys(s, inDir, refKeyed, widths, combos, outDir, checkpointDir, trigger)
  }

  def readFlagged(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
