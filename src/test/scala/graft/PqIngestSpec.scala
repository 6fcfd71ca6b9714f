package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.streaming.PqIngest
import graft.functions.VectorFunctions.toDouble

/** Streaming PQ/OPQ code assignment: the ingested code store must hold
  * EXACTLY the codes the batch knn_pq / knn_opq encode assigns (same
  * trained codebooks from the per-dir cache, zero retrain per batch), and
  * replay must be a no-op. Equality is exact — the encode is the same
  * native expression over the same literals, so any drift is a bug, not
  * tolerance.
  */
class PqIngestSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def corpus = Tables.embeddings(spark, sf)
    .filter(col("vec_id") >= Similarity.NumQueries)

  private def batchCodes(opq: Boolean): Set[(Long, Seq[Int])] = {
    val vecs = corpus.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val enc = if (opq) Similarity.opqEncodeFrame(vecs, spark, sf)
              else Similarity.pqEncodeFrame(vecs, spark, sf)
    enc.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toSet
  }

  private def storedCodes(dir: String): Set[(Long, Seq[Int])] =
    PqIngest.store(spark, dir).select(col("vec_id"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toSet

  private def deleteRec(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete(); ()
  }

  test("streamed PQ and OPQ codes equal the batch encode; replay is a no-op") {
    val tmp = Files.createTempDirectory("graft_pq_ingest").toString
    corpus.repartition(4).write.mode("overwrite").parquet(s"$tmp/src")

    for (opq <- Seq(false, true)) {
      val store = s"$tmp/store_${if (opq) "opq" else "pq"}"
      PqIngest.ingest(spark, sf, s"$tmp/src", store, opq = opq)
      val stored = storedCodes(store)
      assert(stored === batchCodes(opq),
        s"streamed ${if (opq) "OPQ" else "PQ"} codes drift from batch encode")
      // replay: wipe the stream checkpoint so AvailableNow re-reads all
      // files; the per-batch manifest must swallow the replay
      deleteRec(new java.io.File(s"$store/chk"))
      PqIngest.ingest(spark, sf, s"$tmp/src", store, opq = opq)
      assert(storedCodes(store).size === stored.size, "replay duplicated rows")
    }
    // PQ and OPQ codebooks are different models — the stores must differ
    // somewhere or the rotation did nothing on this corpus (it does: the
    // eigenbasis reorders dimensions even when isotropy keeps recall flat)
    assert(storedCodes(s"$tmp/store_pq") !== storedCodes(s"$tmp/store_opq"))
    // the MAINTAINED distortion monitor equals the batch audit exactly —
    // the corpus ingested is exactly embed_pq_distortion's corpus (vec_id
    // >= NumQueries), integer partials fold associatively across batches
    val streamed = PqIngest.distortion(spark, s"$tmp/store_pq")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Similarity.embedPqDistortion(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch, "maintained distortion drifts from the batch audit")
    // OPQ stores carry the monitor too (ADVICE r14: was plain-PQ-only and
    // died on a missing stats path) — rotated-basis partials must fold to
    // the batch OPQ audit exactly, same associativity argument
    val vecs = corpus.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val streamedOpq = PqIngest.distortion(spark, s"$tmp/store_opq")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batchOpq = Similarity.opqDistortionRows(vecs, spark, sf)
      .groupBy(col("subspace"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(d2ppb) div count(1)").as("mean_d2_ppb"),
        max(col("d2ppb")).as("max_d2_ppb"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamedOpq === batchOpq,
      "OPQ maintained distortion drifts from the rotated-basis batch audit")
  }
}
