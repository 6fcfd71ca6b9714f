package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.streaming.IvfIngest
import graft.functions.VectorFunctions.toDouble

/** Streaming IVF maintenance: the ingested cell-partitioned store must hold
  * exactly the batch index's cell assignment, replay must be a no-op, and
  * queries served FROM THE STORE must equal batch knn_ivf row for row.
  */
class IvfIngestSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("ingested store equals batch assignment, replays clean, serves knn_ivf") {
    val tmp = Files.createTempDirectory("graft_ivf_ingest").toString
    // corpus (query rows excluded, the knn_ivf convention) as 4 src files
    Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= Similarity.NumQueries)
      .repartition(4).write.mode("overwrite").parquet(s"$tmp/src")
    IvfIngest.ingest(spark, sf, s"$tmp/src", s"$tmp/store")

    // (1) assignment parity with the batch index
    val stored = IvfIngest.store(spark, s"$tmp/store")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val batch = Similarity.diagCorpusCells(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(stored === batch)

    // (2) replay idempotence: wipe the stream checkpoint so AvailableNow
    // re-reads everything; the manifest must swallow the replay
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete(); ()
    }
    deleteRec(new java.io.File(s"$tmp/store/chk"))
    IvfIngest.ingest(spark, sf, s"$tmp/src", s"$tmp/store")
    assert(IvfIngest.store(spark, s"$tmp/store").count() === stored.size.toLong)

    // (3) the store SERVES the index: probe cells + cosine top-k from the
    // ingested data equals batch knn_ivf exactly
    val queries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
    val probes = Similarity.queryProbes(queries, spark, sf)
    val scored = probes.join(IvfIngest.store(spark, s"$tmp/store"), "cell")
      .select(col("q_id"), col("vec_id"),
        graft.functions.NativeVector.cosine(col("qv"), col("v")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val served = scored.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(Similarity.K).zipWithIndex
        .map { case ((_, vid, cos), i) =>
          (q, vid, i + 1, math.floor(cos * 1e6) / 1e6) }
    }.toSet
    val ivf = Similarity.knnIvf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(served === ivf)
  }
}
