package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeVector
import graft.functions.VectorFunctions.toDouble
import graft.operators.Similarity
import graft.streaming.GraphIngest

/** Maintained incremental kNN graph: structural contract, exact edge
  * scores, replay idempotence, and MEASURED edge recall against the batch
  * `knn_graph` on the same final corpus (the one-step touched-node repair
  * gives up some of the batch build's full descent — the spec pins how
  * much, so a regression in the repair step is visible).
  */
class GraphIngestSpec extends AnyFunSuite {

  import TestSpark.{spark, sf}

  private def deleteRec(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete(); ()
  }

  test("incremental graph: structure, exact scores, replay, recall vs batch") {
    val tmp = Files.createTempDirectory("graft_graph_ingest").toString
    // the FULL embeddings table — knn_graph's corpus has no query split
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // hash-partitioned by vec_id, NOT round-robin: round-robin assignment
    // depends on the input split layout, so the per-file batch composition
    // (and with it the maintained graph's recall) wobbled with suite load —
    // measured 0.6368..0.6520 across contexts against a 0.6368 floor, a
    // 0.011 margin that full-suite runs breached. Hash partitioning pins
    // the file contents; measured recall now 0.6620..0.6684 across the
    // same contexts (residual ±0.006 from in-batch task order inside the
    // repair), ~4x the old margin over the floor.
    Tables.embeddings(spark, sf)
      .repartition(4, col("vec_id")).write.mode("overwrite").parquet(s"$tmp/src")
    GraphIngest.ingest(spark, sf, s"$tmp/src", s"$tmp/store", filesPerBatch = 1)

    val g = GraphIngest.graph(spark, s"$tmp/store")
      .select(col("src"), col("dst"), col("cos"))
    val n = vecs.count()

    // (1) structure: every ingested node has a list, ≤ GraphK edges each,
    // no self-loops, no duplicate (src, dst) pairs
    val degrees = g.groupBy(col("src")).agg(count(lit(1)).as("deg")).collect()
    assert(degrees.length.toLong === n, "every node must carry an edge list")
    assert(degrees.forall(_.getLong(1) <= Similarity.GraphK))
    assert(g.filter(col("src") === col("dst")).count() === 0L)
    assert(g.select(col("src"), col("dst")).distinct().count() === g.count())

    // (2) stored cos = the exact cosine of the endpoints (same expression,
    // same doubles — any drift in the repair merge would surface here)
    val mismatched = g
      .join(vecs.select(col("vec_id").as("src"), col("v").as("sv")), "src")
      .join(vecs.select(col("vec_id").as("dst"), col("v").as("dv")), "dst")
      .filter(NativeVector.cosine(col("sv"), col("dv")) =!= col("cos"))
      .count()
    assert(mismatched === 0L)

    // (3) replay idempotence: wipe the stream checkpoint so AvailableNow
    // re-reads everything; manifest markers must swallow the replay and
    // the committed graph must be row-identical
    val before = g.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    deleteRec(new java.io.File(s"$tmp/store/chk"))
    GraphIngest.ingest(spark, sf, s"$tmp/src", s"$tmp/store", filesPerBatch = 1)
    val after = GraphIngest.graph(spark, s"$tmp/store")
      .select(col("src"), col("dst"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after === before)

    // (4) quality vs the batch knn_graph, both measured against the EXACT
    // top-GraphK graph (brute force — 256 vectors at sf0.001, trivial in
    // the spec). Agreement-with-batch is the wrong gate: the incremental
    // descent finds high-cos edges the batch build's two global rounds
    // missed, and a better edge would read as a "miss". The contract that
    // matters is that maintaining the graph incrementally costs no
    // quality vs rebuilding it — pinned as true recall within a small
    // margin of the batch build's (and both floors reported).
    val truth = graft.operators.Scale.topKPerGroup(
        vecs.select(col("vec_id").as("src"), col("v").as("sv"))
          .crossJoin(vecs.select(col("vec_id").as("dst"), col("v").as("tv")))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            NativeVector.cosine(col("sv"), col("tv")).as("cos")),
        Seq("src"), Seq(col("cos").desc, col("dst")),
        k = Similarity.GraphK, saltSrc = col("dst"))
      .select(col("src"), col("dst"))
    val nTruth = truth.count().toDouble
    val incRecall = g.select(col("src"), col("dst"))
      .join(truth, Seq("src", "dst"), "left_semi").count() / nTruth
    val batchRecall = Similarity.knnGraph(spark, sf)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      .join(truth, Seq("src", "dst"), "left_semi").count() / nTruth
    info(f"true recall@${Similarity.GraphK}: incremental $incRecall%.4f, batch $batchRecall%.4f")
    assert(incRecall >= batchRecall - 0.05,
      f"maintained graph ($incRecall%.4f) fell >5pts under the batch rebuild ($batchRecall%.4f)")
  }
}
