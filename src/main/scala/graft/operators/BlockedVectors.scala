package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.toDouble

/** Grid-blocked exact pairwise cosine — the scale path when the corpus no
  * longer fits in a broadcast (Dedup.dedupEmbedding's documented limit).
  *
  * Vectors are hashed into B blocks; every unordered block pair (bi ≤ bj)
  * is a grid cell. Each vector ships to the B cells it participates in, a
  * shuffle groups each cell's two blocks on one task, and the same
  * primitive-double kernel runs per cell. Peak task memory = 2 blocks
  * (corpus/B each) regardless of corpus size; total work is the same
  * all-pairs O(n²/2) spread across B·(B+1)/2 independent cells. Choose
  * B ≈ corpus_bytes / executor_budget.
  */
object BlockedVectors {

  def pairwiseCosineBlocked(s: SparkSession, vecs: DataFrame, tau: Double,
      nBlocks: Int): DataFrame = {
    import s.implicits._
    val b = lit(nBlocks)
    // every vector joins cell (bi, bj) iff its block is bi or bj
    val withBlock = vecs.withColumn("blk", pmod(col("vec_id"), b).cast("int"))
    val cells = withBlock.select(col("vec_id"), col("v"), col("blk"),
      explode(sequence(lit(0), b - 1)).as("other"))
      .withColumn("bi", least(col("blk"), col("other")))
      .withColumn("bj", greatest(col("blk"), col("other")))
      .select(col("bi") * b + col("bj"), col("vec_id"), col("v"))
      .toDF("cell", "vec_id", "v")
      .as[(Int, Long, Array[Double])]
    cells.groupByKey(_._1).flatMapGroups { (cell, it) =>
      val rows = it.map { case (_, id, v) => (id, v) }.toArray
      val bi = cell / nBlocks; val bj = cell % nBlocks
      def n2(v: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < v.length) { acc += v(i) * v(i); i += 1 }; acc
      }
      val norms = rows.map { case (_, v) => n2(v) }
      val out = Iterator.tabulate(rows.length) { a =>
        val (ida, va) = rows(a)
        val blkA = (ida % nBlocks).toInt
        Iterator.range(0, rows.length).flatMap { c =>
          val (idb, vb) = rows(c)
          val blkB = (idb % nBlocks).toInt
          // each pair is computed in exactly one cell: its own (bi, bj)
          val owns = math.min(blkA, blkB) == bi && math.max(blkA, blkB) == bj
          if (ida < idb && owns) {
            var dot = 0.0; var i = 0
            while (i < va.length) { dot += va(i) * vb(i); i += 1 }
            val cos = dot / math.sqrt(norms(a) * norms(c))
            if (cos >= tau) Some((ida, idb, math.floor(cos * 1e6) / 1e6)) else None
          } else None
        }
      }.flatten
      out
    }.toDF("vec_a", "vec_b", "cos")
  }

  /** Smallest block count whose B·(B+1)/2 grid cells cover the cluster's
    * parallelism — below it the quadratic work idles cores (nBlocks=4 is
    * 10 cells: 10 tasks on a 32-core local[32], 10 tasks on a 1000-core
    * cluster). Memory still bounds B from the other side (Dedup's
    * byte-derived floor wins when it is larger).
    */
  def blocksForParallelism(s: SparkSession): Int = {
    val p = s.sparkContext.defaultParallelism
    math.max(4, math.ceil((math.sqrt(8.0 * p + 1) - 1) / 2).toInt)
  }

  /** Same contract as dedup_embedding, blocked. Default block count covers
    * the session's cores (see [[blocksForParallelism]]).
    */
  def dedupEmbeddingBlocked(s: SparkSession, d: String, nBlocks: Int = 0): DataFrame =
    pairwiseCosineBlocked(s,
      Tables.embeddings(s, d).select(col("vec_id"), toDouble(col("embedding")).as("v")),
      tau = 0.40,
      nBlocks = if (nBlocks > 0) nBlocks else blocksForParallelism(s))
}
