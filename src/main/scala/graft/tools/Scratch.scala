package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity

/** Scratch timing/explain harness (not driver-facing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def reduce(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(bit_xor(col("h"))).collect()
    spark.read.parquet(s"$d/region.parquet").count()
    time("knn_graph") { reduce(Similarity.knnGraph(spark, d)) }
    time("knn_ivf") { reduce(Similarity.knnIvf(spark, d)) }
    time("knn_ivfpq") { reduce(Similarity.knnIvfPq(spark, d)) }
    time("knn_pq") { reduce(Similarity.knnPq(spark, d)) }
    time("dedup_semdedup") { reduce(Similarity.dedupSemdedup(spark, d)) }
    spark.stop()
  }
}
