package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions.toDouble
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
    spark.read.parquet(s"$d/region.parquet").count()
    val c = Tables.embeddings(spark, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .filter(col("vec_id") >= Similarity.NumQueries)
    time("sample collect") {
      c.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(Similarity.TrainSample)
        .select(col("v")).collect()
    }
    time("sample collect again") {
      c.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(Similarity.TrainSample)
        .select(col("v")).collect()
    }
    def reduce(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(bit_xor(col("h"))).collect()
    time("ivf run1") { reduce(Similarity.knnIvf(spark, d)) }
    time("ivf run2") { reduce(Similarity.knnIvf(spark, d)) }
    spark.stop()
  }
}
