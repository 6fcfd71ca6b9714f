package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions._

/** Scratch micro-benchmark for pairwise cosine variants (not driver-facing). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val eh = e.withColumn("n2", norm2(col("v")))
    val eu = e.withColumn("n2", norm2U(col("v")))
    for (_ <- 1 to 2) {
      time("hof ") {
        eh.as("a").join(eh.as("b"), col("a.vec_id") < col("b.vec_id"))
          .withColumn("cos", dot(col("a.v"), col("b.v")) / sqrt(col("a.n2") * col("b.n2")))
          .filter(col("cos") >= 0.40).count()
      }
      time("unrl") {
        eu.as("a").join(eu.as("b"), col("a.vec_id") < col("b.vec_id"))
          .withColumn("cos", dotU(col("a.v"), col("b.v")) / sqrt(col("a.n2") * col("b.n2")))
          .filter(col("cos") >= 0.40).count()
      }
    }
    spark.stop()
  }
}
