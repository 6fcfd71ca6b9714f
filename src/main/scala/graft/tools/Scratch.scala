package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{BlockedVectors, Similarity, Scale}

/** Scratch timing/explain harness (not driver-facing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/region.parquet").count()
    val truth = Scale.materialize(BlockedVectors.dedupEmbeddingBlocked(spark, d, 8))
    val ann = Scale.materialize(Similarity.dedupEmbeddingAnn(spark, d)
      .select(col("vec_a"), col("vec_b"), lit(1).as("hit")))
    truth.join(ann, Seq("vec_a", "vec_b"), "left_outer")
      .groupBy(floor(col("cos") * 20).as("band"))
      .agg(count(lit(1)).as("n_true"), sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .orderBy(col("band"))
      .show(30, false)
    spark.stop()
  }
}
