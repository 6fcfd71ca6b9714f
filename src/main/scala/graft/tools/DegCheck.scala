package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

object DegCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      for (r <- 0 to 2) {
        val e = graft.operators.Similarity.knnGraphRounds(spark, d, r)
          .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
        val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        val mx = sym.groupBy("src").agg(count(lit(1)).as("dg")).agg(max("dg"), expr("percentile(dg, 0.99)")).head()
        println(s"[degcheck] $d round=$r maxdeg=${mx.getLong(0)} p99=${mx.get(1)}")
      }
    }
    spark.stop()
  }
}
