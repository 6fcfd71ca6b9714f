package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.NativeVector
import graft.functions.VectorFunctions.toDouble
import graft.operators.{Scale, Similarity}

/** Scratch timing/explain harness (not driver-facing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/region.parquet").count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .filter(col("vec_id") >= Similarity.NumQueries)
    val cc = Similarity.centColsFor(spark, d)
    def topKEdges(sc: DataFrame): DataFrame =
      Scale.topKPerGroup(sc.select(col("src"), col("dst"), col("cos")),
        Seq("src"), Seq(col("cos").desc, col("dst")), k = Similarity.GraphK,
        saltSrc = col("dst"))
        .select(col("src"), col("dst"), col("cos"), col("rnk"))

    def base(): DataFrame = {
      val cellAssigned = cc.cleanup(cc.attach(e)
        .withColumn("cell", NativeVector.argmaxDot(col("v"), cc.flat, cc.sn)))
      val probes = cc.attach(e)
        .withColumn("cell",
          explode(NativeVector.argTopKDot(col("v"), cc.flat, cc.sn, lit(Similarity.GraphProbe))))
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cell"))
      val scored = probes.join(cellAssigned, "cell")
        .filter(col("q_id") =!= col("vec_id"))
        .withColumn("cos", NativeVector.cosine(col("qv"), col("v")))
        .select(col("q_id").as("src"), col("vec_id").as("dst"), col("cos"))
      Scale.materialize(topKEdges(scored).drop("rnk"))
    }

    // current round shape: sym self-join
    def roundJoin(edges: DataFrame): DataFrame = {
      val sym = edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      val cand = sym.select(col("src").as("a"), col("dst").as("b"))
        .join(sym.select(col("src").as("b"), col("dst").as("c")), "b")
        .filter(col("a") =!= col("c"))
        .select(col("a").as("src"), col("c").as("dst")).distinct()
        .join(edges.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
      val freshScored = cand
        .join(e.select(col("vec_id").as("src"), col("v").as("va")), "src")
        .join(e.select(col("vec_id").as("dst"), col("v").as("vc")), "dst")
        .withColumn("cos", NativeVector.cosine(col("va"), col("vc")))
        .select(col("src"), col("dst"), col("cos"))
      Scale.materialize(topKEdges(edges.unionByName(freshScored)).drop("rnk"))
    }

    // array-expansion round shape: group neighbors per middle node, explode pairs
    def roundArray(edges: DataFrame): DataFrame = {
      val sym = edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      val nbrs = sym.groupBy(col("src").as("b"))
        .agg(collect_set(col("dst")).as("ns"))
      val cand = nbrs
        .select(explode(col("ns")).as("a"), col("ns"))
        .select(col("a"), explode(col("ns")).as("c"))
        .filter(col("a") =!= col("c"))
        .select(col("a").as("src"), col("c").as("dst")).distinct()
        .join(edges.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
      val freshScored = cand
        .join(e.select(col("vec_id").as("src"), col("v").as("va")), "src")
        .join(e.select(col("vec_id").as("dst"), col("v").as("vc")), "dst")
        .withColumn("cos", NativeVector.cosine(col("va"), col("vc")))
        .select(col("src"), col("dst"), col("cos"))
      Scale.materialize(topKEdges(edges.unionByName(freshScored)).drop("rnk"))
    }

    for (rep <- 1 to 2) {
      val e0 = time(s"r$rep base build")(base())
      var ej = e0
      for (r <- 1 to 2) ej = time(s"r$rep roundJoin $r")(roundJoin(ej))
      var ea = e0
      for (r <- 1 to 2) ea = time(s"r$rep roundArray $r")(roundArray(ea))
      val cj = ej.orderBy("src", "dst").collect()
      val ca = ea.orderBy("src", "dst").collect()
      println(s"[scratch] r$rep equal=${cj.sameElements(ca)} n=${cj.length}")
    }
    spark.stop()
  }
}
