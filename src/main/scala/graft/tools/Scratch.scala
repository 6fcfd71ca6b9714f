package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
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

    // Whole-query walls, isolated, warm session
    time("knn_graph        total")(Similarity.knnGraph(spark, d)
      .write.format("noop").mode("overwrite").save())

    // Build phases (mirror of knnGraphEdgesOver)
    import graft.Tables
    import graft.functions.VectorFunctions.toDouble
    import graft.functions.NativeVector
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .filter(col("vec_id") >= Similarity.NumQueries)
    val cc = Similarity.centColsFor(spark, d)
    val cellAssigned = time("cellAssigned mat") {
      Scale.materialize(cc.cleanup(cc.attach(e)
        .withColumn("cell", NativeVector.argmaxDot(col("v"), cc.flat, cc.sn))))
    }
    val probes = cc.attach(e)
      .withColumn("cell",
        explode(NativeVector.argTopKDot(col("v"), cc.flat, cc.sn, lit(Similarity.GraphProbe))))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cell"))
    val scored = probes.join(cellAssigned, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", NativeVector.cosine(col("qv"), col("v")))
      .select(col("q_id").as("src"), col("vec_id").as("dst"), col("cos"))
    def topKEdges(sc: DataFrame): DataFrame =
      Scale.topKPerGroup(sc.select(col("src"), col("dst"), col("cos")),
        Seq("src"), Seq(col("cos").desc, col("dst")), k = Similarity.GraphK,
        saltSrc = col("dst"))
        .select(col("src"), col("dst"), col("cos"), col("rnk"))
    var edges = time("base cell graph  (round0 mat)") {
      Scale.materialize(topKEdges(scored).drop("rnk"))
    }
    for (r <- 1 to 2) {
      edges = time(s"descent round $r mat") {
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
    }
    // sym + entry + hops of the search walk
    val sym = time("sym mat") {
      Scale.materialize(edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    }
    val q = Tables.embeddings(spark, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qCell = cc.cleanup(cc.attach(q.withColumnRenamed("qv", "v"))
        .withColumn("cell", NativeVector.argmaxDot(col("v"), cc.flat, cc.sn)))
      .select(col("q_id"), col("v").as("qv"), col("cell"))
    val beam0 = time("beam0 mat") {
      Scale.materialize(Scale.topKPerGroup(
        broadcast(qCell).join(cellAssigned, "cell")
          .withColumn("cos", NativeVector.cosine(col("qv"), col("v")))
          .select(col("q_id"), col("vec_id"), col("cos")),
        Seq("q_id"), Seq(col("cos").desc, col("vec_id")), k = Similarity.GsBeam,
        saltSrc = col("vec_id")).drop("rnk"))
    }
    var beam = beam0
    for (h <- 1 to Similarity.GsHops) {
      beam = time(s"hop $h mat") {
        val nb = beam.select(col("q_id"), col("vec_id"))
          .join(sym, col("vec_id") === col("src"))
          .select(col("q_id"), col("dst").as("vec_id"))
          .distinct()
          .join(beam.select(col("q_id"), col("vec_id")),
            Seq("q_id", "vec_id"), "left_anti")
        val scoredH = nb.join(e, "vec_id")
          .join(broadcast(q), "q_id")
          .withColumn("cos", NativeVector.cosine(col("qv"), col("v")))
          .select(col("q_id"), col("vec_id"), col("cos"))
        if (h == 1) {
          println("=== hop1 plan ===")
          println(Scale.topKPerGroup(beam.unionByName(scoredH), Seq("q_id"),
            Seq(col("cos").desc, col("vec_id")), k = Similarity.GsBeam,
            saltSrc = col("vec_id")).drop("rnk")
            .queryExecution.explainString(
              org.apache.spark.sql.execution.SimpleMode).take(4000))
        }
        Scale.materialize(Scale.topKPerGroup(beam.unionByName(scoredH), Seq("q_id"),
          Seq(col("cos").desc, col("vec_id")), k = Similarity.GsBeam,
          saltSrc = col("vec_id")).drop("rnk"))
      }
    }
    val brute = time("brute mat") {
      Scale.materialize(Similarity.knnBrute(spark, d).select(col("q_id"), col("nn_id")))
    }
    brute.count()
    spark.stop()
  }
}
