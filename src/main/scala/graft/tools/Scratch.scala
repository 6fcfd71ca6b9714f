package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Graph, Scale}

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

    // --- pagerank stage profile
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    var liM: org.apache.spark.sql.DataFrame = null
    time("li distinct + mat") { liM = Scale.materialize(li); liM.count() }
    val edges0 = liM.as("a").join(liM.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    var nodes: org.apache.spark.sql.DataFrame = null
    time("nodes + mat") {
      nodes = Scale.materialize(
        liM.select(col("l_partkey").as("p")).distinct().repartition(col("p")))
      nodes.count()
    }
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    var edges: org.apache.spark.sql.DataFrame = null
    time("deg window + mat (fused)") {
      import org.apache.spark.sql.expressions.Window
      edges = Scale.materialize(edges0
        .withColumn("d", count(lit(1)).over(Window.partitionBy(col("src")))))
      edges.count()
    }
    var ranks: org.apache.spark.sql.DataFrame = null
    time("rank init + mat") {
      ranks = Scale.materialize(nodes.join(broadcast(nn))
        .select(col("p"), expr(s"${Graph.PrScale} div n_nodes").as("r")))
      ranks.count()
    }
    for (k <- 1 to Graph.PrIters) time(s"superstep $k") {
      val contrib = edges.join(ranks, col("src") === col("p"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div d")).as("c"))
      val next = nodes.join(broadcast(nn))
        .join(contrib, col("p") === col("dst"), "left_outer")
        .select(col("p"),
          (expr(s"(15 * ${Graph.PrScale}) div (100 * n_nodes)") +
            expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")).as("r"))
      ranks = if (k % 2 == 0 || k == Graph.PrIters) Scale.materialize(next) else next
    }
    time("final topk") {
      val out = Scale.topKPerGroup(ranks, Seq.empty, Seq(col("r").desc, col("p")),
        k = Graph.PrTopK, saltSrc = col("p"))
      out.select(xxhash64(out.columns.map(col): _*).as("h")).agg(bit_xor(col("h"))).collect()
    }
    spark.stop()
  }
}
