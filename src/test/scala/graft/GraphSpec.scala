package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** The distributed fixed-point PageRank against an in-memory reference of
  * the same integer algorithm — every division truncates identically, so
  * the comparison is EXACT equality of the top-k (part, rank) pairs, not
  * a tolerance check.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("distributed fixed-point pagerank equals the in-memory reference exactly") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct).toList
    val edges: Set[(Long, Long)] =
      byOrder.flatMap(ps => for (a <- ps; b <- ps if a != b) yield (a, b)).toSet
    val nodes = li.map(_._2).distinct.sorted
    val n = nodes.length
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(p => p -> Graph.PrScale / n).toMap
    for (_ <- 1 to Graph.PrIters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s0, d0) <- edges) contrib(d0) += r(s0) / deg(s0)
      r = nodes.map(p =>
        p -> (15L * Graph.PrScale / (100L * n) + 85L * contrib(p) / 100L)).toMap
    }
    val expTop = nodes.map(p => (p, r(p)))
      .sortBy { case (p, rv) => (-rv, p) }.take(Graph.PrTopK)
    val got = Graph.partPagerank(spark, sf).orderBy(col("rank"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq === expTop.toSeq)
  }
}
