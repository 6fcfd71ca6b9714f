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

  test("weighted label propagation equals the in-memory reference exactly") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct).toList
    val weights = byOrder
      .flatMap(ps => for (a <- ps; b <- ps if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= Graph.LpMinWeight).toMap
    val nodes = li.map(_._2).distinct.sorted
    val inEdges = weights.toSeq.groupBy(_._1._2) // dst -> ((src,dst) -> w)
    var lbl = nodes.map(p => p -> p).toMap
    for (_ <- 1 to Graph.LpIters) {
      val next = nodes.map { p =>
        val votes = inEdges.getOrElse(p, Seq.empty)
          .groupBy { case ((s0, _), _) => lbl(s0) }
          .view.mapValues(_.map(_._2).sum).toSeq
        p -> (if (votes.isEmpty) lbl(p)
              else votes.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
      lbl = next
    }
    val sizes = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = nodes.map(p => (p, lbl(p), sizes(lbl(p)))).toSet
    val got = Graph.partCommunities(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === exp)
    // non-degenerate: the weighted graph keeps real structure (at the tiny
    // spec SF the 200-part alphabet stays dense, so only the community
    // count is scale-stable; the sf0.01 gate shows 555 communities, max 51)
    assert(sizes.size >= 10, s"collapsed to ${sizes.size} communities")
  }

  test("triangle counts equal a brute-force enumeration of the weighted graph") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted.toList)
      .filter(_.size <= graft.operators.Analytics.MaxBasket)
    val w = new scala.collection.mutable.HashMap[(Long, Long), Long]()
    for (b <- byOrder; i <- b.indices; j <- i + 1 until b.size) {
      val e = (b(i), b(j)); w(e) = w.getOrElse(e, 0L) + 1L
    }
    // NB: Map.collect with a tuple-valued function would rebuild a Map and
    // collapse edges by their first endpoint — filter + keys instead
    val edges = w.filter(_._2 >= Graph.LpMinWeight).keys.toSet
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    var total = 0L
    val per = new scala.collection.mutable.HashMap[Long, Long]()
    for (a <- nodes; b <- adj(a) if b > a; c <- adj(a) if c > b
         if edges.contains((math.min(b, c), math.max(b, c)))) {
      total += 1
      for (p <- Seq(a, b, c)) per(p) = per.getOrElse(p, 0L) + 1L
    }
    val expect = per.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(Graph.TriTopK).zipWithIndex
      .map { case ((p, n), i) => (i + 1, p, n, total) }
    val out = Graph.partTriangles(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(out == expect)
    assert(total > 0, "graph has no triangles at this SF — statistic vacuous")
  }
  test("part_kcore equals a brute peel run to its fixpoint") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = li.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted.toList)
      .filter(_.size <= graft.operators.Analytics.MaxBasket)
    val w = new scala.collection.mutable.HashMap[(Long, Long), Long]()
    for (b <- byOrder; i <- b.indices; j <- i + 1 until b.size) {
      val e = (b(i), b(j)); w(e) = w.getOrElse(e, 0L) + 1L
    }
    val edges = w.filter(_._2 >= Graph.LpMinWeight).keys.toSet
    // brute peel until NOTHING changes (the true k-core), counting rounds
    var alive = edges.flatMap(e => Seq(e._1, e._2))
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = new scala.collection.mutable.HashMap[Long, Long]()
      for ((a, b) <- edges if alive(a) && alive(b); p0 <- Seq(a, b))
        deg(p0) = deg.getOrElse(p0, 0L) + 1L
      val next = alive.filter(p0 => deg.getOrElse(p0, 0L) >= Graph.KcK)
      changed = next != alive
      if (changed) rounds += 1
      alive = next
    }
    assert(rounds <= Graph.KcIters,
      s"fixed horizon ${Graph.KcIters} must reach the fixpoint (needs $rounds)")
    val deg = new scala.collection.mutable.HashMap[Long, Long]()
    for ((a, b) <- edges if alive(a) && alive(b); p0 <- Seq(a, b))
      deg(p0) = deg.getOrElse(p0, 0L) + 1L
    val expect = deg.toMap
    val out = Graph.partKcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expect)
    assert(out.nonEmpty, "k-core empty at this SF - statistic vacuous")
    assert(out.values.forall(_ >= Graph.KcK))
  }

  test("events_markov_stationary equals brute ppm power iteration") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
      s.zip(s.drop(1))
    }.toSeq
    val rTot = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val states = rTot.keySet
    val tm = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case ((i, j), _) => states(i) && states(j) }
    val targets = tm.keys.map(_._2).toSet
    var pi: Map[String, Long] = states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to Graph.MarkovIters)
      pi = targets.map { j =>
        j -> states.toSeq.flatMap(i =>
          tm.get((i, j)).map(cc => pi.getOrElse(i, 0L) * cc / rTot(i))).sum
      }.toMap
    val got = Graph.eventsMarkovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == targets)
    targets.foreach { t =>
      assert(got(t) == ((pi(t), rTot(t))), t)
    }
    // mass is conserved up to per-term floors
    assert(math.abs(pi.values.sum - 1000000L) < 1000)
  }
}
