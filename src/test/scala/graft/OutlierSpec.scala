package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** embed_outliers vs a driver-side brute-force recomputation over the
  * trained centroids: same argmax-cell assignment (dot/sn, ties low),
  * same sequential-fold cosine, same (cos asc, vec_id) global order.
  */
class OutlierSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("embed_outliers matches brute-force quantization-error ranking") {
    val out = Similarity.embedOutliers(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.length == Similarity.OutlierK)
    val cents = Similarity.centroidCache.get(sf)
    assert(cents != null, "centroids trained by the query run")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val sn = cents.map(c => math.sqrt(dot(c, c)))
    val corpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
    val scored = corpus.map { case (id, v) =>
      var best = 0; var bestS = Double.NegativeInfinity
      for (k <- cents.indices) {
        val sc = dot(v, cents(k)) / sn(k)
        if (sc > bestS) { bestS = sc; best = k }
      }
      val cos = dot(v, cents(best)) / math.sqrt(dot(v, v) * dot(cents(best), cents(best)))
      (id, best, cos)
    }
    val expect = scored.sortBy { case (id, _, cos) => (cos, id) }
      .take(Similarity.OutlierK).zipWithIndex
      .map { case ((id, cell, cos), i) =>
        (i + 1, id, cell, math.floor((1.0 - cos) * 1e6) / 1e6) }
    assert(out.toSeq == expect.toSeq)
    // outlier scores are nonnegative and non-increasing down the ranking is
    // false by construction (qerr DEscending as rank ascends) — pin order
    assert(out.forall(_._4 >= 0.0))
    assert(out.sliding(2).forall { case Array(a, b) => a._4 >= b._4; case _ => true })
  }

  private def dotp(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
  }

  test("embed_cluster_purity matches brute-force contingency + the _all row") {
    val out = Similarity.embedClusterPurity(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val cents = Similarity.centroidCache.get(sf)
    val sn = cents.map(c => math.sqrt(dotp(c, c)))
    val rows = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val assigned = rows.map { case (_, v, label) =>
      var best = 0; var bestS = Double.NegativeInfinity
      for (k <- cents.indices) {
        val sc = dotp(v, cents(k)) / sn(k)
        if (sc > bestS) { bestS = sc; best = k }
      }
      (best, label)
    }
    var sumTop = 0L; var sumN = 0L
    for ((cell, members) <- assigned.groupBy(_._1)) {
      val byLabel = members.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (topLabel, topCnt) = byLabel.toSeq.sortBy { case (l, c) => (-c, l) }.head
      val n = members.length.toLong
      sumTop += topCnt; sumN += n
      assert(out(cell) ==
        ((n, topLabel, topCnt, math.floor(topCnt.toDouble / n * 1e4) / 1e4)),
        s"cell $cell")
    }
    assert(out(-1) ==
      ((sumN, -1, sumTop, math.floor(sumTop.toDouble / sumN * 1e4) / 1e4)))
  }

  test("embed_kcenter matches the brute-force greedy farthest-point traversal") {
    val out = Similarity.embedKcenter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val rows = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double =
      dotp(a, b) / math.sqrt(dotp(a, a) * dotp(b, b))
    var centers = Vector(rows.head)
    var expect = Vector((1, rows.head._1, 2.0))
    for (k <- 2 to Similarity.KcK) {
      val chosen = centers.map(_._1).toSet
      val cand = rows.filterNot(r => chosen(r._1))
        .map { case (id, v) => (id, v, centers.map(c => cos(v, c._2)).max) }
      val next = cand.minBy { case (id, _, s) => (s, id) }
      centers :+= ((next._1, next._2))
      expect :+= ((k, next._1, math.floor((1.0 - next._3) * 1e6) / 1e6))
    }
    assert(out.toSeq == expect)
    // greedy invariant: distances-to-set are non-increasing after the seed
    val dists = out.toSeq.drop(1).map(_._3)
    assert(dists.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }
}
