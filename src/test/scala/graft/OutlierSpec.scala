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
}
