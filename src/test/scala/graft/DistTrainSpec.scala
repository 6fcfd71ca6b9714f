package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The distributed Lloyd trainer must be (1) BIT-IDENTICAL to a driver-side
  * reference of the same recipe — the fixed-point accumulators make integer
  * sums order-independent, so no tolerance is needed or used — and
  * (2) invariant to partitioning, the property that makes its centroids
  * safe to embed in generated oracles at any cluster layout.
  */
class DistTrainSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private val cells = 8
  private val iters = 3

  private def corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  private def norm(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = 1.0 / math.sqrt(n); v.map(_ * inv)
  }

  /** Plain-Scala reference: the exact recipe (hash-order seeding, scaled-dot
    * argmax with lowest-cell ties, LloydFp fixed-point sums, renormalize,
    * empty cells keep their seed). Spark is used only for the deterministic
    * hash order and the vectors themselves.
    */
  private def reference(): Array[Array[Double]] = {
    val rows = corpus.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    val xs = rows.map(norm)
    var cents = xs.take(cells)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    for (_ <- 1 to iters) {
      val sn = cents.map(c => math.sqrt(dot(c, c)))
      val sums = Array.fill(cents.length)(new Array[Long](xs(0).length))
      val counts = new Array[Long](cents.length)
      xs.foreach { x =>
        var best = 0; var bs = dot(x, cents(0)) / sn(0); var k = 1
        while (k < cents.length) {
          val s = dot(x, cents(k)) / sn(k)
          if (s > bs) { bs = s; best = k } // strict: ties keep the lowest cell
          k += 1
        }
        val acc = sums(best); var i = 0
        while (i < x.length) {
          acc(i) += math.floor(x(i) * Similarity.LloydFp + 0.5).toLong; i += 1
        }
        counts(best) += 1
      }
      cents = cents.indices.map { k =>
        if (counts(k) == 0) cents(k)
        else norm(sums(k).map(_.toDouble / Similarity.LloydFp.toDouble))
      }.toArray
    }
    cents
  }

  test("distributed Lloyd = driver reference bit-for-bit, at any partitioning") {
    val want = reference()
    val got3 = Similarity.trainCentroidsDistributed(corpus.repartition(3), cells, iters)
    val got13 = Similarity.trainCentroidsDistributed(corpus.repartition(13), cells, iters)
    assert(got3.length === want.length)
    for (k <- want.indices) {
      assert(got3(k).toSeq === want(k).toSeq, s"cell $k diverged from reference")
      assert(got13(k).toSeq === got3(k).toSeq, s"cell $k not partition-invariant")
    }
  }
}
