package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** PCA model sanity (the oracle pins projection exactness; this pins the
  * eigensolver): components orthonormal, projected variance decreasing in
  * component order and positive.
  */
class PcaSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("components are orthonormal; projected variance decreases") {
    val m = Similarity.pcaFor(spark, sf)
    assert(m.comps.length === Similarity.PcaK)
    for (i <- m.comps.indices; j <- i until m.comps.length) {
      val dot = m.comps(i).zip(m.comps(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"comp $i . comp $j = $dot")
    }
    val byComp = Similarity.embedPca(spark, sf)
      .groupBy(col("comp")).agg(variance(col("coord")).as("v"))
      .orderBy(col("comp")).collect().map(r => r.getDouble(1))
    assert(byComp.forall(_ > 0.0))
    // jacobi ordering: each component explains at least as much as the next
    // (tolerance for near-ties in the synthetic spectrum)
    byComp.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a * 1.05, s"variance not decreasing: ${byComp.mkString(", ")}")
    }
  }
}
