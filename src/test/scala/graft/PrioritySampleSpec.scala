package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Priority sampling (Duffield-Lund-Thorup): the query's integer-rewritten
  * estimator must equal the textbook Σ max(w, τ) over the driver-recomputed
  * sample, degenerate exactly on groups ≤ k, and keep its subset-sum error
  * inside a practical envelope on the real corpus.
  */
class PrioritySampleSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val rows = Sampling.samplePriority(spark, sf).collect()
    .map(r => r.getString(0) -> r).toMap

  test("estimator equals the textbook HT form over a driver-recomputed sample") {
    val space = math.pow(2.0, 60)
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"),
        graft.functions.PortableHash.hexH(concat(lit("pri:"), col("doc_id"))).as("h"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("h")))
      .groupBy(_._1)
    for ((src, ds) <- docs) {
      val byQ = ds.map { case (_, id, w, h) =>
        (id, w, (w.toDouble * space) / (h + 1).toDouble)
      }.sortBy { case (id, _, q) => (-q, id) }
      val tau = if (byQ.length > Sampling.PriK) byQ(Sampling.PriK)._3 else 0.0
      val est = byQ.take(Sampling.PriK)
        .map { case (_, w, _) => math.max(w.toDouble, tau) }.sum
      val got = rows(src).getAs[Double]("est_chars")
      // query floors at 2 decimals; the driver sum is FP-order-sensitive, so
      // allow an ulp-scale slack on top of the floor granularity
      assert(math.abs(got - est) <= 0.011 + 1e-9 * est, s"$src: got=$got est=$est")
      assert(rows(src).getAs[Double]("tau_r") === math.floor(tau * 1e4) / 1e4, src)
    }
  }

  test("groups at or below k degenerate to the exact total with tau = 0") {
    val dir = java.nio.file.Files.createTempDirectory("pri_small").toString
    Tables.documents(spark, sf).filter(col("doc_id") % 25 < 5)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val small = Sampling.samplePriority(spark, dir).collect()
    assert(small.nonEmpty)
    for (r <- small) {
      assert(r.getAs[Long]("n_docs") <= Sampling.PriK, r.getString(0))
      assert(r.getAs[Double]("tau_r") === 0.0, r.getString(0))
      assert(r.getAs[Double]("est_chars")
        === r.getAs[Long]("exact_chars").toDouble, r.getString(0))
      assert(r.getAs[Double]("err_ppm") === 0.0, r.getString(0))
    }
  }

  test("subset-sum error stays inside the k=16 practical envelope") {
    // per-source error can reach ~σ·√(n/k); pin what the deterministic
    // corpus shows with headroom (sf0.001 max ≈ 59%) + a mean bound
    assert(rows.nonEmpty)
    val errs = rows.values.map(_.getAs[Double]("err_ppm")).toSeq
    assert(errs.max <= 750000.0, s"max err ${errs.max} ppm")
    assert(errs.sum / errs.size <= 250000.0, s"mean err ${errs.sum / errs.size} ppm")
  }
}
