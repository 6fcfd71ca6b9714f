package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Poisson-bootstrap behavioral checks (the oracle pins exactness; this
  * pins statistical sanity): replicate weights average ~1 per replicate,
  * and the error bar shrinks with sample size.
  */
class StatsBootstrapSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("error bars behave: largest stratum tightest, all positive") {
    val rows = Sampling.statsBootstrap(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (l, _, std) => assert(std > 0.0, s"$l: std must be positive") }
    val biggest = rows.maxBy(_._2)
    assert(rows.forall { case (_, n, std) => n == biggest._2 || std >= biggest._3 * 0.8 },
      s"largest stratum ${biggest._1} should have (near-)tightest error bar: ${rows.mkString(", ")}")
    info(rows.map { case (l, n, s) => f"$l n=$n std=$s%.4f" }.mkString("  "))
  }
}
