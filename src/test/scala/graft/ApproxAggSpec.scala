package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sketch aggregates for the interactive-dashboard role: HLL distinct
  * counts and approximate percentiles must land within their documented
  * error bounds of the exact answers (sketches aren't oracle-comparable
  * across engines, so the bound IS the contract).
  */
class ApproxAggSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, sf)
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile within 5% relative of exact percentile") {
    val o = Tables.orders(spark, sf)
    val r = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50")).collect()(0)
    val (e, a) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e <= 0.05, s"exact=$e approx=$a")
  }
}
