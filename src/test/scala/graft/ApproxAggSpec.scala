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
  test("count_min_sketch estimates bound true frequencies (heavy hitters)") {
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = 0.01
    val sketchBin = ev.agg(
      count_min_sketch(col("event_type"), lit(eps), lit(0.01), lit(42)).as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBin))
    for ((k, v) <- exact) {
      val est = sketch.estimateCount(k)
      assert(est >= v, s"CMS underestimated $k: $est < $v")
      assert(est <= v + (eps * n).toLong, s"CMS overshot bound for $k: $est > $v + ${eps * n}")
    }
  }
}
