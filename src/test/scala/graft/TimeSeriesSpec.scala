package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** Driver-side BigInt recomputation of the time-series family at sf0.001.
  * BigInt `/` truncates toward zero — the SAME semantics Spark `div` and
  * DuckDB `//` were measured to share (including on negative ACF
  * covariances and downtrend slopes), so the brute statistics here state
  * the exact engine contract.
  */
class TimeSeriesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  /** (day-index from series start, cents) sorted by day. */
  private lazy val daily: Vector[(Long, BigInt)] = {
    val rows = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, cents(r.getDouble(1))))
    val byDay = rows.groupBy(_._1).view
      .mapValues(v => BigInt(v.map(_._2).sum)).toVector.sortBy(_._1)
    val d0 = byDay.head._1
    byDay.map { case (d, c) =>
      (d.toEpochDay - d0.toEpochDay, c)
    }
  }

  test("daily_revenue_acf equals the brute centered estimator") {
    val n = daily.length
    val mu = daily.map(_._2).sum / n
    val dev = daily.map { case (i, c) => (i, c - mu) }.toMap
    val den = dev.values.map(d => d * d).sum
    val got = TimeSeries.dailyRevenueAcf(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == (1L to TimeSeries.MaxLag).toSet)
    for (lag <- 1L to TimeSeries.MaxLag) {
      val pairs = dev.keys.filter(i => dev.contains(i + lag)).toVector
      val num = pairs.map(i => dev(i) * dev(i + lag)).sum
      val (nPairs, ppm) = got(lag)
      assert(nPairs == pairs.length.toLong, s"lag $lag")
      assert(ppm == (num * 1000000 / den).toLong, s"lag $lag")
      assert(math.abs(ppm) <= 1000000L, s"lag $lag bounded")
    }
  }

  test("daily_revenue_theilsen equals the brute median pairwise slope") {
    val slopes = for {
      j <- daily.indices; i <- 0 until j
    } yield {
      val (di, ci) = daily(i); val (dj, cj) = daily(j)
      ((cj - ci) * 1000000 / BigInt(dj - di), di, dj)
    }
    val sorted = slopes.sortBy(t => (t._1, t._2, t._3))
    val m = sorted.length
    val median = sorted((m + 1) / 2 - 1)._1
    val row = TimeSeries.dailyRevenueTheilsen(spark, sf).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == daily.length.toLong)
    assert(row(0).getLong(1) == m.toLong)
    assert(row(0).getLong(2) == median.toLong)
  }

  test("daily_revenue_dow_index equals brute weekly indices") {
    val sunday = LocalDate.parse(TimeSeries.EpochSunday).toEpochDay
    val d0 = Tables.orders(spark, sf)
      .agg(min(to_date(col("o_orderdate")))).collect()(0)
      .getDate(0).toLocalDate.toEpochDay
    val byDow = daily.groupBy { case (i, _) => (d0 + i - sunday) % 7 }
    val nTot = daily.length
    val tot = daily.map(_._2).sum
    val got = TimeSeries.dailyRevenueDowIndex(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == byDow.keySet)
    for ((dow, rows) <- byDow) {
      val sum = rows.map(_._2).sum
      val nd = rows.length
      val idx = (sum * nTot * 1000000 / (tot * nd)).toLong
      assert(got(dow) == ((nd.toLong, sum.toLong, (sum / nd).toLong, idx)),
        s"dow $dow")
    }
    // indices average to ~1e6 by construction — a gross mis-scale fails
    val mean = got.values.map(_._4).sum / got.size
    assert(math.abs(mean - 1000000L) < 200000L)
  }
}
