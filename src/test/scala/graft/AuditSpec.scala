package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Audit

/** Brute-force (driver-side) verification of the audit family at sf0.001,
  * plus plan pins: the statistics are recomputed from raw collected rows
  * with BigInt arithmetic — the same integer algebra both engines state —
  * so a pass here means the distributed plan and the definition agree,
  * independent of the DuckDB oracle.
  */
class AuditSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def centsOf(x: Double): Long =
    (BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("orders_benford equals a driver-side first-digit fold") {
    val cents = Tables.orders(spark, sf).select(col("o_totalprice"))
      .collect().map(r => centsOf(r.getDouble(0))).filter(_ > 0)
    val byDigit = cents.groupBy(_.toString.head.asDigit).view.mapValues(_.size.toLong).toMap
    val total = cents.length.toLong
    val got = Audit.ordersBenford(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSet == byDigit.keySet)
    got.foreach { case (d, n, share, bf, excess) =>
      assert(n == byDigit(d))
      assert(share == (BigInt(n) * 1000000 / total).toLong)
      assert(bf == Audit.BenfordPpm.toMap.apply(d))
      assert(excess == share - bf)
    }
    // uniform synthetic prices are NOT Benford — the audit must say so
    assert(got.exists { case (_, _, _, _, excess) => math.abs(excess) > 10000 })
  }

  test("orders_chisq contributions match BigInt (N·O - R·C)²·1e6/(N·R·C)") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val o = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.length.toLong
    val got = Audit.ordersChisqPriorityStatus(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    o.foreach { case (cell @ (p, st), cnt) =>
      val (gc, gr, gcl, contrib) = got(cell)
      assert((gc, gr, gcl) == (cnt, rt(p), ct(st)))
      val a = BigInt(n) * cnt - BigInt(rt(p)) * ct(st)
      assert(contrib == (a * a * 1000000 / (BigInt(n) * rt(p) * ct(st))).toLong)
    }
    // the _all row carries N marginals and the floor-summed statistic
    val (an, ar, ac, atot) = got(("_all", "_all"))
    assert((an, ar, ac) == (n, n, n))
    assert(atot == o.map { case ((p, st), cnt) =>
      val a = BigInt(n) * cnt - BigInt(rt(p)) * ct(st)
      (a * a * 1000000 / (BigInt(n) * rt(p) * ct(st))).toLong
    }.sum)
  }

  test("events_dedup_window equals a brute per-key gap scan") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byType = ev.groupBy(_._2)
    val got = Audit.eventsDedupWindow(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))).toMap
    byType.foreach { case (t, rows) =>
      val gaps = rows.groupBy(_._1).toSeq.flatMap { case (user, keyRows) =>
        val sorted = keyRows.map(r => (r._3, r._4)).sorted.toSeq
        sorted.zip(sorted.drop(1)).map { case ((a, _), (b, _)) => (b - a, user) }
      }
      val rapid = gaps.filter(_._1 <= Audit.RapidRepeatUs)
      val (n, nr, ppm, mg, nu) = got(t)
      assert(n == rows.length)
      assert(nr == rapid.size)
      assert(ppm == (BigInt(rapid.size) * 1000000 / rows.length).toLong)
      assert(mg == (if (rapid.isEmpty) -1L else rapid.map(_._1).min))
      assert(nu == rapid.map(_._2).toSet.size)
    }
    // threshold is calibrated to be non-vacuous on the test corpus
    assert(got.values.map(_._2).sum > 0)
  }

  test("events_type_affinity equals brute set overlap with exact ppm") {
    val ut = Tables.events(spark, sf).select(col("user_id"), col("event_type"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val aud = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val nUsers = ut.map(_._1).toSet.size.toLong
    val got = Audit.eventsTypeAffinity(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val types = aud.keys.toSeq.sorted
    for { i <- types.indices; j <- i + 1 until types.size } {
      val (a, b) = (types(i), types(j))
      val co = (aud(a) & aud(b)).size.toLong
      if (co > 0) {
        val (na, nb, nc, jac, lift) = got((a, b))
        assert((na, nb, nc) == (aud(a).size.toLong, aud(b).size.toLong, co))
        assert(jac == (BigInt(co) * 1000000 / (na + nb - co)).toLong)
        assert(lift == (BigInt(co) * nUsers * 1000000 / (BigInt(na) * nb)).toLong)
      } else assert(!got.contains((a, b)))
    }
  }

  test("events_fano_dispersion equals BigInt grid moments") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1) / 3600000000L))
    val hmn = ev.map(_._2).min; val hmx = ev.map(_._2).max
    val t = hmx - hmn + 1
    val got = Audit.eventsFanoDispersion(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    ev.groupBy(_._1).foreach { case (ty, rows) =>
      val counts = rows.groupBy(_._2).values.map(_.size.toLong)
      val s = counts.sum; val ss = counts.map(c => BigInt(c) * c).sum
      val fano = ((BigInt(t) * ss - BigInt(s) * s) * 1000000 / (BigInt(t) * s)).toLong
      assert(got(ty) == ((t, counts.size.toLong, s, fano)))
    }
  }

  test("plan pins: no cartesian beyond 1-row scalars; bounded-frame windows only") {
    val aff = Audit.eventsTypeAffinity(spark, sf).queryExecution.executedPlan.toString
    assert(!aff.contains("CartesianProduct"), aff)
    val chisq = Audit.ordersChisqPriorityStatus(spark, sf).queryExecution.executedPlan.toString
    assert(!chisq.contains("CartesianProduct"), chisq)
    val benford = Audit.ordersBenford(spark, sf).queryExecution.executedPlan.toString
    assert(!benford.contains("CartesianProduct"), benford)
  }

  test("events_user_diversity equals a BigInt Gini-Simpson fold") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val n = BigInt(rows.size)
      val ss = rows.groupBy(_._2).values.map(g => BigInt(g.size) * g.size).sum
      val gs = (n * n - ss) * 1000000 / (n * n)
      (gs / 10000, rows.size.toLong)
    }
    val want = perUser.groupBy(_._1).map { case (b, rows) =>
      (b.toLong, rows.size.toLong, rows.map(_._2).sum,
        (BigInt(rows.map(_._2).sum) / rows.size).toLong)
    }.toSet
    val got = Audit.eventsUserDiversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(want.size >= 2, "diversity buckets degenerate")
  }
}
