package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Econ

/** Driver-side brute-force verification of the mart-economics family at
  * sf0.001 — BigInt recomputation of every statistic from raw rows.
  */
class EconSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("events_ab_power equals the BigInt sizing formula") {
    val ev = Tables.events(spark, sf).select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), cents(r.getDouble(1))))
    val got = Econ.eventsAbPower(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val n = rows.length.toLong
      val sSum = rows.map(r => BigInt(r._2)).sum
      val q = rows.map(r => BigInt(r._2) * r._2).sum
      val nReq = (BigInt(Econ.Z2Ppm) * 800 * (n * q - sSum * sSum) * n /
        ((n - 1) * sSum * sSum * 1000000)).toLong
      assert(got(t) == ((n, sSum.toLong, q.toLong, nReq)), t)
    }
    // the sizing is non-degenerate: every type needs a real sample
    assert(got.values.forall(_._4 > 0))
  }

  test("cohort_ltv_curve equals brute cohort accumulation") {
    val ord = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), cents(r.getDouble(2))))
    val first = ord.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = first.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = ord.groupBy(o => (first(o._1), o._2 - first(o._1)))
    val got = Econ.cohortLtvCurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == cells.keySet)
    cells.foreach { case (key @ (cy, age), rows) =>
      val rev = rows.map(r => BigInt(r._3)).sum
      val cum = cells.filter { case ((c, a), _) => c == cy && a <= age }
        .values.flatten.map(r => BigInt(r._3)).sum
      val (nc, na, gr, gc, ltv) = got(key)
      assert(nc == sizes(cy), key)
      assert(na == rows.map(_._1).distinct.length.toLong, key)
      assert(gr == rev.toLong, key)
      assert(gc == cum.toLong, key)
      assert(ltv == (cum / sizes(cy)).toLong, key)
    }
  }

  test("supplier_hhi equals brute share-of-squares") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), cents(r.getDouble(2))))
    val brand = Tables.part(spark, sf).select(col("p_partkey"), col("p_brand"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = Econ.supplierHhi(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    li.groupBy(r => brand(r._1)).foreach { case (b, rows) =>
      val bySupp = rows.groupBy(_._2).view
        .mapValues(_.map(r => BigInt(r._3)).sum).toMap
      val tot = bySupp.values.sum
      val hhi = (bySupp.values.map(v => v * v).sum * 1000000 / (tot * tot)).toLong
      val top = (bySupp.values.max * 1000000 / tot).toLong
      assert(got(b) == ((bySupp.size.toLong, tot.toLong, hhi, top)), b)
    }
  }

  test("part_price_index equals brute per-part floor cross terms") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        unix_date(to_date(col("l_shipdate"))))
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong,
        cents(r.getDouble(2)), r.getInt(3).toLong))
    val brand = Tables.part(spark, sf).select(col("p_partkey"), col("p_brand"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val mid = (li.map(_._4).min + li.map(_._4).max) / 2
    val perPart = li.groupBy(_._1).view.mapValues { rows =>
      val (h1, h2) = rows.partition(_._4 <= mid)
      (h1.map(r => BigInt(r._3)).sum, h1.map(_._2).sum,
        h2.map(r => BigInt(r._3)).sum, h2.map(_._2).sum)
    }.toMap.filter { case (_, (_, q0, _, q1)) => q0 > 0 && q1 > 0 }
    val got = Econ.partPriceIndex(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    perPart.keys.groupBy(brand).foreach { case (b, parts) =>
      val ms = parts.toSeq.map(perPart)
      val base = ms.map(_._1).sum; val cur = ms.map(_._3).sum
      val ln = ms.map { case (_, q0, ep1, q1) => ep1 * q0 / q1 }.sum
      val pd = ms.map { case (ep0, q0, _, q1) => ep0 * q1 / q0 }.sum
      val las = (ln * 1000000 / base).toLong
      val pas = (cur * 1000000 / pd).toLong
      assert(got(b) == ((parts.size.toLong, base.toLong, cur.toLong, las, pas)), b)
    }
  }

  test("plan pins: no cartesian products beyond 1-row broadcast scalars") {
    Seq(Econ.eventsAbPower(spark, sf), Econ.cohortLtvCurve(spark, sf),
      Econ.supplierHhi(spark, sf), Econ.partPriceIndex(spark, sf),
      Econ.partAbcXyz(spark, sf),
      graft.operators.Lifecycle.eventsConversionLatency(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }

  test("part_xyz_class equals brute weekly CV^2 over active weeks") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        unix_date(to_date(col("l_shipdate"))))
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong, r.getInt(2) / 7))
    val got = operators.Econ.partXyzClass(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    val want = li.groupBy(_._1).flatMap { case (pk, rows) =>
      val weekly = rows.groupBy(_._3).values.map(_.map(_._2).sum.toLong).toSeq
      if (weekly.size <= 1) None
      else {
        val n = weekly.size.toLong
        val qt = weekly.sum
        val qq = weekly.map(q => BigInt(q) * q).sum
        val cv2 = ((n * qq - BigInt(qt) * qt) * 1000000 / (BigInt(qt) * qt)).toLong
        val cls = if (cv2 <= operators.Econ.XyzXMaxPpm) "X"
        else if (cv2 <= operators.Econ.XyzYMaxPpm) "Y" else "Z"
        Some(pk -> ((n, qt, cv2, cls)))
      }
    }
    assert(got == want)
    // the active-week form is non-degenerate: at least two classes occur
    assert(want.values.map(_._4).toSet.size >= 2)
  }

  test("orders_bullwhip equals brute grid moments") {
    val o = Tables.orders(spark, sf)
      .select(unix_date(to_date(col("o_orderdate"))), col("o_totalprice"))
      .collect().map(r => (r.getInt(0).toLong, cents(r.getDouble(1))))
    val l = Tables.lineitem(spark, sf)
      .select(unix_date(to_date(col("l_shipdate"))), col("l_extendedprice"))
      .collect().map(r => (r.getInt(0).toLong, cents(r.getDouble(1))))
    def mom(rows: Array[(Long, Long)]): (Long, BigInt, BigInt) = {
      val daily = rows.groupBy(_._1).view.mapValues(_.map(r => BigInt(r._2)).sum)
      val t = rows.map(_._1).max - rows.map(_._1).min + 1
      (t, daily.values.sum, daily.values.map(v => v * v).sum)
    }
    val (to, so, soo) = mom(o); val (ts, ss, sss) = mom(l)
    val vo = (to * soo - so * so) / (BigInt(to) * to)
    val vs = (ts * sss - ss * ss) / (BigInt(ts) * ts)
    val want = (vo * 1000000 / vs).toLong
    val row = operators.Econ.ordersBullwhip(spark, sf).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((to, ts, want)))
  }

  test("part_return_shrinkage equals brute MoM beta-binomial") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val per = li.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.count(_._2 == "R").toLong) }.toMap
    val raw = per.view.mapValues { case (n, x) =>
      (n, x, (BigInt(x) * 1000000 / n).toLong) }.toMap
    val np = raw.size.toLong
    val tn = raw.values.map(_._1).sum; val tx = raw.values.map(_._2).sum
    val sr = raw.values.map(r => BigInt(r._3)).sum
    val srr = raw.values.map(r => BigInt(r._3) * r._3).sum
    val m = (BigInt(tx) * 1000000 / tn).toLong
    val vObs = ((np * srr - sr * sr) / (np * (np - 1))).toLong
    val nbar = tn / np
    val vTrue = math.max(vObs - m * (1000000 - m) / nbar, 1L)
    val kappa = math.max(m * (1000000 - m) / vTrue - 1, 0L)
    val got = operators.Econ.partReturnShrinkage(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == raw.keySet)
    raw.foreach { case (pk, (n, x, rp)) =>
      val shrunk = ((BigInt(x) * 1000000 + BigInt(kappa) * m) / (n + kappa)).toLong
      assert(got(pk) == ((n, x, rp, shrunk, kappa, m)), pk)
    }
    // this corpus: spread is binomial noise, so the prior dominates
    assert(kappa > nbar)
  }

  test("part_abc_xyz equals brute classed rollup") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        unix_date(to_date(col("l_shipdate"))))
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong,
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        r.getInt(3) / 7))
    val rev = li.groupBy(_._1).view.mapValues(rs =>
      (BigDecimal(rs.map(_._3).sum.toString)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).toMap
    val total = rev.values.map(BigInt(_)).sum
    val byVal = rev.values.groupBy(identity).view
      .mapValues(vs => BigInt(vs.head) * vs.size).toMap
    def abcOf(r: Long): String = {
      val cumge = byVal.filter(_._1 >= r).values.sum
      if (cumge * 5 <= total * 4) "A"
      else if (cumge * 20 <= total * 19) "B" else "C"
    }
    val xyz = li.groupBy(_._1).flatMap { case (pk, rows) =>
      val weekly = rows.groupBy(_._4).values.map(_.map(_._2).sum.toLong).toSeq
      if (weekly.size <= 1) None
      else {
        val n = weekly.size.toLong; val qt = weekly.sum
        val qq = weekly.map(q => BigInt(q) * q).sum
        val cv2 = ((n * qq - BigInt(qt) * qt) * 1000000 / (BigInt(qt) * qt)).toLong
        Some(pk -> (if (cv2 <= Econ.XyzXMaxPpm) "X"
        else if (cv2 <= Econ.XyzYMaxPpm) "Y" else "Z"))
      }
    }
    val want = xyz.toSeq.map { case (pk, x) => ((abcOf(rev(pk)), x), rev(pk)) }
      .groupBy(_._1).view.mapValues(cs =>
        (cs.size.toLong, cs.map(c => BigInt(c._2)).sum.toLong)).toMap
    val got = Econ.partAbcXyz(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    assert(want.size >= 4, "planning grid degenerate")
  }

  test("supplier_scorecard equals brute per-supplier rollup") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1)), r.getString(2)))
    val nation = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val per = li.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.map(r => BigInt(r._2)).sum,
        rs.count(_._3 == "R").toLong) }.toMap
    val nat = per.groupBy { case (sk, _) => nation(sk) }.view
      .mapValues(_.values.map(_._2).sum).toMap
    val got = operators.Econ.supplierScorecard(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == per.keySet)
    per.foreach { case (sk, (n, rev, ret)) =>
      val nk = nation(sk)
      assert(got(sk) == ((nk, n, rev.toLong, ret,
        (BigInt(ret) * 1000000 / n).toLong,
        (rev * 1000000 / nat(nk)).toLong)), sk)
    }
  }

  test("part_price_dispersion equals brute unit-price spreads") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1)), r.getDouble(2).toLong))
    val got = Econ.partPriceDispersion(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val byPart = li.groupBy(_._1)
    assert(got.keySet == byPart.keySet)
    for ((pk, rows) <- byPart) {
      val units = rows.map(r => r._2 / r._3)
      val (mn, mx) = (units.min, units.max)
      val mean = units.sum / units.length
      val spread = (BigInt(mx - mn) * 1000000 / mn).toLong
      assert(got(pk) == ((rows.length.toLong, mn, mx, mean, spread)), pk)
    }
    // the corpus has real dispersion to audit (identical unit prices
    // everywhere would make the operator vacuous)
    assert(got.values.exists(_._5 > 0))
  }
}
