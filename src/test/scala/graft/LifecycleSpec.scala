package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Lifecycle, Olap}

/** Brute-force cross-checks for the lifecycle/frontier operators: each
  * optimized decomposition is re-derived driver-side from first principles
  * (pairwise dominance for the skyline, BigInt weight folds for the EWMA,
  * an explicit life table for the hazard, a full re-count for the heavy
  * changers) and compared row for row.
  */
class LifecycleSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("part_skyline equals brute pairwise dominance") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val brute = parts.filter { case (_, s0, pr0) =>
      !parts.exists { case (_, s1, pr1) =>
        s1 >= s0 && pr1 <= pr0 && (s1 > s0 || pr1 < pr0)
      }
    }.map { case (k, s0, pr0) => (k, s0, pr0) }.toSet
    val got = Olap.partSkyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("daily_revenue_ewma equals a BigInt weight fold over the daily series") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
        .cast("long").as("cents"))
      .orderBy(col("day"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val cents = daily.map(_._2)
    val expected = daily.indices.map { n =>
      val ws = (0 until Lifecycle.EwmaTerms).map { k =>
        val x = if (n - k >= 0) BigInt(cents(n - k)) else BigInt(0)
        x * BigInt(1L << (Lifecycle.EwmaTerms - 1 - k))
      }.sum
      (daily(n)._1, cents(n), (ws / BigInt(1L << Lifecycle.EwmaTerms)).toLong)
    }.toSet
    val got = Lifecycle.dailyRevenueEwma(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("ewma decays toward the level: constant series fixes near the value") {
    // closed form: a constant series c has ewma = c·(2^30 − 1)/2^30,
    // i.e. c − 1 in integer truncation for large-enough c — a sanity pin
    // that the weight/shift algebra is the intended α = 1/2 smoother.
    val c = 1000000L
    val ws = (0 until Lifecycle.EwmaTerms)
      .map(k => BigInt(c) * BigInt(1L << (Lifecycle.EwmaTerms - 1 - k))).sum
    val ewma = (ws / BigInt(1L << Lifecycle.EwmaTerms)).toLong
    assert(ewma == c - 1)
  }

  test("customer_churn_hazard equals an explicit driver-side life table") {
    val per = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .groupBy(col("o_custkey"))
      .agg(min(col("day")).as("f"), max(col("day")).as("l"))
      .collect().map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val m = per.map(_._2).max
    val custs = per.map { case (f, l) =>
      val tenure = java.time.temporal.ChronoUnit.DAYS.between(f, l)
      val churned = java.time.temporal.ChronoUnit.DAYS.between(l, m) >
        Lifecycle.ChurnHorizonDays
      ((tenure / Lifecycle.HazardBucketDays).toInt, churned)
    }
    val buckets = custs.map(_._1).distinct.sorted
    val expected = buckets.map { b =>
      val atRisk = custs.count(_._1 >= b).toLong
      val churned = custs.count(c => c._1 == b && c._2).toLong
      val cens = custs.count(c => c._1 == b && !c._2).toLong
      (b, atRisk, churned, cens, churned * 1000000L / atRisk)
    }.toSet
    val got = Lifecycle.customerChurnHazard(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // the life-table invariant: n_at_risk(b) = n_at_risk(next) + own
    // bucket's events-and-censored (the suffix sum telescopes)
    val byB = got.toSeq.sortBy(_._1)
    byB.sliding(2).foreach {
      case Seq((b0, r0, d0, c0, _), (_, r1, _, _, _)) =>
        assert(r0 == r1 + d0 + c0, s"at-risk must telescope at bucket $b0")
      case _ => ()
    }
  }

  test("customer_survival_curve equals the driver-side KM integer recurrence") {
    val lt = Lifecycle.customerChurnHazard(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    var s = 1000000L
    val expected = lt.map { case (b, n, d, c, h) =>
      s = s * (n - d) / n // truncating: all terms nonnegative
      (b, n, d, c, h, s)
    }.toSet
    val got = Lifecycle.customerSurvivalCurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // survival is monotone nonincreasing over buckets and starts ≤ 10⁶
    val sv = got.toSeq.sortBy(_._1).map(_._6)
    assert(sv.head <= 1000000L)
    sv.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "KM survival must be nonincreasing")
      case _ => ()
    }
  }

  test("events_heavy_change equals a driver-side split re-count") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val per = ev.groupBy(_._1).map { case (u, xs) =>
      val a = xs.count(_._2 < mid).toLong
      val b = xs.count(_._2 >= mid).toLong
      (u, a, b, b - a)
    }.toSeq
    val expected = per.sortBy { case (u, _, _, dl) => (-math.abs(dl), u) }
      .take(Lifecycle.HeavyChangeK).zipWithIndex
      .map { case ((u, a, b, dl), i) => (i + 1, u, a, b, dl) }.toSet
    val got = Lifecycle.eventsHeavyChange(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  // ---------------------------------------------------------------- plans

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("skyline: one bounded-frame window + a broadcast join back; no cartesian") {
    val p = plan(Olap.partSkyline(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), "size-frame join must broadcast")
    assert(p.contains("partial_min"), "per-size minima must partial-agg map-side")
  }

  test("ewma: corpus collapses map-side; the lag window is on the daily frame") {
    val p = plan(Lifecycle.dailyRevenueEwma(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_sum"), "daily cents must partial-agg map-side")
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      "all 30 lags must fuse into one window pass")
  }

  test("hazard: only the 1-row corpus-max scalar is a nested-loop join") {
    val p = plan(Lifecycle.customerChurnHazard(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("partial_min") || p.contains("partial_max"),
      "per-customer first/last must partial-agg map-side")
  }

  test("heavy change: only the 1-row bounds scalar is a nested-loop join") {
    val p = plan(Lifecycle.eventsHeavyChange(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }
  test("events_active_streaks equals a driver-side islands recompute") {
    val days = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val streaks = days.groupBy(_._1).toSeq.flatMap { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      val runs = scala.collection.mutable.ArrayBuffer.empty[(java.time.LocalDate, Long)]
      for (d <- sorted) {
        if (runs.nonEmpty &&
            runs.last._1.plusDays(runs.last._2) == d)
          runs(runs.size - 1) = (runs.last._1, runs.last._2 + 1)
        else runs += ((d, 1L))
      }
      runs.map { case (start, len) => (u, start.toString, len) }
    }
    val expected = streaks
      .sortBy { case (u, st, len) => (-len, u, st) }
      .take(Lifecycle.StreakTopK).zipWithIndex
      .map { case ((u, st, len), i) => (i + 1, u, st, len) }.toSet
    val got = Lifecycle.eventsActiveStreaks(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.exists(_._4 > 1), "no multi-day streak - statistic vacuous")
  }

  test("orders_order_gap_dist equals a driver-side gap recount") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val gaps = orders.groupBy(_._1).values.flatMap { os =>
      val sorted = os.sortBy(o => (o._2.toEpochDay, o._3)).toSeq
      sorted.sliding(2).collect {
        case Seq(a, b) => java.time.temporal.ChronoUnit.DAYS.between(a._2, b._2)
      }
    }.toSeq
    def band(g: Long): String =
      Lifecycle.GapBounds.find(g <= _).map(b => s"<=$b")
        .getOrElse(s">${Lifecycle.GapBounds.last}")
    val byBand = gaps.groupBy(band).view.mapValues(_.size.toLong).toMap
    val total = gaps.size.toLong
    val expected = byBand.map { case (b, n) =>
      (b, n, n * 1000000L / total)
    }.toSet
    val got = Lifecycle.ordersOrderGapDist(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(byBand.size >= 2, "single gap band - distribution vacuous")
  }

  test("text_heaps_law: vocab growth matches per-prefix brute distinct counts") {
    val out = graft.operators.TextQueries.textHeapsLaw(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // brute: for each level, re-tokenize the prefix corpus and count
    // distinct terms directly (the definition the factored plan avoids)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1).toSeq
    for ((lvl, nDocs, nToks, vocab) <- out) {
      val bound = if (lvl == 0) 1L else 1L << lvl
      val prefix = docs.filter(_._1 < bound)
      assert(nDocs == prefix.size.toLong, s"lvl $lvl docs")
      assert(nToks == prefix.map(_._2).map(toks(_).size.toLong).sum, s"lvl $lvl tokens")
      assert(vocab == prefix.flatMap(d => toks(d._2)).distinct.size.toLong, s"lvl $lvl vocab")
    }
    // growth must be strictly saturating in shape: vocab non-decreasing,
    // and the last level covers the whole corpus
    assert(out.last._2 == docs.length.toLong)
    assert(out.map(_._4).toSeq == out.map(_._4).sorted.toSeq)
  }
  test("events_growth_accounting equals a driver replay; identities hold") {
    val uw = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byUser = uw.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = scala.collection.mutable.HashMap
      .empty[java.time.LocalDate, Array[Long]] // new, ret, res, churn
    def acc(wk: java.time.LocalDate) =
      rows.getOrElseUpdate(wk, Array(0L, 0L, 0L, 0L))
    for ((_, wks) <- byUser) {
      for (i <- wks.indices) {
        val a = acc(wks(i))
        if (i == 0) a(0) += 1
        else if (wks(i - 1) == wks(i).minusDays(7)) a(1) += 1
        else a(2) += 1
        val next = if (i + 1 < wks.size) Some(wks(i + 1)) else None
        if (next.forall(_ != wks(i).plusDays(7))) acc(wks(i).plusDays(7))(3) += 1
      }
    }
    val expected = rows.map { case (wk, a) =>
      (wk.toString, a(0), a(1), a(2), a(3))
    }.toSet
    val got = Lifecycle.eventsGrowthAccounting(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // identities: every user is new exactly once; churn totals match the
    // users whose activity ended before the final observed week's close
    assert(got.toSeq.map(_._2).sum == byUser.size.toLong)
    assert(got.toSeq.map(_._5).sum == byUser.size.toLong,
      "every user eventually churns past the corpus edge in this accounting")
  }

  test("events_gini equals a driver-side sorted-rank Gini") {
    val counts = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1)).sorted
    val n = counts.length.toLong
    val s = counts.map(BigInt(_)).sum
    val six = counts.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expectedPpm = ((BigInt(2) * six - BigInt(n + 1) * s) * 1000000 /
      (BigInt(n) * s)).toLong
    val got = Lifecycle.eventsGini(spark, sf).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == n)
    assert(got(0).getLong(1) == s.toLong)
    assert(got(0).getLong(2) == expectedPpm)
    // ties share midpoint-free consecutive ranks in BOTH computations: the
    // value-frame factoring assigns ranks cum_before+1..cum_before+t to a
    // tied block, exactly the sorted order above, so equality is exact
  }
  test("daily_revenue_backtest equals a driver replay; ewma beats or ties thin air") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
        .cast("long").as("cents"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    def ewmaAt(n: Int): Long = {
      val ws = (0 until Lifecycle.EwmaTerms).map { k =>
        val x = if (n - k >= 0) BigInt(daily(n - k)) else BigInt(0)
        x * BigInt(1L << (Lifecycle.EwmaTerms - 1 - k))
      }.sum
      (ws / BigInt(1L << Lifecycle.EwmaTerms)).toLong
    }
    val evalIdx = daily.indices.filter(_ >= 7) // all three forecasts defined
    def scores(fc: Int => Long): (Long, Long, Long) = {
      val errs = evalIdx.map(i => daily(i) - fc(i))
      (errs.map(math.abs).sum, errs.sum, errs.map(math.abs).sum / evalIdx.size)
    }
    val expected = Map(
      "naive" -> scores(i => daily(i - 1)),
      "seasonal_naive" -> scores(i => daily(i - 7)),
      "ewma" -> scores(i => ewmaAt(i - 1)))
    val got = Lifecycle.dailyRevenueBacktest(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(1)))).toMap
    assert(got.keySet == expected.keySet)
    for ((m, (ae, se, mae)) <- expected) {
      assert(got(m)._4 == evalIdx.size.toLong, s"$m n_days")
      assert(got(m)._1 == ae, s"$m abs err")
      assert(got(m)._2 == se, s"$m signed err")
      assert(got(m)._3 == mae, s"$m mae")
    }
  }

  test("discount_elasticity equals a driver-side grouped regression") {
    val parts = Tables.part(spark, sf).select(col("p_partkey"), col("p_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        (col("l_discount").cast("decimal(18,4)") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (parts(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val expected = li.groupBy(_._1).map { case (cat, xs) =>
      val n = BigInt(xs.size)
      val sx = xs.map(x => BigInt(x._2)).sum
      val sy = xs.map(x => BigInt(x._3)).sum
      val sxy = xs.map(x => BigInt(x._2) * x._3).sum
      val sxx = xs.map(x => BigInt(x._2) * x._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      (cat, xs.size.toLong, slope, intercept)
    }.toSet
    val got = Lifecycle.discountElasticity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    assert(got.size > 1, "single category - grouped regression vacuous")
  }

  test("events_conversion_latency equals brute first-touch gaps") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lat = ev.groupBy(_._1).values.flatMap { rows =>
      val t0 = rows.filter(_._2 == "view").map(_._3).minOption
      val t1 = rows.filter(_._2 == "purchase").map(_._3).minOption
      (t0, t1) match {
        case (Some(a), Some(b)) if b >= a => Some((b - a) / 3600000000L)
        case _ => None
      }
    }.toSeq
    def band(h: Long): String =
      if (h < 1) "0_lt1h" else if (h < 24) "1_lt1d"
      else if (h < 168) "2_lt7d" else "3_ge7d"
    val want = lat.groupBy(band).view.mapValues { hs =>
      (hs.size.toLong, (BigInt(hs.size) * 1000000 / lat.size).toLong,
        hs.min, hs.max) }.toMap
    val got = graft.operators.Lifecycle.eventsConversionLatency(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(want.size >= 2, "latency bands degenerate")
  }

  test("orders_fulfillment_latency equals brute type-1 percentiles") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).cast("string"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).cast("string"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), java.time.LocalDate.parse(r.getString(2)))))
      .toMap
    val perOrder = li.groupBy(_._1).toSeq.flatMap { case (ok, rows) =>
      ord.get(ok).map { case (prio, od) =>
        val days = rows.map(_._2)
        def gap(x: java.time.LocalDate): Long =
          math.max(java.time.temporal.ChronoUnit.DAYS.between(od, x), 0L)
        (prio, gap(days.min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))),
          gap(days.max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))))
      }
    }
    // type-1 (lower) percentile: smallest value whose cum count satisfies
    // cum*k >= p*k*n — exactly the operator's integer test
    def pct(xs: Seq[Long], num: Int, den: Int): Long = {
      val s = xs.sorted; val n = s.size
      s.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * den >= num.toLong * n => v }.get
    }
    val want = perOrder.groupBy(_._1).map { case (prio, rows) =>
      val gf = rows.map(_._2); val gl = rows.map(_._3)
      (prio, rows.size.toLong, pct(gf, 1, 2), pct(gf, 9, 10), gf.max,
        pct(gl, 1, 2), pct(gl, 9, 10), gl.max)
    }.toSet
    val got = graft.operators.Lifecycle.ordersFulfillmentLatency(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == want)
    // the profile must discriminate: not every priority shares one p50
    assert(want.map(_._3).size >= 1 && want.size >= 2)
  }

  test("orders_cohort_repeat equals brute cohort accounting") {
    val ord = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).cast("string"))
      .collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    implicit val dateOrd: Ordering[java.time.LocalDate] =
      Ordering.by(_.toEpochDay)
    val per = ord.groupBy(_._1).toSeq.map { case (_, rows) =>
      val ds = rows.map(_._2)
      val d0 = ds.min
      val later = ds.filter(_.isAfter(d0))
      val gap = if (later.isEmpty) None
        else Some(java.time.temporal.ChronoUnit.DAYS.between(d0, later.min))
      (f"${d0.getYear}%04d-${d0.getMonthValue}%02d", rows.size.toLong, gap)
    }
    val want = per.groupBy(_._1).map { case (cohort, xs) =>
      val n = xs.size.toLong
      val rep = xs.count(_._2 >= 2).toLong
      val gaps = xs.flatMap(_._3).sorted
      val p50 = gaps.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * 2 >= gaps.size => v }
      (cohort, n, rep, rep * 1000000L / n, p50)
    }.toSet
    val got = graft.operators.Lifecycle.ordersCohortRepeat(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSet
    assert(got == want)
    // cohorts must exist across months and some customers repeat
    assert(want.size >= 3 && want.exists(_._3 > 0))
  }
}
