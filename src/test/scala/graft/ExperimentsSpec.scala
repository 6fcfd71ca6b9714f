package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Experiments

/** events_ab_test / text_length_ks against independent driver-side
  * recomputation (brute KS from raw lengths; Welch z from per-user sums),
  * plus the invariants an experimentation system must hold: assignment
  * stability and full user coverage.
  */
class ExperimentsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("ab test covers every user exactly once across the two variants") {
    val r = Experiments.eventsAbTest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val total = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(row.getAs[Long]("n0") + row.getAs[Long]("n1") == total)
    assert(row.getAs[Long]("n0") > 0 && row.getAs[Long]("n1") > 0)
  }

  test("ab test z-score matches a driver-side Welch recomputation") {
    val row = Experiments.eventsAbTest(spark, sf).collect().head
    val per = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val users = per.map(_._1).distinct
    // same portable hash (md5 60-bit) the query uses
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexH(sv: String): Long = {
      val h = md.digest(sv.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(h, 16)
    }
    def centsSum(u: Long): BigDecimal = per
      .filter(p => p._1 == u && p._2 == "purchase")
      .map(p => BigDecimal(p._3).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum
    val groups = users.groupBy(u => hexH(s"ab:$u") % 2)
    val stats = groups.view.mapValues { us =>
      val xs = us.map(centsSum)
      val n = xs.length
      val sx = xs.sum.toDouble
      val sxx = xs.map(x => (x * x).setScale(8, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val mean = sx / n
      (n, mean, (sxx - sx * sx / n) / (n - 1))
    }.toMap
    val (n0, m0, v0) = stats(0L); val (n1, m1, v1) = stats(1L)
    val z = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
    assert(row.getAs[Long]("n0") == n0 && row.getAs[Long]("n1") == n1)
    assert(row.getAs[Double]("mean0") == math.floor(m0 * 1e4) / 1e4)
    assert(row.getAs[Double]("mean1") == math.floor(m1 * 1e4) / 1e4)
    assert(row.getAs[Double]("z_score") == math.floor(z * 1e4) / 1e4)
    assert(row.getAs[Boolean]("significant") == (math.abs(z) > Experiments.AbZCrit))
  }

  test("text_length_ks matches brute-force KS for every source") {
    val out = Experiments.textLengthKs(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("ks_stat"), r.getAs[Long]("ks_at")))
      .toMap
    val lens = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = lens.length.toLong
    val values = lens.map(_._2).distinct.sorted
    for ((src, rows) <- lens.groupBy(_._1)) {
      val ns = rows.length.toLong
      val nr = n - ns
      val inSrc = rows.map(_._2)
      val all = lens.map(_._2)
      var best = -1L; var bestAt = Long.MaxValue
      for (x <- values) {
        val cs = inSrc.count(_ <= x).toLong
        val call = all.count(_ <= x).toLong
        val num = math.abs(cs * nr - (call - cs) * ns)
        if (num > best || (num == best && x < bestAt)) {
          if (num > best) { best = num; bestAt = x }
          else bestAt = math.min(bestAt, x)
        }
      }
      val ks = math.floor(best.toDouble / (ns * nr).toDouble * 1e6) / 1e6
      assert(out(src) == ((ns, ks, bestAt)), s"source $src")
      assert(ks >= 0.0 && ks <= 1.0)
    }
  }

  test("markov attribution matches a driver-side model built from raw events") {
    val out = Experiments.eventsAttributionMarkov(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // independent path construction: sessionize → truncate at first
    // purchase → START/terminal-wrapped transitions
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
    def bump(a: String, b: String): Unit =
      counts((a, b)) = counts.getOrElse((a, b), 0L) + 1L
    for ((_, rows) <- evs.groupBy(_._1)) {
      val ordered = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)])
      var prev = Long.MinValue
      for ((_, ts, eid, et) <- ordered) {
        if (prev != Long.MinValue && ts - prev > 1800)
          sessions += scala.collection.mutable.ArrayBuffer.empty
        sessions.last += ((ts, eid, et))
        prev = ts
      }
      for (sess <- sessions if sess.nonEmpty) {
        val conv = sess.exists(_._3 == Experiments.MkConv)
        val kept = sess.takeWhile(_._3 != Experiments.MkConv)
          .map(_._3).toList
        val path = "START" :: kept ::: List(if (conv) "CONV" else "NULL")
        path.sliding(2).foreach { case Seq(a, b) => bump(a, b) }
      }
    }
    // quantized probabilities, 5 graphs, MkSteps fixed-point propagation
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def conv(drop: Option[String]): Long = {
      def p(a: String, b: String): Long = drop match {
        case Some(c) if a == c => if (b == "NULL") Experiments.MkScale else 0L
        case _ =>
          if ((a == "CONV" || a == "NULL") && a == b) Experiments.MkScale
          else counts.get((a, b)).map(c =>
            (BigInt(c) * Experiments.MkScale / totals(a)).toLong).getOrElse(0L)
      }
      val states = ("START" :: "CONV" :: "NULL" :: Experiments.MkChannels.toList).distinct
      var m = states.map(s => s -> (if (s == "START") Experiments.MkScale else 0L)).toMap
      for (_ <- 1 to Experiments.MkSteps)
        m = states.map(dst => dst -> states.map(src =>
          m(src) * p(src, dst) / Experiments.MkScale).sum).toMap
      m("CONV")
    }
    val full = conv(None)
    val re = Experiments.MkChannels.map(c =>
      c -> math.max(full - conv(Some(c)), 0L) * 1000000L / full).toMap
    val sre = re.values.sum
    for (c <- Experiments.MkChannels) {
      val expect = (full / 1000L, conv(Some(c)) / 1000L, re(c),
        if (sre > 0) re(c) * 1000000L / sre else 0L)
      assert(out(c) == expect, s"channel $c")
    }
    // removal effects must be positive and ordered sanely
    assert(re.values.forall(_ >= 0))
  }

  test("bot triage matches a driver-side cadence classification") {
    val out = Experiments.eventsBotTriage(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    case class U(n: Long, err: Long, med: Option[Long], mn: Option[Long])
    val users = evs.groupBy(_._1).map { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val gaps = ordered.sliding(2).collect {
        case Array(a, b) => b._2 - a._2
      }.toSeq
      val med = if (gaps.isEmpty) None
        else Some(gaps.sorted.apply(((gaps.size + 1) / 2 - 1).toInt))
      U(rows.length.toLong, rows.count(_._4 == "error").toLong,
        med, if (gaps.isEmpty) None else Some(gaps.min))
    }
    def verdict(u: U): String = (u.med, u.mn) match {
      case (Some(m), Some(g)) if m <= Experiments.BotMedGap && g <= Experiments.BotMinGap => "bot_like"
      case (Some(m), _) if m <= Experiments.BotMedGap => "rapid"
      case (Some(m), _) if m <= Experiments.RegMedGap => "regular"
      case _ => "sporadic"
    }
    val expect = users.groupBy(verdict).map { case (v, us) =>
      val nu = us.size.toLong
      val ne = us.map(_.n).sum
      val sm = us.flatMap(_.med).sum
      val se = us.map(_.err).sum
      v -> ((nu, ne, sm / nu, se * 1000000L / ne))
    }
    assert(out == expect)
    // every user lands in exactly one class
    assert(out.values.map(_._1).sum == users.size.toLong)
  }

  test("next-event eval matches a driver-side temporal-split recomputation") {
    val row = Experiments.eventsNextEventEval(spark, sf).collect().head
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"),
        col("event_type"), col("ts").cast("date").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val n = evs.length.toLong
    val byDay = evs.groupBy(_._5).view.mapValues(_.size.toLong).toMap
    val days = byDay.keys.toSeq.sorted
    var cum = 0L
    val splitDay = days.find { dd => cum += byDay(dd); cum * 10 >= n * Experiments.EvalTrainTenths }.get
    assert(row.getString(0) == splitDay)
    val pairs = evs.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4, b._5)
      }
    }.toSeq
    val train = pairs.filter(_._3 < splitDay)
    val ev2 = pairs.filter(_._3 >= splitDay)
    val model = train.groupBy(_._1).view.mapValues(ps =>
      ps.groupBy(_._2).view.mapValues(_.size).toSeq
        .minBy { case (c, k) => (-k, c) }._1).toMap
    val maj = train.groupBy(_._2).view.mapValues(_.size).toSeq
      .minBy { case (c, k) => (-k, c) }._1
    val ok = ev2.count(p => model.get(p._1).contains(p._2)).toLong
    val okb = ev2.count(_._2 == maj).toLong
    assert(row.getLong(1) == train.size.toLong)
    assert(row.getLong(2) == ev2.size.toLong)
    assert(row.getLong(3) == ok * 1000000L / ev2.size)
    assert(row.getLong(4) == okb * 1000000L / ev2.size)
  }

  test("ab srm matches a driver-side chi-square on the same assignment") {
    val row = Experiments.eventsAbSrm(spark, sf).collect().head
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexH(sv: String): Long = {
      val h = md.digest(sv.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(h, 16)
    }
    val n0 = users.count(u => hexH(s"ab:$u") % 2 == 0).toLong
    val n1 = users.length - n0
    val chi2 = (BigInt(n0 - n1) * (n0 - n1) * 1000000L / (n0 + n1)).toLong
    assert(row.getAs[Long]("n0") == n0 && row.getAs[Long]("n1") == n1)
    assert(row.getAs[Long]("delta_ppm") == math.abs(n0 - n1) * 1000000L / (n0 + n1))
    assert(row.getAs[Long]("chi2_ppm") == chi2)
    assert(row.getAs[Boolean]("srm") == (chi2 > Experiments.SrmChi2CritPpm))
    // the srm counts must agree with the experiment's own variant counts
    val ab = Experiments.eventsAbTest(spark, sf).collect().head
    assert(ab.getAs[Long]("n0") == n0 && ab.getAs[Long]("n1") == n1)
  }

  test("cusum shift matches a driver-side change-point recomputation") {
    val out = Experiments.eventsCusumShift(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5))))
      .toMap
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val days = evs.map(_._2).distinct.sorted
    val dN = days.length.toLong
    for ((t, rows) <- evs.groupBy(_._1)) {
      val byDay = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = rows.length.toLong
      var cum = 0L; var best = -1L; var bestDay = ""
      for ((dd, i) <- days.zipWithIndex) {
        cum += byDay.getOrElse(dd, 0L)
        val dev = math.abs(cum * dN - (i + 1) * total)
        if (dev > best) { best = dev; bestDay = dd }
      }
      val ppm = (BigInt(best) * 1000000L / (total * dN)).toLong
      assert(out(t) == ((total, dN, bestDay, best, ppm)), s"type $t")
      // final-day deviation is identically zero, so the max is interior
      assert(best >= 0 && ppm <= 1000000L)
    }
  }

  test("seasonality chi-square matches a driver-side 168-cell recomputation") {
    val out = Experiments.eventsSeasonality(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getInt(4), r.getInt(5), r.getLong(6))))
      .toMap
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    for ((t, rows) <- evs.groupBy(_._1)) {
      val cells = rows.map { case (_, sec) =>
        val z = java.time.Instant.ofEpochSecond(sec)
          .atZone(java.time.ZoneOffset.UTC)
        // 0 = Sunday, matching DuckDB's dayofweek
        ((z.getDayOfWeek.getValue % 7), z.getHour)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = rows.length.toLong
      val sq = cells.values.map(c => BigInt(c) * c).sum
      val chi2 = ((sq * 168000000L) / n - BigInt(n) * 1000000L).toLong
      val (pd, ph) = cells.toSeq.map { case ((dw, h), c) => (-c, dw, h) }
        .min match { case (_, dw, h) => (dw, h) }
      val pc = cells((pd, ph))
      assert(out(t) == ((n, chi2, chi2 > Experiments.SeasonChi2CritPpm, pd, ph, pc)), s"type $t")
      // χ² of a uniform sample over 168 cells is nonnegative by construction
      assert(chi2 >= 0L)
    }
  }
  test("mann-whitney U matches a driver-side midrank recomputation") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    // global midranks over the pooled sample (doubled to stay integral)
    val byVal = docs.map(_._2).groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val mr2 = byVal.map { case (v, t) =>
      val m = 2 * cum + t + 1; cum += t; (v, m)
    }.toMap
    val sumT = byVal.map { case (_, t) => BigInt(t) * t * t - t }.sum
    val expected = docs.groupBy(_._1).map { case (src0, xs) =>
      val n1 = xs.size.toLong
      val n2 = n - n1
      val r2 = xs.map(x => BigInt(mr2(x._2))).sum
      val u2 = (r2 - BigInt(n1) * (n1 + 1)).toLong
      val num = BigInt(n1) * n2 * ((BigInt(n) + 1) * n * (n - 1) - sumT)
      val sigma = math.sqrt(num.toDouble / (12.0 * (BigInt(n) * (n - 1)).toDouble))
      val z = (u2 - n1 * n2).toDouble / (2.0 * sigma)
      (src0, n1, n2, u2, math.floor(z * 1e4) / 1e4, math.abs(z) > Experiments.MwZCrit)
    }.toSet
    val got = Experiments.statsMannWhitney(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSet
    assert(got == expected)
    assert(expected.size > 1, "single source - test vacuous")
  }

  test("mann-whitney plan: value-frame windows only, no corpus-sized rank sort") {
    val p = Experiments.statsMannWhitney(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // two 1-row scalars (total, tie term) are the only nested-loop joins
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
    assert(p.contains("partial_count"), "value/source counts must partial-agg map-side")
  }

  test("events_ab_cuped equals BigInt CUPED algebra (trunc-div on negatives)") {
    import graft.functions.PortableHash
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      val x = rows.filter(_._2 <= mid).map(_._3).sum
      val y = rows.filter(_._2 > mid).map(_._3).sum
      // portable md5-based arm must match the plan's assignment
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cuped:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 2, BigInt(x), BigInt(y))
    }.toSeq
    val n = users.size
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val sxy = users.map(u => u._2 * u._3).sum
    val syy = users.map(u => u._3 * u._3).sum
    val aNum = n * sxy - sx * sy
    val bDen = n * sxx - sx * sx; val cDen = n * syy - sy * sy
    val theta = (aNum * 1000000 / bDen).toLong
    val rho2 = ((aNum * 1000 / bDen) * (aNum * 1000 / cDen)).toLong
    val got = Experiments.eventsAbCuped(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    Seq(0L, 1L).foreach { arm =>
      val as = users.filter(_._1 == arm)
      val na = as.size
      val sxa = as.map(_._2).sum; val sya = as.map(_._3).sum
      val meanPost = (sya * 1000000 / na).toLong
      val adj = (sya * 1000000 / na -
        BigInt(theta) * (sxa * n - sx * na) / (BigInt(na) * n)).toLong
      assert(got(arm.toInt) == ((na.toLong, sxa.toLong, sya.toLong, meanPost,
        adj, theta, rho2)), s"arm=$arm")
    }
  }

  test("events_attribution_position equals brute U-shaped journey credit") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val want = collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    ev.groupBy(_._1).values.foreach { rows =>
      val s = rows.sortBy(r => (r._3, r._4)).toSeq
      var journey = Vector.empty[String]
      s.foreach { r =>
        if (r._2 == "purchase") {
          val m = journey.size
          journey.zipWithIndex.foreach { case (t, idx) =>
            val credit =
              if (m == 1) 1000000L
              else if (m == 2) 500000L
              else if (idx == 0 || idx == m - 1) 400000L
              else 200000L / (m - 2)
            val (n, c) = want(t); want(t) = (n + 1, c + credit)
          }
          journey = Vector.empty
        } else journey :+= r._2
      }
    }
    val got = Experiments.eventsAttributionPosition(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want.toMap)
    assert(want.nonEmpty && want.values.map(_._2).sum > 0)
  }
}
