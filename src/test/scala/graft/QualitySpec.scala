package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

/** Driver-side brute-force verification of the governance family at
  * sf0.001: every statistic is recomputed from raw collected rows with
  * Set/BigInt arithmetic, so a pass means the distributed plan and the
  * definition agree independent of the DuckDB oracle.
  */
class QualitySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("dq_expectations equals per-constraint brute counts") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_returnflag"), unix_date(to_date(col("l_shipdate"))))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getString(3), r.getInt(4)))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        unix_date(to_date(col("o_orderdate"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val custKeys = Tables.customer(spark, sf).select(col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    val ordByKey = ord.map(o => o._1 -> o._4).toMap
    val want = Map(
      "lineitem_quantity_range" ->
        ((li.length.toLong, li.count(r => r._2 < 1 || r._2 > 50).toLong)),
      "lineitem_discount_range" ->
        ((li.length.toLong, li.count(r => r._3 < 0 || r._3 > 0.1).toLong)),
      "lineitem_returnflag_domain" ->
        ((li.length.toLong, li.count(r => !Set("A", "N", "R")(r._4)).toLong)),
      "orders_totalprice_positive" ->
        ((ord.length.toLong, ord.count(_._3 <= 0).toLong)),
      "orders_orderkey_unique" ->
        ((ord.length.toLong, (ord.length - ord.map(_._1).distinct.length).toLong)),
      "customer_mktsegment_domain" -> ((custKeys.size.toLong, 0L)),
      "orders_custkey_fk" ->
        ((ord.length.toLong, ord.count(o => !custKeys(o._2)).toLong)),
      "lineitem_orderkey_fk" ->
        ((li.length.toLong, li.count(r => !ordByKey.contains(r._1)).toLong)),
      "lineitem_ship_after_order" ->
        ((li.count(r => ordByKey.contains(r._1)).toLong,
          li.count(r => ordByKey.get(r._1).exists(r._5 < _)).toLong)))
    val got = Quality.dqExpectations(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (name, (n, v)) =>
      val (gn, gv, ppm, pass) = got(name)
      assert((gn, gv) == ((n, v)), name)
      assert(ppm == (BigInt(v) * 1000000 / n).toLong, name)
      assert(pass == (if (v == 0) 1L else 0L), name)
    }
    // the synthetic ship dates are uncorrelated with order dates — the
    // audit must surface that as a failing expectation
    assert(got("lineitem_ship_after_order")._2 > 0)
  }

  test("events_bitmap_retention equals brute day-pair counting") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dmn = ev.map(_._2).min
    val dc = math.min(ev.map(_._2).max - dmn + 1, Quality.MaxMaskDays.toLong)
    val sets = ev.map { case (u, dy) => (u, dy - dmn) }
      .filter(_._2 < Quality.MaxMaskDays)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Quality.eventsBitmapRetention(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    (1 to Quality.RetentionLags).foreach { k =>
      val base = sets.values.map(ds => ds.count(_ + k <= dc - 1).toLong).sum
      val ret = sets.values.map(ds => ds.count(d => ds(d + k)).toLong).sum
      val (gb, gr, ppm) = got(k.toLong)
      assert((gb, gr) == ((base, ret)), s"k=$k")
      assert(ppm == (if (base == 0) -1L else (BigInt(ret) * 1000000 / base).toLong))
    }
    // non-vacuous: the corpus has returning users at every lag
    assert(got.values.forall(_._2 > 0))
  }

  test("customer_abc_migration equals brute per-half ABC classes") {
    val ord = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"),
        unix_date(to_date(col("o_orderdate"))))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val mid = (ord.map(_._3).min.toLong + ord.map(_._3).max.toLong) / 2
    def cents(x: Double): Long =
      (BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
    def classes(rows: Array[(Long, Double, Int)]): Map[Long, (String, Long)] = {
      val rev = rows.groupBy(_._1).view.mapValues { rs =>
        // sum in decimal(18,4), round to 2, then cents — the plan's algebra
        (BigDecimal(rs.map(r => BigDecimal(r._2).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)).sum.toString)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
      }.toMap
      val total = rev.values.map(BigInt(_)).sum
      val byVal = rev.values.groupBy(identity).view
        .mapValues(vs => BigInt(vs.head) * vs.size).toMap
      rev.view.mapValues { r =>
        val cumge = byVal.filter(_._1 >= r).values.sum
        val cls = if (cumge * 5 <= total * 4) "A"
        else if (cumge * 20 <= total * 19) "B" else "C"
        (cls, r)
      }.toMap
    }
    val h1 = classes(ord.filter(_._3 <= mid))
    val h2 = classes(ord.filter(_._3 > mid))
    val cells = (h1.keySet ++ h2.keySet).toSeq.map { ck =>
      (h1.get(ck).map(_._1).getOrElse("-"), h2.get(ck).map(_._1).getOrElse("-"),
        h1.get(ck).map(_._2).getOrElse(0L), h2.get(ck).map(_._2).getOrElse(0L))
    }.groupBy(c => (c._1, c._2)).view.mapValues(cs =>
      (cs.size.toLong, cs.map(_._3).sum, cs.map(_._4).sum)).toMap
    val got = Quality.customerAbcMigration(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == cells)
    // the matrix is non-trivial: customers do move between tiers
    assert(cells.keys.exists { case (a, b) => a != b })
  }

  test("supplier_set_cover equals brute greedy with (count desc, key) ties") {
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var covered = Set.empty[Long]
    var want = Vector.empty[(Int, Long, Long, Long)]
    var r = 1
    var stop = false
    while (r <= Quality.SetCoverRounds && !stop) {
      val gains = bySupp.view.mapValues(ps => (ps -- covered).size).toMap
        .filter(_._2 > 0)
      if (gains.isEmpty) stop = true
      else {
        val (sk, g) = gains.minBy { case (k, n) => (-n, k) }
        covered ++= bySupp(sk)
        want :+= ((r, sk, g.toLong, covered.size.toLong))
        r += 1
      }
    }
    val got = Quality.supplierSetCover(spark, sf).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3))).toVector
    assert(got == want)
  }

  test("plan pins: no cartesian products beyond 1-row broadcast scalars") {
    Seq(Quality.dqExpectations(spark, sf),
      Quality.eventsBitmapRetention(spark, sf),
      Quality.customerAbcMigration(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }
}
