package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TopKSketch.topkSketch
import graft.operators.Analytics

/** Misra–Gries sketch contract, both regimes:
  *   - exact regime (cardinality ≤ cap): output equals the exact groupBy,
  *     err = 0, and the answer is invariant to partitioning (merge path);
  *   - lossy regime (cardinality ≫ cap): every guaranteed heavy hitter
  *     (true count > n/(cap+1)) is present, counters never overcount, the
  *     undercount stays within the reported err bound.
  */
class TopKSketchSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, colName: String, cap: Int) =
    df.agg(topkSketch(col(colName), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: sketch equals exact counts, err 0, partition-invariant") {
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for (parts <- Seq(1, 32)) {
      val got = sketch(ev.repartition(parts), "event_type", Analytics.TopKSketchCap)
      assert(got.map { case (t, c, _) => (t, c) }.toMap === exact, s"parts=$parts")
      assert(got.forall(_._3 === 0L), "err must be 0 when nothing was evicted")
    }
  }

  test("lossy regime: heavy hitters survive, bounds hold") {
    val cap = 16
    // one heavy key at ~20% of n, 1000 cold keys sharing the rest —
    // cardinality 62x the capacity
    val rows = (1 to 2000).map(i => s"cold${i % 1000}") ++
      Seq.fill(500)("heavy")
    val df = rows.toDF("k").repartition(8)
    val n = rows.size
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = sketch(df, "k", cap)
    val est = got.map { case (t, c, _) => (t, c) }.toMap
    val err = got.head._3
    assert(est.contains("heavy"),
      s"true count ${truth("heavy")} > n/(cap+1) = ${n / (cap + 1)} must be present")
    got.foreach { case (t, c, _) =>
      assert(c <= truth(t), s"$t: counter $c overcounts true ${truth(t)}")
      assert(truth(t) - c <= err, s"$t: undercount ${truth(t) - c} exceeds reported err $err")
    }
  }

  test("weighted sketch: exact regime equals weighted groupBy; lossy bounds hold") {
    import graft.functions.TopKSketch.topkWeighted
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 1e4 + 0.5).cast("long").as("v4"))
    val exact = ev.groupBy("event_type").agg(org.apache.spark.sql.functions.sum("v4"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = ev.agg(topkWeighted(col("event_type"), col("v4"), 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map { case (t, c, _) => (t, c) }.toMap === exact)
    assert(got.forall(_._3 === 0L))

    // lossy: heavy weight concentrated on one key among many cold keys
    val rows = (1 to 2000).map(i => (s"cold${i % 1000}", 1L)) ++
      Seq.fill(50)(("heavy", 100L))
    val df = rows.toDF("k", "w").repartition(8)
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val lossy = df.agg(topkWeighted(col("k"), col("w"), 16).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val err = lossy.head._3
    assert(lossy.exists(_._1 == "heavy"),
      s"heavy weight ${truth("heavy")} > W/(cap+1) must be present")
    lossy.foreach { case (t, c, _) =>
      assert(c <= truth(t), s"$t overcounts")
      assert(truth(t) - c <= err, s"$t undercount exceeds reported err $err")
    }
  }

  test("events_topk_sketch query matches the exact oracle shape") {
    val rows = Analytics.eventsTopkSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(Analytics.TopKSketchK)
    assert(rows.map { case (t, c, _) => (t, c) }.toSeq === exact.toSeq)
  }
}
