package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Olap

/** orders_backlog vs a driver-side interval sweep: the delta-encoded
  * running backlog must equal the per-day count of orders whose
  * [orderdate, last shipdate] interval covers the day.
  */
class OlapSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("orders_backlog equals a brute point-in-interval count per day") {
    val out = Olap.ordersBacklog(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val opens = Tables.orders(spark, sf)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val closes = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate")).cast("string")).as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      // close clamps to open: an order cannot close before it opens
      .map { case (k, d) => (k, Seq(d, opens(k)).max) }.toMap
    val days = (opens.values ++ closes.values).toSeq.distinct.sorted
    assert(out.keySet == days.toSet)
    var running = 0L
    for (day <- days) {
      val opened = opens.values.count(_ == day).toLong
      val closed = closes.values.count(_ == day).toLong
      running += opened - closed
      assert(out(day) == ((opened, closed, running)), s"day $day")
      // brute interval check: orders in flight = opened on or before the
      // day and not yet fully shipped before/on it
      val inflight = opens.count { case (k, od) =>
        od <= day && closes.get(k).forall(_ > day)
      }.toLong
      assert(running == inflight, s"day $day: delta sweep vs interval count")
    }
    // every shipped order eventually closes: the final backlog is exactly
    // the orders with no lineitems at all
    assert(running == opens.count { case (k, _) => !closes.contains(k) }.toLong)
  }
}
