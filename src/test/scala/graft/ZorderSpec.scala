package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scale

/** The point of z-ordering, measured: files bucketed by the interleaved
  * z-value have smaller (user × hour) bounding boxes on average than an
  * hour-sorted layout, whose files each span the ENTIRE user dimension —
  * so a user-keyed predicate prunes z-ordered files but none of the
  * hour-sorted ones.
  */
class ZorderSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def avgSpans(layout: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val r = layout.agg(
      avg(col("u_max") - col("u_min") + 1).as("us"),
      avg(col("h_max") - col("h_min") + 1).as("hs")).head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("z-order files prune BOTH dimensions; a single-dim sort prunes only its own") {
    val (zu, zh) = avgSpans(Scale.eventsZorderLayout(spark, sf))
    val ev = Tables.events(spark, sf).select(col("user_id").as("ux"),
      expr(s"unix_micros(ts) div ${Scale.HourUs}").as("h"))
    val b = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
      (max(col("ux")) - min(col("ux")) + 1).as("uspan")).head()
    val h0 = b.getLong(0); val hspan = b.getLong(1) - h0 + 1
    val uspan = b.getLong(2)
    val linear = ev.withColumn("hx", col("h") - lit(h0))
      .withColumn("file", expr(s"(hx * ${Scale.ZFiles}) div $hspan"))
      .groupBy(col("file"))
      .agg(min(col("ux")).as("u_min"), max(col("ux")).as("u_max"),
        min(col("hx")).as("h_min"), max(col("hx")).as("h_max"))
    val (lu, lh) = avgSpans(linear)
    info(f"avg spans: zorder u=$zu%.1f h=$zh%.1f | hour-sorted u=$lu%.1f h=$lh%.1f " +
      f"| full u=$uspan h=$hspan")
    // the hour sort leaves every file spanning ~the whole user dim; the
    // z layout must bound users to a real fraction of it AND still bound
    // hours to a fraction of the full span — balanced two-dim pruning
    assert(zu < 0.7 * lu, "z layout must prune the user dim the hour sort cannot")
    assert(zh < 0.7 * hspan, "z layout must still bound the hour dim")
  }
}
