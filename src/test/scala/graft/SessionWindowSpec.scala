package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Cross-check: Spark's native `session_window` produces the same sessions
  * as our lag+cumsum sessionization (same 30-min gap rule) — two
  * structurally different formulations of one semantic.
  */
class SessionWindowSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("native session_window agrees with lag/cumsum sessionization") {
    val ev = Tables.events(spark, sf)
    val native = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("n_events"), col("session_value"))
    val ours = Analytics.eventsSessionize(spark, sf)
      .select(col("user_id"), col("n_events"), col("session_value"))
    assert(native.count() === ours.count())
    assert(native.exceptAll(ours).count() === 0)
    assert(ours.exceptAll(native).count() === 0)
  }
}
