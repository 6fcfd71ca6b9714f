package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward join: ties are <=, gaps carry forward, missing keys null") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"), // exactly at r1 → matches r1 (<=)
      (1L, ts("2024-01-01 11:30:00"), "e2"), // between r1 and r2 → r1
      (1L, ts("2024-01-01 13:00:00"), "e3"), // after r2 → r2
      (2L, ts("2024-01-01 09:00:00"), "e4"), // before any right row → null
      (3L, ts("2024-01-01 10:00:00"), "e5")  // key with no right rows → null
    ).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100),
      (1L, ts("2024-01-01 12:00:00"), 200),
      (2L, ts("2024-01-01 10:00:00"), 300)
    ).toDF("k", "rts", "payload")

    val out = AsOf.asofBackward(left, right, "k", "lts", "rts", Seq("payload"))
      .collect().map(r => r.getString(2) -> (if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    assert(out === Map("e1" -> 100, "e2" -> 100, "e3" -> 200, "e4" -> -1, "e5" -> -1))
  }
}
