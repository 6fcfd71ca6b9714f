package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Click(user: Long, cts: Timestamp)
case class Buy(user: Long, bts: Timestamp, amount: Double)

/** Watermarked stream-stream interval join: purchases attributed to a click
  * by the same user within the preceding 10 minutes — the streaming
  * attribution join a realtime e-commerce pipeline (the reference's domain)
  * runs. State on both sides is bounded by the watermark + interval.
  */
class StreamJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("purchases join clicks within the attribution window; state is bounded") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val tmp = Files.createTempDirectory("graft_ssj").toString
    val q = clicks.toDF().alias("c").withWatermark("cts", "10 minutes")
      .join(buys.toDF().alias("b").withWatermark("bts", "10 minutes"),
        expr("c.user = b.user AND b.bts >= c.cts AND b.bts <= c.cts + interval 10 minutes"))
      .select(col("c.user"), col("cts"), col("bts"), col("amount"))
      .writeStream.format("memory").queryName("ssj_sink")
      .option("checkpointLocation", s"$tmp/chk").start()

    clicks.addData(Click(1, ts(0)), Click(2, ts(5)))
    buys.addData(Buy(1, ts(4), 10.0),  // within 4 min of click → match
      Buy(2, ts(20), 20.0),            // 15 min after click → no match
      Buy(3, ts(6), 30.0))             // user never clicked → no match
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_sink").select("user", "amount")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows === Set((1L, 10.0)))
  }
}
