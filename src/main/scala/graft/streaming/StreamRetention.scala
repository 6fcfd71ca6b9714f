package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.Quality

/** Streaming twin of the bitmask retention audit: per-user activity
  * registers maintained as ONE streaming `bit_or` aggregate — state per
  * user is a single 64-bit mask regardless of how many events arrive,
  * which is exactly the property that makes the bitmask formulation the
  * scale path (a streaming user×day dedup would grow state with activity;
  * the register does not). The gate is configured with its audit window
  * (start day + width) up front — a stream cannot re-base bit positions
  * after the fact — where the batch audit derives the same bounds from
  * the corpus; the spec feeds one from the other and pins stream ≡ batch.
  * The final lag-k rollup is [[Quality.retentionRollup]], shared verbatim
  * with the batch plan.
  */
object StreamRetention {

  /** Incoming rows: (user_id, day) with day an epoch-day index — the
    * producer extracts the day the same way the batch audit does
    * (`unix_micros(ts) div 86400000000`).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("day", LongType)))

  /** Start the register-maintenance stream: Complete-mode masks into a
    * memory sink named `sinkName`. One long of state per user.
    */
  def start(s: SparkSession, inDir: String, startDay: Long,
      sinkName: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(eventSchema).json(inDir)
      .select(col("user_id"), (col("day") - startDay).as("off"))
      .filter(col("off") >= 0 && col("off") < Quality.MaxMaskDays)
      .groupBy(col("user_id"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(off AS INT)))")
        .as("mask"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(sinkName)
      .trigger(trigger)
      .start()

  /** Roll the accumulated registers up into the lag-k retention frame —
    * the identical plan the batch audit ends in. `windowDays` is the
    * configured audit window width (the batch side's `dc`). Drops the
    * memory-sink table after materializing (long-lived-session hygiene —
    * the StreamQueries cleanup contract).
    */
  def finalizeRetention(s: SparkSession, sinkName: String,
      windowDays: Long): DataFrame = {
    val dc = math.min(windowDays, Quality.MaxMaskDays.toLong)
    val out = Quality.retentionRollup(
      s.table(sinkName).withColumn("dc", lit(dc))).localCheckpoint()
    s.catalog.dropTempView(sinkName)
    out
  }
}
