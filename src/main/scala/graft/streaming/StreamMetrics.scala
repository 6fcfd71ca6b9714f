package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe`: per-micro-batch envelope
  * health counters computed INSIDE the stream's own tasks — no second scan
  * of the batch, no sink coupling — and surfaced on every
  * StreamingQueryProgress as `observedMetrics`. This is the Spark-native
  * hook a production CDC deployment wires to its metrics system: malformed
  * ratios and event-time high-water marks per batch, at zero extra passes.
  * (The reference has no equivalent — a poisoned topic there is only
  * visible in sink row counts after the fact.)
  *
  * Scale: observe is an AggregatingAccumulator riding the existing tasks;
  * cost is a per-row fold of four counters, independent of partition
  * count, and nothing is collected to the driver but one 4-field row per
  * batch.
  */
object StreamMetrics {
  val MetricName = "cdc_health"

  /** Attach envelope-health counters to a parsed CDC stream (op == null
    * means the envelope failed to parse — the malformedStats convention).
    */
  def withEnvelopeMetrics(parsed: DataFrame): DataFrame =
    parsed.observe(MetricName,
      count(lit(1)).as("n_events"),
      sum(when(col("op").isNull, 1L).otherwise(0L)).as("n_malformed"),
      sum(when(col("op") === "d", 1L).otherwise(0L)).as("n_tombstones"),
      max(col("ts_ms")).as("max_ts_ms"))
}
