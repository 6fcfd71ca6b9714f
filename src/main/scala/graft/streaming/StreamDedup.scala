package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The at-least-once redelivery guard (CdcOps.dedupRedelivery) in stream
  * form: duplicates of the same (key, version, op) are dropped as they
  * arrive, with state bounded by the watermark horizon instead of growing
  * with the stream — the piece the reference's append-only sink leaves to
  * ClickHouse's merge (init-clickhouse.sql) done in-flight instead.
  *
  * Scale: `dropDuplicatesWithinWatermark` keys state by the dedup columns,
  * hash-partitioned across executors; a key's state is evicted once the
  * watermark passes its event time + delay, so state size is
  * O(keys per horizon), not O(stream length).
  */
object StreamDedup {

  /** Deduplicate a flattened change stream (Envelope.parse shape). `ts_ms`
    * (epoch millis) provides event time; `delay` is the out-of-orderness
    * bound, e.g. "10 minutes".
    */
  def dedupChanges(changes: DataFrame, keyCols: Seq[String],
      delay: String): DataFrame =
    changes
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark(keyCols :+ "ts_ms" :+ "op")
      .drop("event_time")
}
