package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** One event offered to the per-key admission gate. */
case class RlEvent(user_id: Long, event_id: Long, t_us: Long)

/** An admitted event: `admit_seq` is its 1-based slot in its (key, bucket)
  * quota; rejected events produce no row.
  */
case class RlAdmit(user_id: Long, event_id: Long, t_us: Long,
    bucket: Long, admit_seq: Int)

/** Per-key, per-time-bucket admission control (at most `limit` events per
  * (user, bucket)) on Spark 4's `transformWithState` arbitrary-state API —
  * the modern replacement for flatMapGroupsWithState: typed
  * `MapState`/`ValueState` handles, RocksDB-backed, with explicit
  * lifecycle. The ingestion-side quota a CDC/event pipeline puts in front
  * of an expensive sink (the role nginx rate limiting plays for requests,
  * done in-stream with exactly-once state).
  *
  * Determinism: within each (key, micro-batch) rows are admitted in
  * (t_us, event_id) order — shuffle arrival order never changes the
  * admitted set, so replays and the spec's in-memory oracle agree exactly.
  * Across batches the state carries counts, so a key's quota spans the
  * whole stream, not one batch.
  *
  * State scale: keyed by user (hash-partitioned across executors,
  * RocksDB-backed off-heap), one MapState entry per ACTIVE bucket — old
  * buckets are garbage-collected inline once the key's high-water mark
  * moves `RetainBuckets` past them (deterministic event-time horizon, the
  * watermark idea applied to quota state; an event older than the horizon
  * re-opens a fresh bucket and is admitted — the documented trade of any
  * bounded-state gate).
  */
class RateLimitProcessor(limit: Int, bucketUs: Long)
    extends StatefulProcessor[Long, RlEvent, RlAdmit] {

  @transient private var admitted: MapState[Long, Int] = _
  @transient private var highWater: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    admitted = getHandle.getMapState[Long, Int]("admitted",
      Encoders.scalaLong, Encoders.scalaInt, TTLConfig.NONE)
    highWater = getHandle.getValueState[Long]("highWater",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[RlEvent],
      timer: TimerValues): Iterator[RlAdmit] = {
    val ordered = rows.toVector.sortBy(e => (e.t_us, e.event_id))
    val out = Vector.newBuilder[RlAdmit]
    var hw = if (highWater.exists()) highWater.get() else Long.MinValue
    for (e <- ordered) {
      val b = Math.floorDiv(e.t_us, bucketUs)
      val c = if (admitted.containsKey(b)) admitted.getValue(b) else 0
      if (c < limit) {
        admitted.updateValue(b, c + 1)
        out += RlAdmit(e.user_id, e.event_id, e.t_us, b, c + 1)
      }
      if (b > hw) hw = b
    }
    highWater.update(hw)
    // inline GC: quota entries whose bucket fell behind the key's horizon
    val horizon = hw - RateLimit.RetainBuckets
    admitted.keys().filter(_ < horizon).toVector.foreach(admitted.removeKey)
    out.result().iterator
  }
}

object RateLimit {

  val DefaultLimit = 3
  val BucketUs: Long = 3600L * 1000000L // 1 hour
  val RetainBuckets = 2L

  /** The gate as a stream transform — compose over any Dataset[RlEvent]. */
  def admittedStream(events: Dataset[RlEvent],
      limit: Int = DefaultLimit): Dataset[RlAdmit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RateLimitProcessor(limit, BucketUs),
        TimeMode.None(), OutputMode.Append())
  }

  /** JSON-lines file stream → gate → exactly-once parquet sink. */
  def start(s: SparkSession, dir: String, outDir: String,
      checkpointDir: String, limit: Int = DefaultLimit,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import s.implicits._
    val reader = maxFilesPerTrigger
      .foldLeft(s.readStream)((r, n) => r.option("maxFilesPerTrigger", n))
    val ev = reader.schema(Encoders.product[RlEvent].schema).json(dir)
      .as[RlEvent]
    admittedStream(ev, limit).writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
