package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.cdc.Envelope

/** The reference's whole streaming program (cdc_processor.py:129-145) as a
  * library: N source topics → envelope parse → signed rows → idempotent
  * sink, one concurrent StreamingQuery per table.
  *
  * Sources are pluggable: `Kafka` emits the exact reader the reference uses
  * (requires the spark-sql-kafka package on the cluster classpath — not
  * present in this container, so it is exercised only as config); `Files`
  * reads the same envelope JSON from a directory, which is how the specs
  * and CI drive the identical downstream code path.
  *
  * Scale: each table is an independent query with its own checkpoint; state
  * and sink writes shard by key/batch. Backfill = same code with
  * Trigger.AvailableNow.
  */
object CdcPipeline {

  sealed trait Source
  /** Kafka topic of Debezium envelopes (cdc_processor.py:64-70).
    * `maxOffsetsPerTrigger` is the backpressure knob a production reader
    * carries (bounds per-micro-batch reads); None emits no option — the
    * reference's exact shape.
    */
  final case class Kafka(bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      topicIsPattern: Boolean = false) extends Source {
    /** The full reader option map, pure — spec-pinned against the
      * documented kafka-source contract (KafkaSourceSpec) since the
      * connector jar itself is not resolvable in this environment
      * (SURVEY §6): a typo here must fail a test, not a cluster deploy.
      * `topicIsPattern` switches the subscription mode to the documented
      * `subscribePattern` (regex over topic names — the shape a deploy
      * uses to pick up new CDC tables without a config push); the two
      * modes are mutually exclusive by construction here, exactly as the
      * source requires.
      */
    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        (if (topicIsPattern) "subscribePattern" else "subscribe") -> topic,
        "startingOffsets" -> startingOffsets) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
    val format = "kafka"
  }

  /** The reference's 4-stream fan-out as CONFIG (cdc_processor.py:139-142):
    * one Kafka source, one sink dir, and one UNIQUE checkpoint location
    * per table. Checkpoint uniqueness is load-bearing — two streaming
    * queries sharing a checkpoint dir corrupt each other's offsets — so it
    * is constructed here and spec-asserted, not left to call sites.
    */
  def fanOutPlan(bootstrapServers: String,
      tables: Seq[(String, StructType)], baseDir: String,
      maxOffsetsPerTrigger: Option[Long] = None)
      : Seq[(Kafka, StructType, String, String)] =
    tables.map { case (t, schema) =>
      (Kafka(bootstrapServers, s"cdc.public.$t",
        maxOffsetsPerTrigger = maxOffsetsPerTrigger),
        schema, s"$baseDir/sink/$t", s"$baseDir/checkpoints/$t")
    }

  /** Admission math for the reader's backpressure knob: the smallest
    * `maxOffsetsPerTrigger` that never STARVES the downstream per-key
    * admission gate (RateLimit: at most `limit` events per key per
    * `bucketUs` time bucket). In a trigger interval the gate can admit at
    * most keys × limit × ceil(interval/bucket) rows; reading beyond that ×
    * headroom only grows the rejected backlog inside the micro-batch,
    * while a bound below it leaves admittable quota unread. Headroom
    * covers rejected rows that still occupy offsets (they are read, then
    * dropped by the gate).
    */
  def maxOffsetsForRateLimit(expectedKeys: Long, limit: Int, bucketUs: Long,
      triggerIntervalUs: Long, headroom: Double = 2.0): Long = {
    require(expectedKeys > 0 && limit > 0 && bucketUs > 0 &&
      triggerIntervalUs > 0 && headroom >= 1.0, "admission math needs positive inputs")
    val bucketsPerTrigger = (triggerIntervalUs + bucketUs - 1) / bucketUs
    math.ceil(expectedKeys.toDouble * limit * bucketsPerTrigger * headroom).toLong
  }
  /** Directory of envelope-JSON text files (one JSON per line). */
  final case class Files(dir: String) extends Source

  /** A `value: string` stream of envelope JSON. */
  def read(spark: SparkSession, src: Source): DataFrame = src match {
    case k: Kafka =>
      spark.readStream.format(k.format)
        .options(k.options)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    case Files(dir) =>
      spark.readStream.text(dir).withColumnRenamed("value", "value")
  }

  /** One table's pipeline: parse → flattened signed rows → idempotent
    * parquet sink (the ClickHouse-append role), checkpointed.
    */
  def run(spark: SparkSession, src: Source, payloadSchema: StructType,
      sinkDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Envelope.parse(read(spark, src), payloadSchema)
      .writeStream
      .foreachBatch(Sinks.idempotentParquet(sinkDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** All tables concurrently — the reference's four parallel process_stream
    * calls (cdc_processor.py:139-142).
    */
  def runAll(spark: SparkSession, tables: Seq[(Source, StructType, String, String)],
      trigger: Trigger = Trigger.AvailableNow()): Seq[StreamingQuery] =
    tables.map { case (src, schema, sink, chk) => run(spark, src, schema, sink, chk, trigger) }
}
