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
      maxOffsetsPerTrigger: Option[Long] = None) extends Source {
    /** The full reader option map, pure — spec-pinned against the
      * documented kafka-source contract (KafkaSourceSpec) since the
      * connector jar itself is not resolvable in this environment
      * (SURVEY §6): a typo here must fail a test, not a cluster deploy.
      */
    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topic,
        "startingOffsets" -> startingOffsets) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
    val format = "kafka"
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
