package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CdcPipeline

/** Pins the Kafka reader config against the documented kafka-source option
  * contract (Structured Streaming + Kafka integration guide; the reference's
  * reader at cdc_processor.py:64-70). The connector jar is not resolvable in
  * this environment (SURVEY §6: no kafka artifacts in the offline cache or
  * /opt/spark/jars, zero egress), so `format("kafka").load()` cannot run
  * here — this spec instead guarantees the exact option map the cluster
  * deploy will receive, so an option-name typo fails CI instead of failing
  * silently at deploy (unknown options are ignored by the source, the
  * silent-typo window the spec closes).
  */
class KafkaSourceSpec extends AnyFunSuite {

  test("Kafka source emits exactly the documented reader contract") {
    val k = CdcPipeline.Kafka("broker1:9092,broker2:9092", "cdc.public.orders")
    assert(k.format === "kafka")
    assert(k.options === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "cdc.public.orders",
      "startingOffsets" -> "earliest"))
  }

  test("backpressure knob round-trips as maxOffsetsPerTrigger") {
    val k = CdcPipeline.Kafka("b:9092", "t", "latest", Some(100000L))
    assert(k.options("startingOffsets") === "latest")
    assert(k.options("maxOffsetsPerTrigger") === "100000")
  }

  test("option keys are exactly the spark-kafka documented names (no typos)") {
    // the full documented option-name universe this pipeline may emit; an
    // accidental rename (e.g. bootstrapServers, maxOffsetPerTrigger) fails
    val documented = Set(
      "kafka.bootstrap.servers", "subscribe", "subscribePattern", "assign",
      "startingOffsets", "endingOffsets", "maxOffsetsPerTrigger",
      "failOnDataLoss", "kafkaConsumer.pollTimeoutMs", "minPartitions",
      "groupIdPrefix", "includeHeaders")
    val k = CdcPipeline.Kafka("b:9092", "t", maxOffsetsPerTrigger = Some(1L))
    assert(k.options.keySet.subsetOf(documented),
      s"undocumented option names: ${k.options.keySet -- documented}")
  }

  test("the reference's four-topic fan-out builds four independent sources") {
    val topics = Seq("customers", "products", "orders", "order_items")
      .map(t => s"cdc.public.$t")
    val srcs = topics.map(CdcPipeline.Kafka("kafka:9092", _))
    assert(srcs.map(_.options("subscribe")) === topics)
    assert(srcs.forall(_.options("startingOffsets") == "earliest"))
  }
}
