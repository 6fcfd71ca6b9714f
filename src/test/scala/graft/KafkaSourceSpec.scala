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

  test("subscribePattern mode emits the pattern key and never both subscription keys") {
    val k = CdcPipeline.Kafka("kafka:9092", "cdc\\.public\\..*", topicIsPattern = true)
    assert(k.options("subscribePattern") === "cdc\\.public\\..*")
    assert(!k.options.contains("subscribe"),
      "subscribe and subscribePattern are mutually exclusive on the source")
    // still inside the documented option-name universe
    val documented = Set(
      "kafka.bootstrap.servers", "subscribe", "subscribePattern", "assign",
      "startingOffsets", "endingOffsets", "maxOffsetsPerTrigger",
      "failOnDataLoss", "kafkaConsumer.pollTimeoutMs", "minPartitions",
      "groupIdPrefix", "includeHeaders")
    assert(k.options.keySet.subsetOf(documented))
  }

  test("fanOutPlan: four tables get four sources with UNIQUE sink and checkpoint dirs") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType)))
    val tables = Seq("customers", "products", "orders", "order_items").map((_, schema))
    val plan = CdcPipeline.fanOutPlan("kafka:9092", tables, "/data/cdc", Some(50000L))
    assert(plan.size === 4)
    assert(plan.map(_._1.options("subscribe")) ===
      tables.map { case (t, _) => s"cdc.public.$t" })
    // checkpoint corruption guard: all four checkpoint dirs distinct, and
    // distinct from every sink dir
    val sinks = plan.map(_._3)
    val chks = plan.map(_._4)
    assert(chks.distinct.size === 4, "checkpoint locations must be unique per query")
    assert(sinks.distinct.size === 4)
    assert((sinks.toSet intersect chks.toSet).isEmpty)
    assert(plan.forall(_._1.options("maxOffsetsPerTrigger") === "50000"))
  }

  test("maxOffsetsPerTrigger admission math matches the rate-limit gate's capacity") {
    import graft.streaming.RateLimit
    // with the gate's own constants: a 1-minute trigger inside a 1-hour
    // bucket can admit at most keys×limit fresh rows per trigger
    val keys = 10000L
    val bound = CdcPipeline.maxOffsetsForRateLimit(
      keys, RateLimit.DefaultLimit, RateLimit.BucketUs, 60L * 1000000L, headroom = 2.0)
    val gateCapacity = keys * RateLimit.DefaultLimit // one bucket per trigger here
    assert(bound === gateCapacity * 2, "headroom×capacity is the documented formula")
    // a trigger spanning multiple buckets admits proportionally more
    val twoBuckets = CdcPipeline.maxOffsetsForRateLimit(
      keys, RateLimit.DefaultLimit, RateLimit.BucketUs, 2L * RateLimit.BucketUs)
    assert(twoBuckets === gateCapacity * 2 * 2)
    // the bound is monotone in every argument (a sizing formula that dips
    // as load grows would starve the gate)
    val base = CdcPipeline.maxOffsetsForRateLimit(100, 3, 1000L, 1000L)
    assert(CdcPipeline.maxOffsetsForRateLimit(200, 3, 1000L, 1000L) >= base)
    assert(CdcPipeline.maxOffsetsForRateLimit(100, 6, 1000L, 1000L) >= base)
    assert(CdcPipeline.maxOffsetsForRateLimit(100, 3, 1000L, 3000L) >= base)
  }
}
