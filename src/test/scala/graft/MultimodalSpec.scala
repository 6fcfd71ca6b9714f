package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("mapPartitions decode seam produces one typed record per document") {
    val decoded = Multimodal.decodePartitioned(spark, sf)
    val meta = Multimodal.mmBinaryMeta(spark, sf)
    assert(decoded.count() === Tables.documents(spark, sf).count())
    // stub decoder agrees with the column-expression metadata path
    val joined = decoded.toDF().join(meta, "doc_id")
      .filter(decoded("width") =!= meta("width") || decoded("height") =!= meta("height"))
    assert(joined.count() === 0)
    // images have no duration; audio/video do
    assert(decoded.filter(col("kind") === "image" && col("duration_ms") =!= 0).count() === 0)
    assert(decoded.filter(col("kind") =!= "image" && col("duration_ms") === 0).count() === 0)
  }

  test("phash per-distinct kernel equals per-doc on a dup-heavy corpus") {
    import spark.implicits._
    // 40 docs over only 7 distinct payloads (dup rate 82%) — the regime the
    // dispatch routes to the per-distinct kernel, which the byte-dup-free
    // synthetic testdata never exercises
    val payloads = (0L until 40L).map { i =>
      (i, (s"payload-body-${i % 7} " * 8).getBytes("UTF-8"))
    }.toDF("doc_id", "payload")
    val docs = payloads.select(col("doc_id"), sha2(col("payload"), 256).as("sha"))
    def fp(perDistinct: Boolean): Map[Long, Long] =
      Multimodal.phashFingerprintsOf(payloads, docs, perDistinct)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = fp(perDistinct = false)
    val perDistinct = fp(perDistinct = true)
    assert(perDoc.size === 40 && perDistinct === perDoc)
    // byte-identical payloads share one fingerprint (the saving is real)
    assert(perDoc.values.toSet.size === 7)
  }

  test("frame sampling keeps every 4th frame") {
    val frames = Multimodal.mmFrameSample(spark, sf)
    assert(frames.filter(col("frame_idx") % Multimodal.SampleEvery =!= 0).count() === 0)
    assert(frames.filter(col("frame_bytes") > Multimodal.FrameBytes).count() === 0)
  }
}
