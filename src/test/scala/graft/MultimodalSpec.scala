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

  test("frame sampling keeps every 4th frame") {
    val frames = Multimodal.mmFrameSample(spark, sf)
    assert(frames.filter(col("frame_idx") % Multimodal.SampleEvery =!= 0).count() === 0)
    assert(frames.filter(col("frame_bytes") > Multimodal.FrameBytes).count() === 0)
  }
}
