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

  test("native PhashSimhash equals the declarative gram pipeline it replaced") {
    import spark.implicits._
    // the r15 fingerprint kernel swap is only safe if the native one-pass
    // expression is BIT-IDENTICAL to the explode/array_distinct/61-column
    // aggregate form (which survives here and in the oracle SQL): edge
    // lengths (empty, <8, =8, 9), gram-duplicate-heavy bodies, and
    // high-bit bytes (the packed-long sign pitfall) all pinned
    val rnd = new scala.util.Random(41)
    val payloads = (
      Seq(
        (0L, Array.empty[Byte]),
        (1L, "abc".getBytes("UTF-8")),
        (2L, "12345678".getBytes("UTF-8")),
        (3L, "123456789".getBytes("UTF-8")),
        (4L, ("ab" * 500).getBytes("UTF-8")),
        (5L, Array.fill[Byte](1000)(0x80.toByte)),
        (6L, Array.tabulate[Byte](4096)(i => (i % 251).toByte))
      ) ++ (7L until 40L).map { i =>
        val b = new Array[Byte](64 + rnd.nextInt(2048)); rnd.nextBytes(b); (i, b)
      }
    ).toDF("doc_id", "payload")
    val native = Multimodal.phashFingerprintsOf(payloads,
        payloads.select(col("doc_id"), sha2(col("payload"), 256).as("sha")),
        perDistinct = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val declarative = graft.operators.Dedup.simhashOf(
        payloads.select(col("doc_id"),
          explode(array_distinct(transform(
            sequence(lit(1), greatest(octet_length(col("payload")) - 7, lit(1))),
            i => col("payload").substr(i, lit(8))))).as("f"))
          .withColumn("h", graft.functions.PortableHash.hexH(col("f")))
          .select(col("doc_id"), col("h")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === declarative)
  }

  test("constellation: exact copies vote at δ=0 with the full constellation") {
    import spark.implicits._
    val W = Multimodal.ConstWindow
    // two byte-identical payloads of 10 full frames + one unrelated doc
    val base = (0 until 10).map(i => f"frame-$i%02d-content".padTo(W, 'x').take(W)).mkString
    assert(base.length === 10 * W)
    val other = "z" * (10 * W)
    val df = Seq((1L, base.getBytes("UTF-8")), (2L, base.getBytes("UTF-8")),
      (7L, other.getBytes("UTF-8"))).toDF("doc_id", "payload")
    val m = Multimodal.constellationOf(df).collect()
    assert(m.length === 1)
    val r = m.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L && r.getLong(2) === 0L)
    // full constellation: Σ_{t=0..nf-2} |{j ∈ 1..3 : t+j ≤ nf-1}| = 3·nf − 6
    assert(r.getLong(3) === 3L * 10 - 6)
  }

  test("constellation: a grid-aligned excerpt matches at its start-frame offset") {
    import spark.implicits._
    val W = Multimodal.ConstWindow
    val frames = (0 until 16).map(i => f"aud-$i%03d-".padTo(W, ('a' + i % 26).toChar).take(W))
    val full = frames.mkString                     // 16 frames
    val excerpt = frames.drop(4).take(8).mkString  // frames 4..11 of the original
    val df = Seq((1L, full.getBytes("UTF-8")), (2L, excerpt.getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val m = Multimodal.constellationOf(df).collect()
    assert(m.length === 1)
    val r = m.head
    // the full track's frame t+4 aligns with the excerpt's frame t
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L && r.getLong(2) === 4L)
    // shared span = 8 frames ⇒ its full constellation votes
    assert(r.getLong(3) === 3L * 8 - 6)
  }

  test("constellation: too-common landmarks (df > cap) are suppressed") {
    import spark.implicits._
    val W = Multimodal.ConstWindow
    val body = (0 until 8).map(i => f"dup-$i%04d-fr".padTo(W, 'q').take(W)).mkString
    val n = Multimodal.ConstMaxDf + 6 // every landmark's df exceeds the cap
    val df = (1L to n.toLong).map(i => (i, body.getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    assert(Multimodal.constellationOf(df).count() === 0)
  }

  test("frame sampling keeps every 4th frame") {
    val frames = Multimodal.mmFrameSample(spark, sf)
    assert(frames.filter(col("frame_idx") % Multimodal.SampleEvery =!= 0).count() === 0)
    assert(frames.filter(col("frame_bytes") > Multimodal.FrameBytes).count() === 0)
  }

  private def kindsAndText: Array[(String, String)] =
    Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map { r =>
        val kind = (r.getLong(0) % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        (kind, r.getString(1))
      }

  test("mm_payload_entropy equals brute byte Simpson diversity") {
    val want = kindsAndText.groupBy(_._1).map { case (kind, docs) =>
      val bytes = docs.flatMap(_._2.getBytes("UTF-8"))
      val n = BigInt(bytes.length)
      val counts = bytes.groupBy(identity).values.map(_.length)
      val ss = counts.map(c => BigInt(c) * c).sum
      (kind, counts.size.toLong, bytes.length.toLong,
        ((n * n - ss) * 1000000 / (n * n)).toLong)
    }.toSet
    val got = Multimodal.mmPayloadEntropy(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(want.forall(_._4 > 0), "payloads read as constant filler")
  }

  test("mm_size_percentiles equals brute type-1 percentiles") {
    def pct(xs: Seq[Long], num: Int, den: Int): Long = {
      val s = xs.sorted; val n = s.size
      s.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * den >= num.toLong * n => v }.get
    }
    val want = kindsAndText.groupBy(_._1).map { case (kind, docs) =>
      val sizes = docs.map(_._2.getBytes("UTF-8").length.toLong).toSeq
      (kind, sizes.size.toLong, pct(sizes, 1, 4), pct(sizes, 1, 2),
        pct(sizes, 3, 4), pct(sizes, 9, 10), sizes.max)
    }.toSet
    val got = Multimodal.mmSizePercentiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
    assert(want.size == 3 && want.forall(x => x._3 <= x._4 && x._4 <= x._5
      && x._5 <= x._6 && x._6 <= x._7), "percentiles not monotone")
  }
}
