package graft

import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.CdcOps

/** Randomized (seeded, deterministic) invariants of the CDC operators over
  * arbitrary changelogs — the algebra the pipeline relies on, checked beyond
  * the single simulated-topic shape:
  *
  *  1. snapshotLatest ≡ the is_current slice of scd2 (two independent
  *     formulations of "current state").
  *  2. dedupRedelivery is idempotent under arbitrary re-delivery.
  *  3. snapshot(a ∪ b) ≡ snapshot(snapshot(a) as op='r' ∪ b) — the
  *     incremental-merge identity IncrementalSnapshot.merge is built on,
  *     for EVERY split point, not just the happy path.
  */
class CdcPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  val payloadCols = Seq("v")

  /** Random changelog: ≤nKeys keys, ≤nEv events, unique (id, ts) pairs. */
  def genChangelog(seed: Long, nKeys: Int = 12, nEv: Int = 60): DataFrame = {
    val rnd = new Random(seed)
    val events = rnd.shuffle((0 until nEv).toList).take(nEv / 2 + rnd.nextInt(nEv / 2)).map { i =>
      val id = rnd.nextInt(nKeys).toLong
      val ts = (i + 1).toLong * 1000  // unique per event → unique per key
      val op = rnd.nextInt(10) match {
        case 0 | 1 => "d"
        case 2 | 3 | 4 => "u"
        case _ => "c"
      }
      (id, rnd.nextInt(1000).toDouble, op, ts, if (op == "d") -1 else 1)
    }
    events.toDF("id", "v", "op", "ts_ms", "sign")
  }

  def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit = {
    assert(a.exceptAll(b).count() === 0, s"$hint: left-only rows")
    assert(b.exceptAll(a).count() === 0, s"$hint: right-only rows")
  }

  test("snapshotLatest equals the is_current slice of scd2") {
    for (seed <- 1L to 8L) {
      val ch = genChangelog(seed)
      val snap = CdcOps.snapshotLatest(ch, Seq("id"), "ts_ms", payloadCols)
      val cur = CdcOps.scd2(ch, Seq("id"), "ts_ms")
        .filter(col("is_current") === 1)
        .select(col("id"), col("v"), col("valid_from").as("ts_ms"))
      assertSame(snap.select("id", "v", "ts_ms"), cur, s"seed=$seed")
    }
  }

  test("snapshotAsOf: high-water mark ≡ full snapshot, pre-history ≡ empty, " +
      "interior instant ≡ the SCD2 interval lookup") {
    for (seed <- 1L to 8L) {
      val ch = genChangelog(seed).localCheckpoint()
      val full = CdcOps.snapshotLatest(ch, Seq("id"), "ts_ms", payloadCols)
      val atMax = CdcOps.snapshotAsOf(ch, Seq("id"), "ts_ms", payloadCols,
        lit(Long.MaxValue))
      assertSame(full, atMax, s"seed=$seed asof=maxTs")
      assert(CdcOps.snapshotAsOf(ch, Seq("id"), "ts_ms", payloadCols, lit(0L))
        .count() === 0, s"seed=$seed asof before history must be empty")
      // interior instant: state via the filtered max_by must equal the SCD2
      // interval containing t (valid_from <= t < valid_to, open-ended last)
      val t = ch.agg(expr("(min(ts_ms) + max(ts_ms)) div 2"))
        .head().getLong(0)
      val viaAsOf = CdcOps.snapshotAsOf(ch, Seq("id"), "ts_ms", payloadCols, lit(t))
        .select(col("id"), col("v"), col("ts_ms"))
      val viaScd2 = CdcOps.scd2(ch, Seq("id"), "ts_ms")
        .filter(col("valid_from") <= t &&
          (col("valid_to") === -1L || col("valid_to") > t))
        .select(col("id"), col("v"), col("valid_from").as("ts_ms"))
      assertSame(viaAsOf, viaScd2, s"seed=$seed asof=$t")
    }
  }

  test("dedupRedelivery is idempotent under arbitrary redelivery") {
    for (seed <- 1L to 8L) {
      val ch = genChangelog(seed)
      // deterministic redelivery: a third of events delivered twice, a
      // sixth three times (sample() here trips a Catalyst rewrite bug
      // under exceptAll in Spark 4.1)
      val redelivered = ch
        .unionByName(ch.filter(col("ts_ms") % 3 === 0))
        .unionByName(ch.filter(col("ts_ms") % 6 === 0))
      // localCheckpoint severs the plans: exceptAll directly over these
      // dropDuplicates+union trees hits INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
      // in Spark 4.1's optimizer
      assertSame(
        CdcOps.dedupRedelivery(redelivered, Seq("id"), "ts_ms").localCheckpoint(),
        CdcOps.dedupRedelivery(ch, Seq("id"), "ts_ms").localCheckpoint(), s"seed=$seed")
    }
  }

  test("incremental merge identity holds at every split point") {
    for (seed <- 1L to 4L) {
      val ch = genChangelog(seed).localCheckpoint()
      val cuts = Seq(10000L, 30000L, 50000L)
      for (cut <- cuts) {
        val a = ch.filter(col("ts_ms") <= cut)
        val b = ch.filter(col("ts_ms") > cut)
        val direct = CdcOps.snapshotLatest(ch, Seq("id"), "ts_ms", payloadCols)
        val stateA = CdcOps.snapshotLatest(a, Seq("id"), "ts_ms", payloadCols)
          .withColumn("op", lit("r")).withColumn("sign", lit(1))
        val merged = CdcOps.snapshotLatest(
          b.select("id", "v", "op", "ts_ms", "sign")
            .unionByName(stateA.select("id", "v", "op", "ts_ms", "sign")),
          Seq("id"), "ts_ms", payloadCols)
        assertSame(direct, merged, s"seed=$seed cut=$cut")
      }
    }
  }
}
