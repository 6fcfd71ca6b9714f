package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.{CdcOps, CdcQueries, CdcSim}
import graft.streaming.CdcStream

class CdcSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("envelope parse round-trips the simulated changelog") {
    val parsed = CdcSim.parsedChangelog(spark, sf)
    val nOrders = Tables.orders(spark, sf).count()
    val nNonO = Tables.orders(spark, sf).filter(col("o_orderstatus") =!= "O").count()
    val nDel = Tables.orders(spark, sf).filter(col("o_orderkey") % 10 === 0).count()
    assert(parsed.count() === nOrders + nNonO + nDel)
    assert(parsed.filter(col("sign") === -1).count() === nDel)
    // delete payload routed from `before`
    assert(parsed.filter(col("op") === "d" && col("id").isNull).count() === 0)
  }

  test("snapshot drops tombstoned keys and keeps latest version") {
    val snap = CdcQueries.snapshotLatest(spark, sf)
    assert(snap.filter(col("id") % 10 === 0).count() === 0)
    val updated = snap.join(
      Tables.orders(spark, sf).filter(col("o_orderstatus") =!= "O")
        .select(col("o_orderkey").as("id"), col("o_orderstatus")), "id")
    assert(updated.filter(col("status") =!= col("o_orderstatus")).count() === 0)
  }

  test("streaming snapshot equals batch snapshot") {
    val batch = CdcQueries.snapshotLatest(spark, sf)
    val stream = CdcStream.snapshotViaStream(spark, sf)
    assert(stream.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stream).count() === 0)
  }

  test("scd2 intervals chain per key") {
    val scd = CdcQueries.scd2History(spark, sf)
    // keys with an update have two versions: first closed, second state
    val two = scd.groupBy("id").count().filter(col("count") === 2)
    val closedFirsts = scd.join(two, "id")
      .filter(col("valid_to") =!= -1)
    assert(closedFirsts.count() === two.count() ||
      scd.filter(col("valid_to") =!= -1).count() > 0)
    // currency flag: exactly one current version per live key
    val perKey = scd.filter(col("is_current") === 1).groupBy("id").count()
    assert(perKey.filter(col("count") =!= 1).count() === 0)
  }

  test("redelivery dedup is idempotent") {
    val ch = CdcSim.parsedChangelog(spark, sf)
    val doubled = ch.unionByName(ch)
    assert(CdcOps.dedupRedelivery(doubled, Seq("id"), "ts_ms").count() === ch.count())
  }

  test("log compaction = snapshot plus exactly the in-retention tombstones") {
    val compact = CdcQueries.logCompact(spark, sf).cache()
    val snap = CdcQueries.snapshotLatest(spark, sf)
    // live slice of the compacted topic ≡ the table snapshot, payload included
    val live = compact.filter(col("op") =!= "d").drop("op")
    assert(live.exceptAll(snap).count() === 0)
    assert(snap.exceptAll(live).count() === 0)
    // every surviving tombstone is within the retention horizon of the head
    val head = CdcSim.parsedChangelog(spark, sf)
      .agg(max(col("ts_ms"))).collect()(0).getLong(0)
    val tombs = compact.filter(col("op") === "d")
    assert(tombs.filter(col("ts_ms") < head - CdcQueries.TombstoneRetentionMs).count() === 0)
    // both sides of the retention boundary are exercised at this SF
    val nDeleted = Tables.orders(spark, sf).filter(col("o_orderkey") % 10 === 0).count()
    val nTombs = tombs.count()
    assert(nTombs > 0, "no tombstone survived — retention never exercised")
    assert(nTombs < nDeleted, "every tombstone survived — retention never aged one out")
    compact.unpersist()
  }

  test("cdc_key_churn equals brute per-key version accounting") {
    val ev = CdcSim.parsedChangelog(spark, sf)
      .select(col("id"), col("op"), col("ts_ms")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perKey = ev.groupBy(_._1).map { case (_, rows) =>
      (rows.length.toLong,
        rows.count(_._2 == "u").toLong,
        if (rows.exists(_._2 == "d")) 1L else 0L,
        rows.map(_._3).max - rows.map(_._3).min)
    }.toVector
    val expected = perKey.groupBy(_._1).map { case (nOps, ks) =>
      nOps -> ((ks.length.toLong, ks.map(_._2).sum, ks.map(_._3).sum,
        ks.map(_._4).sum / ks.length))
    }
    val got = CdcQueries.keyChurn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected)
    // the sim guarantees churn structure: every key has a create, some
    // have updates, some have deletes — at least two distinct buckets
    assert(got.size >= 2)
  }

  test("cdc_snapshot_delta equals brute two-snapshot reconciliation") {
    val ev = CdcSim.parsedChangelog(spark, sf)
      .select(col("id"), col("op"), col("ts_ms"), col("custkey"),
        col("price"), col("status")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        (if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4),
          if (r.isNullAt(5)) null else r.getString(5))))
    val dels = ev.filter(_._2 == "d").map(_._3)
    val t1 = (dels.min + dels.max) / 2
    def snap(cut: Long): Map[Long, (Any, Any, Any)] =
      ev.filter(_._3 <= cut).groupBy(_._1).flatMap { case (id, rows) =>
        val latest = rows.maxBy(_._3)
        if (latest._2 == "d") None else Some(id -> latest._4)
      }
    val s1 = snap(t1); val s2 = snap(Long.MaxValue)
    val expected = (s1.keySet ++ s2.keySet).toSeq.map { id =>
      val cls = (s1.get(id), s2.get(id)) match {
        case (None, _)                      => "added"
        case (_, None)                      => "removed"
        case (Some(a), Some(b)) if a == b   => "unchanged"
        case _                              => "changed"
      }
      (id, cls)
    }.groupBy(_._2).map { case (cls, xs) =>
      (cls, xs.size.toLong, xs.map(_._1).min, xs.map(_._1).max)
    }.toSet
    val got = CdcQueries.snapshotDelta(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // the delete-anchored boundary populates the big classes at every SF;
    // removed/changed are the 2-day / 1-day lag cohorts (may be thin)
    assert(Set("added", "unchanged").subsetOf(got.map(_._1)))
  }
}
