package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{RateLimit, RlAdmit, RlEvent}

/** The transformWithState admission gate vs an in-memory oracle: per
  * (user, hour bucket) at most `limit` admitted, earliest-(t, id) first,
  * counts carried ACROSS micro-batches and across a query restart
  * (checkpoint restore), replay idempotent via the parquet sink's own
  * exactly-once batching.
  */
class RateLimitSpec extends AnyFunSuite {
  import TestSpark.spark

  private val H = RateLimit.BucketUs

  // (file index, events) — file 0 processes before file 1
  // (maxFilesPerTrigger=1 + ascending mtimes)
  private val batches: Seq[Seq[RlEvent]] = Seq(
    Seq( // batch 0: user 1 overflows bucket 0; user 2 under quota
      RlEvent(1, 10, 100L), RlEvent(1, 11, 200L), RlEvent(1, 12, 50L),
      RlEvent(2, 20, 100L), RlEvent(1, 13, H + 1), RlEvent(2, 21, 150L)),
    Seq( // batch 1: user 1's bucket 0 quota is ALREADY FULL from batch 0
      RlEvent(1, 14, 300L), RlEvent(2, 22, 400L), RlEvent(1, 15, H + 2)))

  /** The gate's contract, restated independently: fold batches in order,
    * each sorted by (t, id), counting per (user, bucket).
    */
  private def expected(limit: Int): Set[RlAdmit] = {
    val counts = collection.mutable.Map.empty[(Long, Long), Int]
    val out = Set.newBuilder[RlAdmit]
    for (b <- batches; e <- b.sortBy(e => (e.t_us, e.event_id))) {
      val bucket = Math.floorDiv(e.t_us, H)
      val c = counts.getOrElse((e.user_id, bucket), 0)
      if (c < limit) {
        counts((e.user_id, bucket)) = c + 1
        out += RlAdmit(e.user_id, e.event_id, e.t_us, bucket, c + 1)
      }
    }
    out.result()
  }

  test("per-key quota spans micro-batches and a checkpointed restart") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = Files.createTempDirectory("graft_rl_").toString
    val (in, out, ck) = (s"$root/in", s"$root/out", s"$root/ck")
    Files.createDirectories(Paths.get(in))
    def writeBatch(i: Int): Unit = {
      val p = Paths.get(in, s"b$i.json")
      Files.write(p, batches(i).map(e =>
        s"""{"user_id":${e.user_id},"event_id":${e.event_id},"t_us":${e.t_us}}""")
        .mkString("\n").getBytes)
      Files.setLastModifiedTime(p, FileTime.fromMillis(1000000L + i * 60000L))
    }
    try {
      val limit = 2
      // run 1: only batch 0 exists
      writeBatch(0)
      RateLimit.start(spark, in, out, ck, limit, Some(1)).awaitTermination()
      // run 2: batch 1 appears; state must restore from the checkpoint
      writeBatch(1)
      RateLimit.start(spark, in, out, ck, limit, Some(1)).awaitTermination()

      import spark.implicits._
      val got = spark.read.schema(org.apache.spark.sql.Encoders.product[RlAdmit].schema)
        .parquet(out).as[RlAdmit].collect().toSet
      assert(got === expected(limit))
      // the quota binds: user 1 bucket 0 offered 4 (3 in batch 0 + 1 in
      // batch 1), admitted exactly `limit`, and the batch-0 earliest pair
      // (t=50, t=100) took the slots — batch 1's t=300 found it full
      assert(got.count(a => a.user_id == 1 && a.bucket == 0) == limit)
      assert(!got.exists(_.event_id == 14))
      assert(got.exists(_.event_id == 12) && got.exists(_.event_id == 10))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
