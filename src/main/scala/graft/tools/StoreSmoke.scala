package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.{BloomIndex, StatsIndex}

/** Storage-layer scale smoke (the sf10 gate for store_bloom_index /
  * store_stats_index): writes the sf dir's events table as a multi-file
  * hash layout (the layout Bloom indexes exist for — every file spans the
  * whole key range, so min/max stats prune nothing), builds the per-file
  * Bloom index, and times one present-key and one absent-key point lookup,
  * printing files-read/files-total so the pruning ratio is on record at
  * scale. The stats index runs the same lookup for the contrast line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 \
  *   runMain graft.tools.StoreSmoke [nFiles]
  */
object StoreSmoke {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nFiles = args.headOption.map(_.toInt).getOrElse(64)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft_store_smoke").toString + "/ev"
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[store-smoke] $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    timed(s"write hash layout x$nFiles") {
      ev.repartition(nFiles).write.parquet(dir)
    }
    val blooms = timed("bloom index build") {
      BloomIndex.build(spark, dir, "event_id").localCheckpoint()
    }
    val stats = timed("stats index build") {
      StatsIndex.build(spark, dir, Seq("event_id")).localCheckpoint()
    }
    val maxId = ev.agg(max(col("event_id"))).head.getLong(0)
    val present = maxId / 2
    val key = ev.filter(col("event_id") >= present)
      .agg(min(col("event_id"))).head.getLong(0)
    val statCands = StatsIndex.candidateFiles(stats, "event_id", key, key)
    println(s"[store-smoke] stats-index candidates for present key: " +
      s"${statCands.size}/$nFiles (hash layout defeats min/max — expected)")
    timed("bloom point lookup (present)") {
      val (df, read, total) = BloomIndex.prunedRead(spark, dir, blooms,
        "event_id", key)
      val n = df.count()
      println(s"[store-smoke]   read $read/$total files, $n row(s)")
      require(n >= 1, "present key must survive pruning")
    }
    timed("bloom point lookup (absent)") {
      val (df, read, total) = BloomIndex.prunedRead(spark, dir, blooms,
        "event_id", maxId + 1000000L)
      val n = df.count()
      println(s"[store-smoke]   read $read/$total files, $n row(s)")
      require(n == 0, "absent key must return nothing")
    }
    spark.stop()
  }
}
