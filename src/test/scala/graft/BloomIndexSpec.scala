package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{BloomIndex, StatsIndex}

/** Point-lookup skipping contract, on the layout where the min/max stats
  * index honestly prunes NOTHING (hash layout — every file spans the key
  * range): a unique-key lookup through the Bloom index reads a small
  * fraction of the files and returns exactly the full-scan filter's rows;
  * an absent key reads (almost — false positives allowed, wrong rows not)
  * no files and returns nothing.
  */
class BloomIndexSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_bloom").toString + "/ev"
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .repartition(16) // hash layout: stats intervals all overlap
      .write.parquet(d)
    d
  }

  test("bit width scales with file density and rides the index frame") {
    // fixed 4096 bits saturated at sf10 (1.5M rows/file set every bit —
    // 64/64 files matched, zero pruning; caught by tools/StoreSmoke): the
    // width must grow with the densest file and be recorded per row so
    // probes reuse the build's modulus
    assert(BloomIndex.bitsFor(1) === BloomIndex.MinBloomBits)
    assert(BloomIndex.bitsFor(250) === BloomIndex.MinBloomBits)
    val dense = BloomIndex.bitsFor(1500000L)
    assert(dense >= BloomIndex.BitsPerKey * 1500000L && dense % 64 === 0)
    val blooms = BloomIndex.build(spark, dir, "event_id")
    val bits = blooms.select("bits").distinct().collect().map(_.getLong(0))
    assert(bits.length === 1 && bits(0) >= BloomIndex.MinBloomBits)
  }

  test("unique-key point lookup prunes most files and matches full scan") {
    val blooms = BloomIndex.build(spark, dir, "event_id").localCheckpoint()
    assert(blooms.count() === 16)
    // stats on the same layout prune nothing: every file spans the range
    val stats = StatsIndex.build(spark, dir, Seq("event_id"))
    val someId = Tables.events(spark, sf)
      .agg(expr("max(event_id) div 2")).head.getLong(0)
    val key = Tables.events(spark, sf)
      .filter(col("event_id") >= someId)
      .agg(min(col("event_id"))).head.getLong(0)
    val statCands = StatsIndex.candidateFiles(stats, "event_id", key, key)
    assert(statCands.size.toLong === 16,
      "hash layout should defeat min/max stats - that is the point")
    val (df, read, total) = BloomIndex.prunedRead(spark, dir, blooms,
      "event_id", key)
    info(s"bloom point lookup: read $read of $total files")
    // a unique key lives in ONE file; allow a few Bloom false positives
    assert(read >= 1 && read <= 4, s"expected <=4 candidate files, got $read")
    val expected = spark.read.parquet(dir).filter(col("event_id") === key)
    assert(df.collect().toSet === expected.collect().toSet)
    assert(df.count() === 1)
  }

  test("absent key returns no rows through the residual predicate") {
    val blooms = BloomIndex.build(spark, dir, "event_id").localCheckpoint()
    val absent = Tables.events(spark, sf)
      .agg(max(col("event_id")) + 1000000L).head.getLong(0)
    val (df, read, total) = BloomIndex.prunedRead(spark, dir, blooms,
      "event_id", absent)
    info(s"absent-key lookup: read $read of $total files")
    assert(read <= 2, "an absent key should miss (almost) every Bloom")
    assert(df.count() === 0)
  }

  test("non-Long key column (INT) probes the same positions it built") {
    // xxhash64 is input-type-sensitive (INT hashes 4 bytes, BIGINT 8):
    // without the canonical cast-to-long in BloomIndex.pos, an INT key
    // column builds positions the Long-literal probe never tests — FALSE
    // NEGATIVES, i.e. prunedRead silently dropping rows that exist.
    val d = Files.createTempDirectory("graft_bloom_int").toString + "/ev"
    Tables.events(spark, sf)
      .select(col("event_id").cast("int").as("eid_int"), col("event_type"))
      .repartition(8)
      .write.parquet(d)
    val blooms = BloomIndex.build(spark, d, "eid_int").localCheckpoint()
    val key = Tables.events(spark, sf)
      .agg(expr("max(event_id) div 3")).head.getLong(0)
    val hit = Tables.events(spark, sf)
      .filter(col("event_id") >= key).agg(min(col("event_id"))).head.getLong(0)
    val (df, read, total) = BloomIndex.prunedRead(spark, d, blooms,
      "eid_int", hit)
    info(s"int-key lookup: read $read of $total files")
    val expected = spark.read.parquet(d).filter(col("eid_int") === hit)
    assert(expected.count() === 1, "precondition: the key exists")
    assert(df.collect().toSet === expected.collect().toSet,
      "bloom pruning must never lose an existing row (false negative)")
    assert(read >= 1 && read <= 3, s"and it still prunes: got $read")
  }

  test("multi-occurrence key (user_id) still prunes and stays exact") {
    val blooms = BloomIndex.build(spark, dir, "user_id").localCheckpoint()
    val key = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").asc, col("user_id")).head.getLong(0)
    val (df, read, total) = BloomIndex.prunedRead(spark, dir, blooms,
      "user_id", key)
    info(s"user lookup: read $read of $total files")
    assert(read.toLong <= total, "candidates bounded by file count")
    val expected = spark.read.parquet(dir).filter(col("user_id") === key)
    assert(df.collect().toSet === expected.collect().toSet)
    assert(df.count() > 0)
  }
}
