package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter index + point-lookup file skipping — the
  * complement of [[StatsIndex]]: min/max stats skip RANGE queries on
  * clustered layouts and honestly prune nothing on hash layouts (every
  * file spans the whole key range), while a Bloom filter skips POINT
  * lookups on exactly those hash layouts — the Delta/Iceberg bloom
  * column-index role, and ClickHouse's `bloom_filter` skip index.
  *
  * Layout: [[BloomBits]] bits per file as a SPARSE word map
  * (word-index → 64-bit word; absent word = 0), built by ONE scan — per
  * row, [[BloomHashes]] bit positions from seeded xxhash64 (seed rides as
  * a leading hash column, so each i is an independent hash family member);
  * per file, a two-level map-side-partial bit_or. The index is #files ×
  * ≤[[BloomBits]]/64 rows of metadata — manifest scale, like the stats
  * table.
  *
  * Membership tests run INSIDE Spark expressions over the index frame
  * (the same seeded-hash expressions the build used — no driver-side
  * reimplementation of xxhash64 to drift), so a lookup is one metadata
  * filter + a pruned parquet read with the residual equality predicate.
  * False positives cost a wasted file read, never a wrong row: the
  * residual predicate is always re-applied.
  */
object BloomIndex {

  /** Bits per file. 4096 bits ≈ 0.1% FPR at ~300 distinct keys/file with
    * 3 hashes; files denser in distinct keys should raise this — the
    * sizing rule is bits ≈ 14 × distinct keys for ~0.1%.
    */
  val BloomBits = 4096L
  val BloomHashes = 3

  /** The i-th bit position for a key column (seed as leading hash input).
    * The key is canonicalized to BIGINT before hashing: xxhash64 is
    * input-type-sensitive (an INT column hashes 4 bytes, a BIGINT literal
    * 8), so without the cast a non-Long key column would be hashed into
    * different positions at build time than [[candidateFiles]]'s Long
    * literal probes — Bloom FALSE NEGATIVES, i.e. silently missing rows.
    * Casting both sides to one canonical type keeps the contract "false
    * positives cost a wasted read, never a wrong row" true for any
    * integral key column.
    */
  private def pos(i: Int, key: Column): Column =
    pmod(xxhash64(lit(i), key.cast("long")), lit(BloomBits))

  /** One row per file: `file`, `bm` = sparse word map (word idx → word). */
  def build(s: SparkSession, dir: String, keyCol: String): DataFrame = {
    val positions = (0 until BloomHashes).map(i => pos(i, col(keyCol)))
    s.read.parquet(dir)
      .select(col("_metadata.file_path").as("file"),
        explode(array(positions: _*)).as("p"))
      .select(col("file"), expr("CAST(p div 64 AS INT)").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("b"))
      .groupBy(col("file"), col("w")).agg(expr("bit_or(b)").as("word"))
      .groupBy(col("file"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("w"), col("word"))))).as("bm"))
  }

  /** Files whose Bloom filter may contain `key` (exact misses excluded). */
  def candidateFiles(blooms: DataFrame, key: Long): Seq[String] = {
    val withPos = (0 until BloomHashes).foldLeft(blooms) { (df, i) =>
      df.withColumn(s"_p$i", pos(i, lit(key)))
    }
    val tests: Seq[Column] = (0 until BloomHashes).map { i =>
      expr(s"(coalesce(element_at(bm, CAST(_p$i div 64 AS INT)), " +
        s"CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), " +
        s"CAST(_p$i % 64 AS INT))) != 0")
    }
    withPos.filter(tests.reduce(_ && _))
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** The skipping point lookup: pruned file list + residual equality.
    * Returns (frame, filesRead, filesTotal) so callers see the pruning.
    */
  def prunedRead(s: SparkSession, dir: String, blooms: DataFrame,
      keyCol: String, key: Long): (DataFrame, Int, Long) = {
    val files = candidateFiles(blooms, key)
    val total = blooms.count()
    val df =
      if (files.isEmpty) s.read.parquet(dir).filter(lit(false))
      else s.read.parquet(files: _*).filter(col(keyCol) === key)
    (df, files.size, total)
  }
}
