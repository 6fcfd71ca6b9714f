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
  * Layout: per file, a bit array SIZED TO THE FILE ([[bitsFor]]:
  * ≈ [[BitsPerKey]] bits per row, so the fill factor — and with it the
  * false-positive rate, ~0.6% at 3 hashes — is corpus-independent) as a
  * SPARSE word map (word-index → 64-bit word; absent word = 0), built by
  * ONE scan: per row, [[BloomHashes]] bit positions from seeded xxhash64
  * (seed rides as a leading hash column, so each i is an independent hash
  * family member); per file, a two-level map-side-partial bit_or. The
  * sizing is load-bearing at scale: the original FIXED 4096 bits saturated
  * at sf10 (1.5M rows/file set every bit — 64/64 files "matched" and the
  * index pruned nothing; caught by tools/StoreSmoke, the sf10 gate). The
  * chosen width rides the index frame as a `bits` column, so probes always
  * use the modulus the build used. The index stays manifest-scale: #files
  * rows, each ≤ bits/64 words ≈ 2.6 bytes of words per distinct key.
  *
  * Membership tests run INSIDE Spark expressions over the index frame
  * (the same seeded-hash expressions the build used — no driver-side
  * reimplementation of xxhash64 to drift), so a lookup is one metadata
  * filter + a pruned parquet read with the residual equality predicate.
  * False positives cost a wasted file read, never a wrong row: the
  * residual predicate is always re-applied.
  */
object BloomIndex {

  /** Bits per ROW of the densest file (rows upper-bound distinct keys).
    * 14 bits/key at 3 hashes gives FPR = (1 − e^(−3/14))³ ≈ 0.6% — under
    * one false-positive file per ~150 files scanned.
    */
  val BitsPerKey = 14L

  /** Floor (the original fixed size — right for ≲300-key files). */
  val MinBloomBits = 4096L
  val BloomHashes = 3

  /** Bit-array width for a file of `maxRowsPerFile` rows, rounded up to a
    * multiple of 64 so the word map has no ragged tail word.
    */
  def bitsFor(maxRowsPerFile: Long): Long = {
    val want = math.max(MinBloomBits, BitsPerKey * math.max(1L, maxRowsPerFile))
    ((want + 63) / 64) * 64
  }

  /** The i-th bit position for a key column under a given modulus.
    * The key is canonicalized to BIGINT before hashing: xxhash64 is
    * input-type-sensitive (an INT column hashes 4 bytes, a BIGINT literal
    * 8), so without the cast a non-Long key column would be hashed into
    * different positions at build time than [[candidateFiles]]'s Long
    * literal probes — Bloom FALSE NEGATIVES, i.e. silently missing rows.
    * Casting both sides to one canonical type keeps the contract "false
    * positives cost a wasted read, never a wrong row" true for any
    * integral key column.
    */
  private def pos(i: Int, key: Column, bits: Column): Column =
    pmod(xxhash64(lit(i), key.cast("long")), bits)

  /** One row per file: `file`, `bits` (the modulus this index was built
    * with — probes MUST reuse it), `bm` = sparse word map.
    */
  def build(s: SparkSession, dir: String, keyCol: String): DataFrame = {
    // size to the densest file: one cheap metadata-column pass (the build
    // scan below re-reads the data anyway; a 2× read of one key column)
    val maxRowsRow = s.read.parquet(dir)
      .groupBy(col("_metadata.file_path")).count()
      .agg(max(col("count"))).head
    // zero files/rows → max(count) is NULL; fail with a real message, not
    // the bare NullPointerException getLong would throw
    require(!maxRowsRow.isNullAt(0),
      s"BloomIndex.build: no rows under $dir — nothing to index")
    val bits = bitsFor(maxRowsRow.getLong(0))
    val positions =
      (0 until BloomHashes).map(i => pos(i, col(keyCol), lit(bits)))
    s.read.parquet(dir)
      .select(col("_metadata.file_path").as("file"),
        explode(array(positions: _*)).as("p"))
      .select(col("file"), expr("CAST(p div 64 AS INT)").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("b"))
      .groupBy(col("file"), col("w")).agg(expr("bit_or(b)").as("word"))
      .groupBy(col("file"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("w"), col("word"))))).as("bm"))
      .withColumn("bits", lit(bits))
  }

  /** Files whose Bloom filter may contain `key` (exact misses excluded).
    * Probe positions use each row's own `bits` column, so a lookup is
    * correct even over a union of indexes built at different widths.
    */
  def candidateFiles(blooms: DataFrame, key: Long): Seq[String] = {
    // index-frame version check: a frame persisted by the pre-adaptive
    // build (no `bits` column) would otherwise surface as an opaque
    // AnalysisException at probe time — fail with the actual remedy
    require(blooms.columns.contains("bits"),
      "BloomIndex.candidateFiles: index frame has no 'bits' column — " +
        "built by a pre-adaptive-sizing version; rebuild with BloomIndex.build")
    val withPos = (0 until BloomHashes).foldLeft(blooms) { (df, i) =>
      df.withColumn(s"_p$i", pos(i, lit(key), col("bits")))
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
