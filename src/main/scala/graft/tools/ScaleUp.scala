package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Deterministic scale-up of a driver testdata dir (default: sf0.1 × 10 →
  * an sf1-equivalent) for the scale-escalation gate. The driver's
  * generator is not available (testdata is read-only, seed-42,
  * driver-side), so sf1 is derived from sf0.1 by key-shifted replication
  * that preserves referential integrity and — deliberately — the
  * data-shape properties the engine's cost model depends on:
  *
  *  - fixed dims (region, nation) copy once; every scaled table's foreign
  *    keys shift consistently with its parents (copy i adds i·(max+1) to
  *    each key), so join cardinalities scale exactly linearly;
  *  - document TEXT gets a per-copy alphabet permutation (a deterministic
  *    `translate`): lengths, token structure, repetition and WITHIN-copy
  *    near-dup relations are preserved (injective char map), while
  *    cross-copy shingle collisions vanish — so near-dup pairs grow ×N,
  *    not ×N² as verbatim replication would force (a 10×-replicated
  *    corpus genuinely HAS 100× near-dup pairs; that would measure the
  *    data, not the engine);
  *  - embeddings rotate their dimensions per copy (circular shift):
  *    norms, within-copy cosines and neighbor structure are exactly
  *    preserved, cross-copy cosines decorrelate, and only copy-0 vec_ids
  *    stay below Similarity.NumQueries so the query set is unchanged
  *    against a 10× corpus;
  *  - timestamps are left untouched: the same date windows see 10× rows,
  *    which is what "same queries, more data" means.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [copies]
  * Writes one single-file `<table>.parquet` per table (the driver layout,
  * so DuckDB views and tools/check.py work unchanged).
  */
object ScaleUp {

  /** Deterministic per-copy permutation of a-z (identity for copy 0) via
    * Fisher–Yates driven by a fixed LCG seeded with the copy index.
    */
  private[tools] def alphaPerm(copy: Int): String = {
    val a = ('a' to 'z').toArray
    var x = 0x9E3779B97F4A7C15L + copy.toLong * 0xBF58476D1CE4E5B9L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    var i = a.length - 1
    while (i > 0) {
      val j = math.floorMod(next(), i + 1).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    new String(a)
  }

  private def writeSingle(df: DataFrame, dst: String, table: String): Unit = {
    val tmp = s"$dst/_tmp_$table"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file for $table"))
    Files.move(part, Paths.get(s"$dst/$table.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // drop the tmp dir (part files, _SUCCESS, checksums)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
  }

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0)

  /** Replicate `df` `copies` times, shifting each column in `shift` by
    * copy·(max+1) of that column's own key space (parent max passed in for
    * foreign keys), applying `extra` to each copy's frame.
    */
  private def replicate(df: DataFrame, copies: Int, shift: Map[String, Long],
      extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    (0 until copies).map { i =>
      val shifted = shift.foldLeft(df) { case (acc, (c, base)) =>
        acc.withColumn(c, col(c) + lit(i * base))
      }
      extra(shifted, i)
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark: SparkSession = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dst))
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")

    // fixed dims: copy once
    for (t <- Seq("region", "nation")) writeSingle(rd(t), dst, t)

    val (cust, supp, part, ords, docs, vecs, evts) =
      (rd("customer"), rd("supplier"), rd("part"), rd("orders"),
        rd("documents"), rd("embeddings"), rd("events"))
    val cBase = maxOf(cust, "c_custkey") + 1
    val sBase = maxOf(supp, "s_suppkey") + 1
    val pBase = maxOf(part, "p_partkey") + 1
    val oBase = maxOf(ords, "o_orderkey") + 1
    val dBase = maxOf(docs, "doc_id") + 1
    val vBase = maxOf(vecs, "vec_id") + 1
    val eBase = maxOf(evts, "event_id") + 1
    val uBase = maxOf(evts, "user_id") + 1

    writeSingle(replicate(cust, copies, Map("c_custkey" -> cBase)), dst, "customer")
    writeSingle(replicate(supp, copies, Map("s_suppkey" -> sBase)), dst, "supplier")
    writeSingle(replicate(part, copies, Map("p_partkey" -> pBase)), dst, "part")
    writeSingle(replicate(ords, copies,
      Map("o_orderkey" -> oBase, "o_custkey" -> cBase)), dst, "orders")
    writeSingle(replicate(rd("lineitem"), copies,
      Map("l_orderkey" -> oBase, "l_partkey" -> pBase, "l_suppkey" -> sBase)),
      dst, "lineitem")
    // Normalize ts to a micros TIMESTAMP_NTZ on write so DuckDB sees the
    // same logical type it sees on the original testdata (a raw BIGINT
    // would break every date-function oracle). The source may carry either
    // TIMESTAMP(NANOS)-read-as-Long (nanosAsLong sessions; sub-microsecond
    // precision drops identically for both engines) or an already-NTZ
    // micros column — branch like Tables.events does.
    val evRep = replicate(evts, copies,
      Map("event_id" -> eBase, "user_id" -> uBase))
    val evOut = evts.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        evRep.withColumn("ts",
          expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      case _ => evRep.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
    writeSingle(evOut, dst, "events")

    val lower = ('a' to 'z').mkString
    writeSingle(replicate(docs, copies, Map("doc_id" -> dBase),
      extra = (d, i) =>
        if (i == 0) d
        else {
          val perm = alphaPerm(i)
          d.withColumn("text", translate(col("text"),
            lower + lower.toUpperCase, perm + perm.toUpperCase))
        }), dst, "documents")

    writeSingle(replicate(vecs, copies, Map("vec_id" -> vBase),
      extra = (d, i) =>
        if (i == 0) d
        else d.withColumn("embedding", expr(
          // rotate by i mod dim: copies beyond the dimensionality wrap
          // instead of driving slice() lengths negative (copies > 64 broke
          // the first 100-copy sf10 derivation)
          s"concat(slice(embedding, ($i % size(embedding)) + 1, " +
            s"size(embedding) - ($i % size(embedding))), " +
            s"slice(embedding, 1, $i % size(embedding)))"))), dst, "embeddings")

    // report the scale actually written
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val n = spark.read.parquet(s"$dst/$t.parquet").count()
      println(f"[scaleup] $t%-10s $n%9d rows")
    }
    spark.stop()
  }
}
