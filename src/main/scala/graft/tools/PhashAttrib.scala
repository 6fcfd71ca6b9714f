package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Multimodal}

/** sf1/sf10 attribution probe for `mm_phash_neardup` (the r14 `weak` row):
  * splits the wall into its three stages on the query's own frames —
  * FINGERPRINT (the native PhashSimhash payload scan + the dup-rate
  * dispatch digest agg), KEY EXPLODE (the C(m, m−4) Manku tables), and
  * the BAND JOIN + hamming verify — and prints each stage's row count so
  * the walls attribute to cardinalities, not guesses. The counts
  * cross-check tools/phash_floor_audit.py, which recomputes key rows /
  * candidate pairs / verified pairs in DuckDB from the oracle's own
  * fingerprint CTEs: Spark and the independent engine must agree on every
  * cardinality (they share bit-exact fingerprints — that is the
  * mm_phash_neardup CORRECTNESS gate).
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *     sbt "runMain graft.tools.PhashAttrib testdata-sf10"
  */
object PhashAttrib {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[attrib] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val n = Tables.documents(spark, d).count()
    val (widths, combos) = Dedup.simhashGeometry(n)
    println(s"[attrib] n_docs=$n m=${widths.length} tables=${combos.length} " +
      s"key_bits_worst=${widths.sorted.take(widths.length - Dedup.SimhashRadius).sum}")
    val fp = t("fingerprint_scan") {
      val f = Multimodal.phashFingerprints(spark, d).cache()
      println(s"[attrib] n_fingerprints=${f.count()}")
      f
    }
    val keyed = t("key_explode") {
      val k = Dedup.simhashKeys(fp, widths, combos).cache()
      println(s"[attrib] key_rows=${k.count()}")
      k
    }
    t("band_join_candidates") {
      val c = keyed.as("a").join(keyed.as("b"),
        col("a.t") === col("b.t") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id")).count()
      println(s"[attrib] candidate_pairs=$c")
    }
    t("join_verify_distinct") {
      println(s"[attrib] verified_pairs=${Dedup.simhashPairs(keyed).count()}")
    }
    spark.stop()
  }
}
