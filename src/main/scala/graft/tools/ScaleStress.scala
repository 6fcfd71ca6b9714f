package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.PortableHash.{hexH, Bands, RowsPerBand}
import graft.operators.{Dedup, Similarity, TextQueries}

/** Data-shape scale-stress evidence for the dedup/ANN family: bucket-width
  * histograms and candidate-pair counts at a given sf dir — the measured
  * backing for the SURVEY §6 claims that the blocking structures stay
  * subquadratic as the corpus grows. Dev tool: prints one table per
  * structure.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ScaleStress
  */
object ScaleStress {

  /** Histogram of a width column: p50/p90/max plus the share of total
    * pairwork (Σ w·(w−1)/2) carried by the widest decile.
    */
  private def widthStats(widths: DataFrame, what: String): Unit = {
    val w = widths.select(col("w").cast("long")).localCheckpoint()
    val n = w.count()
    val row = w.agg(
      expr("percentile(w, 0.5)").as("p50"),
      expr("percentile(w, 0.9)").as("p90"),
      expr("percentile(w, 0.99)").as("p99"),
      max(col("w")).as("max"),
      sum(expr("w * (w - 1) / 2")).as("pairwork")).head()
    println(f"$what%-28s buckets=$n%9d p50=${row.getDouble(0)}%8.1f " +
      f"p90=${row.getDouble(1)}%8.1f p99=${row.getDouble(2)}%9.1f " +
      f"max=${row.getLong(3)}%7d pairwork=${row.getDouble(4)}%.3e")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nDocs = Tables.documents(spark, d).count()
    println(s"== ScaleStress $d (n_docs=$nDocs) ==")

    // minhash LSH band buckets (cap MaxBandWidth=64)
    val postings = Dedup.shinglePostings(spark, d)
      .select(col("doc_id"), col("n"), hexH(col("sh")).as("hp")).localCheckpoint()
    val bands = Dedup.minhashSignatures(postings)
      .select(col("doc_id"), explode(array((0 until Bands).map(k =>
        concat_ws(",", lit(k), slice(col("mh"), k * RowsPerBand + 1, RowsPerBand))): _*)).as("b"))
    widthStats(bands.groupBy(col("b")).agg(count(lit(1)).as("w")), "minhash band buckets")

    // simhash multi-chunk key buckets (corpus-parametric geometry)
    val (widths, combos) = Dedup.simhashGeometry(nDocs)
    println(s"simhash geometry: m=${widths.length} chunks, ${combos.length} tables, " +
      s"key>=${widths.sorted.take(widths.length - Dedup.SimhashRadius).sum} bits")
    val keyed = Dedup.simhashKeys(
      Dedup.simhashFingerprints(spark, d), widths, combos)
    widthStats(keyed.groupBy(col("t"), col("key")).agg(count(lit(1)).as("w")),
      "simhash key buckets")

    // containment winnow-fp postings (df cap MaxFpDf=64)
    val fpDf = TextQueries.textWinnowFp(spark, d)
      .groupBy(col("fp")).agg(count(lit(1)).as("w"))
    widthStats(fpDf, "winnow fp postings df")
    val capped = fpDf.filter(col("w") > TextQueries.MaxFpDf).count()
    println(s"winnow fps over df cap ${TextQueries.MaxFpDf}: $capped")

    // shingle postings df (jaccard join cost driver)
    widthStats(postings.groupBy(col("hp")).agg(count(lit(1)).as("w")),
      "jaccard shingle postings df")

    // candidate-pair counts vs verified results
    val mh = Dedup.dedupMinhashLsh(spark, d).count()
    val sh = Dedup.dedupSimhash(spark, d).count()
    val ct = TextQueries.textContainment(spark, d).count()
    val jc = Dedup.dedupNgramJaccard(spark, d).count()
    println(s"verified pairs: minhash_lsh=$mh simhash(h<=${Dedup.SimhashRadius})=$sh " +
      s"containment=$ct jaccard=$jc")

    // LSH auto-tune choice at this scale
    val cfg = Similarity.tunedConfig(spark, d)
    println(f"knn auto-tune: bits=${cfg.sigBits} tables=${cfg.numTables} sStar=${cfg.sStar}%.3f")

    // IVF inverted-list balance: a cell holding an outsized corpus share
    // makes every probe of it a scan of that share — the ANN scale risk
    // that replaces the dedup families' bucket widths
    widthStats(Similarity.diagCorpusCells(spark, d)
      .groupBy(col("cell")).agg(count(lit(1)).as("w")), "ivf cell widths")

    // PQ codebook utilization per subspace: degenerate training would
    // concentrate codes and flatten the ADC ranking
    widthStats(Similarity.diagPqCodes(spark, d)
      .select(posexplode(col("codes")).as(Seq("m", "code")))
      .groupBy(col("m"), col("code")).agg(count(lit(1)).as("w")),
      "pq (m,code) utilization")

    // jaccard auto-tune: threshold + the df statistic driving the dispatch
    val prof = Dedup.sampledProfile(spark, d)
    println(f"jaccard auto-tune: tau=${Dedup.jaccTunedTau(spark, d)}%.2f " +
      f"meanDf=${prof.meanDf}%.3f (dispatch<=${Dedup.JaccDfDispatch}: plain join)")

    // round-5 structures: the phash key tables reuse the simhash geometry
    // over byte-8-gram fingerprints — same saturation question, different
    // fingerprint distribution; semantic arbitration scores the SAME
    // minhash candidate set (pair volume identical to the band join)
    val phKeyed = Dedup.simhashKeys(
      graft.operators.Multimodal.phashFingerprints(spark, d), widths, combos)
    widthStats(phKeyed.groupBy(col("t"), col("key")).agg(count(lit(1)).as("w")),
      "phash key buckets")
    val sem = graft.operators.Dedup.dedupSemantic(spark, d).count()
    val ph = graft.operators.Multimodal.mmPhashNeardup(spark, d).count()
    println(s"dedup_semantic scored candidates=$sem mm_phash pairs(h<=${Dedup.SimhashRadius})=$ph")

    // round-5b structures: substr-dedup gram occurrence counts — the
    // linearity claim is that work is Σ df (never df²), so the evidence is
    // the df histogram itself; ccnet tie widths bound the only per-row
    // window by construction (≤ TieBucket rows per partition)
    val k = TextQueries.SubstrK
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
    val gramDf = toks.select(explode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(k))))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("w"))
    widthStats(gramDf, s"substr ${k}-gram occurrences")
    val tieWidths = TextQueries.textSurprisal(spark, d)
      .join(Tables.documents(spark, d).select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("tb", expr(s"doc_id div ${TextQueries.TieBucket}"))
      .groupBy(col("lang"), col("avg_centibits"), col("tb"))
      .agg(count(lit(1)).as("w"))
    widthStats(tieWidths, "ccnet tie-rank partitions")

    // round-5d structures: the DSIR bucket table must stay bounded at
    // DsirBuckets rows (the broadcast claim) with hashing spreading the
    // feature mass; semdedup's quadratic is its cell widths (the ivf cell
    // histogram over the FULL table); the quality model's density shows
    // training actually populated the literal table
    val dsirBuckets = Tables.documents(spark, d)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(2))))).as("g"))
      .select((hexH(concat(lit("dsir:"), col("g"))) % TextQueries.DsirBuckets).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("w"))
    widthStats(dsirBuckets, "dsir feature buckets")
    val sd = Similarity.dedupSemdedup(spark, d).localCheckpoint()
    widthStats(sd.groupBy(col("cell")).agg(count(lit(1)).as("w")),
      "semdedup cell widths")
    println(s"semdedup dropped=${sd.filter(col("keep") === 0).count()} of ${sd.count()}")
    val qm = TextQueries.qmFor(spark, d)
    println(s"quality model nonzero weights=${qm.w.count(_ != 0)}/${qm.w.length} bias=${qm.b}")

    // round-5e structures: the bloom decontaminator's sizing rule (set-bit
    // fraction bounds the FP rate) and its flag surplus vs the exact join;
    // knn_range's output growth (output-bound by design)
    val bi = TextQueries.bloomFor(spark, d)
    val setBits = bi.words.map(java.lang.Long.bitCount).sum
    val exactDocs = TextQueries.textDecontaminate(spark, d).count()
    val bloomDocs = TextQueries.textDecontaminateBloom(spark, d).count()
    println(f"bloom: M=${bi.m} setBits=$setBits (${setBits.toDouble / bi.m}%.4f full) " +
      s"exact_docs=$exactDocs bloom_docs=$bloomDocs")
    println(s"knn_range matches=${Similarity.knnRange(spark, d).count()} " +
      s"(tau=${Similarity.RangeTau}, ${Similarity.NumQueries} queries)")
    spark.stop()
  }
}
