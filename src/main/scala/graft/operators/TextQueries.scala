package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions._
import graft.functions.PortableHash.{hexH, hexHSql, hmod, P}

/** Text-analysis operators over `documents` — language ID, quality scoring,
  * token counting, fingerprinting, top terms. All per-row Column expressions
  * → embarrassingly parallel scans at any scale (no shuffle except the
  * explicit aggregations), fully inside whole-stage codegen.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) =
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))

  def textStats(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      col("n_tokens"),
      length(col("text")).as("n_chars_raw"),
      subtokenCount(col("text")).as("n_subtokens"),
      detRound(aggregate(transform(col("toks"), t => length(t)), lit(0),
        (acc, x) => acc + x).cast("double") / col("n_tokens"), 4).as("avg_word_len"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))).as("n_punct"),
      (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).as("n_digits"))

  /** Composite quality: length band + stopword presence + non-repetition.
    * Per-row doubles, deterministic across engines.
    */
  def textQuality(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("len_score", least(lit(1.0), col("n_tokens").cast("double") / 100.0))
      .withColumn("stop_ratio",
        hitCount(col("toks"), enStop).cast("double") / col("n_tokens"))
      .withColumn("uniq_ratio",
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
      .withColumn("quality", detRound(
        lit(0.4) * col("len_score") + lit(0.3) * least(lit(1.0), col("stop_ratio") * 5.0) +
          lit(0.3) * col("uniq_ratio"), 4))
      .select(col("doc_id"), detRound(col("len_score"), 4).as("len_score"),
        detRound(col("stop_ratio"), 4).as("stop_ratio"),
        detRound(col("uniq_ratio"), 4).as("uniq_ratio"),
        col("quality"),
        when(col("quality") >= 0.5, lit(1)).otherwise(lit(0)).as("keep"))

  /** Gopher-style repetition signals (Rae et al. 2021, App. A1.1, public):
    * the fraction of the document covered by its single most frequent
    * 2-gram / 3-gram, and the fraction of n-gram occurrences that are
    * duplicates (count ≥ 2) — the template/SEO-spam shape a training
    * corpus filters before dedup even sees it. Token-level (the synthetic
    * docs have no line structure), thresholds are the published ones
    * adapted to tokens.
    *
    * Scale: explode → per-(doc, gram) count → per-doc agg, all partial
    * map-side, keyed on doc_id throughout — the two gram sizes each
    * shuffle once on doc_id and join co-partitioned on doc_id.
    */
  def textRepetition(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).filter(col("n_tokens") >= 3)
      .select(col("doc_id"), col("n_tokens"), col("toks"))
    def gramAgg(n: Int) = base
      .select(col("doc_id"), col("n_tokens"),
        explode(transform(sequence(lit(0), col("n_tokens") - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("g"))
      .groupBy(col("doc_id"), col("n_tokens"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(max(col("c")).as(s"top${n}_cnt"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0))).as(s"dup${n}_occ"))
    gramAgg(2).join(gramAgg(3).drop("n_tokens"), "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        detRound(col("top2_cnt").cast("double") * 2 / col("n_tokens"), 4).as("top2_frac"),
        detRound(col("top3_cnt").cast("double") * 3 / col("n_tokens"), 4).as("top3_frac"),
        detRound(col("dup2_occ").cast("double") / (col("n_tokens") - 1), 4).as("dup2_frac"),
        detRound(col("dup3_occ").cast("double") / (col("n_tokens") - 2), 4).as("dup3_frac"))
      .withColumn("keep",
        when(col("top2_frac") <= 0.20 && col("dup3_frac") <= 0.30, lit(1))
          .otherwise(lit(0)))
  }

  /** Stopword-profile language ID with fixed tie order en > es > de > fr. */
  def textLangid(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("en_hits", hitCount(col("toks"), enStop))
      .withColumn("es_hits", hitCount(col("toks"), esStop))
      .withColumn("de_hits", hitCount(col("toks"), deStop))
      .withColumn("fr_hits", hitCount(col("toks"), frStop))
      .withColumn("pred_lang",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") &&
          col("en_hits") >= col("fr_hits"), lit("en"))
          .when(col("es_hits") >= col("de_hits") && col("es_hits") >= col("fr_hits"), lit("es"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
      .select("doc_id", "lang", "pred_lang", "en_hits", "es_hits", "de_hits", "fr_hits")

  /** Language-ID confusion matrix — the eval every classifier stage ships
    * next to its predictions: (truth, predicted) doc counts with exact-ppm
    * row shares. On THIS corpus the matrix is single-column (everything
    * predicts `en`) and that is the audit working, not failing: the
    * synthetic documents carry English stopwords under every `lang` label
    * (es/de/fr hit counts are 0 across the board), i.e. a LABEL/TEXT
    * MISMATCH — exactly the broken-labeling-pipe signal a mixture planner
    * must see before weighting `lang` or trusting `pred_lang` downstream.
    * One map-side-partial count-agg to the ≤ langs² cell frame; the
    * row-total window runs on that bounded frame, never per doc.
    */
  def textLangConfusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    textLangid(s, d)
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("truth_total",
        sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("pred_lang"), col("n_docs"), col("truth_total"),
        expr("(n_docs * CAST(1000000 AS BIGINT)) div truth_total").as("share_ppm"),
        when(col("lang") === col("pred_lang"), lit(1)).otherwise(lit(0))
          .as("is_correct"))
  }

  def textFingerprint(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      greatest(col("n_tokens") - 2, lit(0)).as("n_shingles"))

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    * algorithm): per-token portable hash → rolling 3-gram polynomial hash →
    * min of each w-length window → distinct fingerprint set per document.
    * Pure per-row higher-order functions, shuffle-free; the selected-min
    * guarantee means any shared token run of ≥ k+w−1 tokens yields a shared
    * fingerprint, the containment primitive for partial-overlap detection
    * (where whole-set Jaccard misses a doc quoted inside a bigger one).
    */
  val WinnowW = 4
  val WinnowB = 257L
  def textWinnowFp(s: SparkSession, d: String): DataFrame = {
    val b2 = WinnowB * WinnowB
    Tables.documents(s, d)
      .select(col("doc_id"), normalize(col("text")).as("norm"),
        tokens(col("text")).as("toks"))
      .withColumn("hs", transform(col("toks"), tk => hmod(tk)))
      .withColumn("rh", when(size(col("toks")) >= 3,
        transform(sequence(lit(0), size(col("toks")) - 3), i =>
          (element_at(col("hs"), i + 1) * b2 +
            element_at(col("hs"), i + 2) * WinnowB +
            element_at(col("hs"), i + 3)) % P))
        .otherwise(array(hmod(col("norm")))))
      .withColumn("fp", explode(array_distinct(
        transform(sequence(lit(0), greatest(size(col("rh")) - WinnowW, lit(0))),
          j => array_min(slice(col("rh"), j + 1, lit(WinnowW)))))))
      .select(col("doc_id"), col("fp"))
  }

  /** Winnow-fingerprint containment pairs — the partial-overlap dual of
    * whole-document near-dup: a doc quoting a large block of another shares
    * the block's winnow fingerprints even when whole-doc jaccard is low.
    * containment = |shared fps| / min(|fps a|, |fps b|) ≥ 0.8. Candidates
    * come from the inverted fingerprint postings (shuffle-by-fp, same
    * linear blocking family as every dedup op — never doc × doc).
    */
  val ContainmentTau = 0.8

  /** Fingerprint document-frequency cap: a fingerprint present in more than
    * this many documents is dropped from the postings before the self-join.
    * The join's cost is Σ_fp df², so one boilerplate fingerprint (license
    * header, template) with df = millions would dominate the whole job;
    * capped, the per-fp work is bounded at df² ≤ cap². Containment is then
    * measured over non-ubiquitous fingerprints only (sizes use the same
    * capped postings, so the score stays in [0,1]) — boilerplate-block
    * matching is the exact-dup pipeline's job. The cap is restated in the
    * oracle SQL (parity exact at every scale) and asserted dormant at test
    * scale in DedupSpec — the minhash `MaxBandWidth` pattern.
    */
  val MaxFpDf = 64

  def textContainment(s: SparkSession, d: String): DataFrame = {
    // df via a window count on the fp partition: one shuffle by fp (the
    // same key the pairing join needs), linear even on a degenerate fp,
    // and the wide fps are gone before any quadratic work. Materialize
    // once: sizes + both join sides would recompute the winnow pipeline.
    val wdf = Window.partitionBy(col("fp"))
    val fps = textWinnowFp(s, d)
      .withColumn("df", count(lit(1)).over(wdf))
      .filter(col("df") <= MaxFpDf).drop("df")
      .transform(Scale.materialize)
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val shared = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared.join(sizes.toDF("doc_a", "nfa"), "doc_a")
      .join(sizes.toDF("doc_b", "nfb"), "doc_b")
      .withColumn("containment",
        col("shared").cast("double") / least(col("nfa"), col("nfb")))
      .filter(col("containment") >= ContainmentTau)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        detRound(col("containment"), 4).as("containment"))
  }

  /** The integer-valued per-doc quality signals whose pairwise correlation
    * [[textSignalCorr]] audits. Integer-only on purpose: Pearson over exact
    * BIGINT sums is the one formulation whose result is bit-identical
    * across engines (float accumulation order never enters; the final
    * /, *, sqrt are single correctly-rounded IEEE ops on exactly-
    * representable integers).
    */
  val CorrSignals: Seq[String] =
    Seq("n_tokens", "n_punct", "n_digits", "avg_centibits", "en_hits")

  /** Signal-redundancy audit: Pearson correlation between every pair of
    * integer quality signals (length, punctuation, digits, unigram
    * surprisal, stopword hits). The number a curation team reads before
    * stacking filters — two signals at |r| ≈ 1 gate the same documents
    * twice, a signal near 0 against all others carries independent
    * information.
    *
    * Scale: the doc-level frame is three co-partitioned doc_id equi-joins
    * of existing signal queries; all 26 sums land in ONE map-side-partial
    * aggregation to a single row (no per-pair passes), and the 10 pair
    * rows are a literal array explode over that row — the whole query adds
    * one full scan regardless of pair count.
    */
  def textSignalCorr(s: SparkSession, d: String): DataFrame = {
    val f = textStats(s, d).select(col("doc_id"), col("n_tokens"), col("n_punct"), col("n_digits"))
      .join(textSurprisal(s, d).select(col("doc_id"), col("avg_centibits")), "doc_id")
      .join(textLangid(s, d).select(col("doc_id"), col("en_hits")), "doc_id")
    val sigs = CorrSignals
    val pairs = for { i <- sigs.indices; j <- i + 1 until sigs.size } yield (sigs(i), sigs(j))
    def L(c: String) = col(c).cast("long")
    val aggCols = (count(lit(1)).as("n") +:
      sigs.flatMap(x => Seq(sum(L(x)).as(s"s_$x"), sum(L(x) * L(x)).as(s"ss_$x")))) ++
      pairs.map { case (a, b) => sum(L(a) * L(b)).as(s"sp_${a}__$b") }
    val g = f.agg(aggCols.head, aggCols.tail: _*)
    val pairStructs = pairs.map { case (a, b) =>
      val num = col("n") * col(s"sp_${a}__$b") - col(s"s_$a") * col(s"s_$b")
      val da = col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")
      val db = col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")
      struct(lit(a).as("signal_a"), lit(b).as("signal_b"),
        when(da === 0 || db === 0, lit(null).cast("double"))
          .otherwise(num.cast("double") / sqrt(da.cast("double") * db.cast("double")))
          .as("corr"))
    }
    g.select(col("n"), explode(array(pairStructs: _*)).as("p"))
      .select(col("p.signal_a").as("signal_a"), col("p.signal_b").as("signal_b"),
        col("n"), col("p.corr").as("corr"))
  }

  /** Top terms per source via two-phase top-k: the per-source window would
    * otherwise sort a vocabulary-sized partition on one reducer at scale.
    */
  def textTopterms(s: SparkSession, d: String): DataFrame = {
    val counts = docs(s, d)
      .select(col("source"), explode(col("toks")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("n"))
    Scale.topKPerGroup(counts, Seq("source"),
      Seq(col("n").desc, col("term")), k = 5, saltSrc = col("term"))
  }

  /** Zipf-law fit of the corpus term-frequency distribution — the
    * dataset-card diagnostic (is this corpus natural language or
    * template/boilerplate spam? natural text has slope ≈ −1; scraped
    * boilerplate flattens, ID/noise corpora steepen). Least-squares line
    * over (log2 rank, log2 freq) of the top [[ZipfTopN]] terms, with both
    * logs in the INTEGER bit-length fixed point textSurprisal established
    * (bitlen−1 = ⌊log2⌋; no transcendental whose last ulp differs between
    * java.lang.Math and libm) and the regression in the
    * daily_revenue_trend DECIMAL(38,0)-moments discipline: exact integer
    * moments, slope/intercept from correctly-rounded decimal→double casts
    * + one division each — bit-identical cross-engine.
    *
    * Scale: vocab agg shuffles one row per distinct term; the global
    * top-N is the bucketed two-phase top-k (no vocab-sized single-reducer
    * sort); the moments fold is one map-side-partial aggregate to 1 row.
    */
  val ZipfTopN = 256

  def textZipfFit(s: SparkSession, d: String): DataFrame = {
    val counts = docs(s, d)
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("g", lit(1))
    val top = graft.operators.Scale.topKPerGroup(counts, Seq("g"),
      Seq(col("n").desc, col("w")), k = ZipfTopN, saltSrc = col("w"))
    val pts = top.select(
      (length(bin(col("rnk").cast("long"))) - 1).cast("long").as("x"),
      (length(bin(col("n"))) - 1).cast("long").as("y"))
    val m = pts.agg(
      count(lit(1)).cast("decimal(38,0)").as("cnt"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"))
    m.select(
        col("cnt").cast("long").as("n_terms"),
        ((col("cnt") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("cnt") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"),
        col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"))
      .select(col("n_terms"), col("slope"),
        ((col("syd") - col("slope") * col("sxd")) / col("n_terms")).as("intercept"))
  }

  /** PII scrubbing: redact email-shaped tokens and long digit runs, report
    * per-doc redaction counts — per-row regex ops, shuffle-free at any
    * scale.
    */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val digitsRe = "[0-9]{4,}"
  def textPiiScrub(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("norm", normalize(col("text")))
      .select(col("doc_id"),
        size(regexp_extract_all(col("norm"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("norm"), lit(digitsRe), lit(0))).as("n_digit_runs"),
        md5(regexp_replace(regexp_replace(col("norm"), emailRe, "<EMAIL>"),
          digitsRe, "<NUM>")).as("scrubbed_fp"))

  /** The end-to-end "clean corpus" materialization a training pipeline runs:
    * exact-dedup survivors ∩ quality keepers → surviving doc ids. Composes
    * dedupExact + textQuality; both sides are aggregations/joins on doc_id.
    */
  def corpusClean(s: SparkSession, d: String): DataFrame = {
    val survivors = Dedup.dedupExact(s, d).select(col("keep_id").as("doc_id"))
    val keepers = textQuality(s, d).filter(col("keep") === 1)
      .select(col("doc_id"), col("quality"))
    survivors.join(keepers, "doc_id")
  }

  /** The dataset card a training run ships with: per-language corpus rollup
    * of volume (docs, tokens), quality keep-rate, exact-dup rate, and mean
    * quality — composed from the verified building blocks in one pass plus
    * a dup-count join. Mean quality sums in DECIMAL (quality is 4-decimal
    * by construction) so the aggregate is order-independent and
    * engine-exact.
    */
  def datasetCard(s: SparkSession, d: String): DataFrame = {
    val q = docs(s, d)
      .withColumn("len_score", least(lit(1.0), col("n_tokens").cast("double") / 100.0))
      .withColumn("stop_ratio",
        hitCount(col("toks"), enStop).cast("double") / col("n_tokens"))
      .withColumn("uniq_ratio",
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
      .withColumn("quality", detRound(
        lit(0.4) * col("len_score") + lit(0.3) * least(lit(1.0), col("stop_ratio") * 5.0) +
          lit(0.3) * col("uniq_ratio"), 4))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
        md5(normalize(col("text"))).as("fp"))
    val dupGroups = q.groupBy(col("fp")).agg(count(lit(1)).as("n_in_group"))
    q.join(dupGroups, "fp")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("quality") >= 0.5, 1).otherwise(0)).as("n_keep"),
        sum(when(col("n_in_group") > 1, 1).otherwise(0)).as("n_dup_docs"),
        (floor(sum(col("quality").cast("decimal(18,4)")).cast("double")
          / count(lit(1)) * 1e4) / 1e4).as("mean_quality"))
  }

  /** The WHOLE pretraining-data pipeline as one query — the artifact a
    * training run actually consumes: exact-dup survivors, minus verified
    * near-dups (greedy keep-lowest-id over the jaccard ≥ 0.5 pairs — the
    * standard one-pass policy; full connected components is
    * dedup_clusters' job), intersected with quality keepers, packed into
    * token-budget shards with per-shard mean quality. Composes five
    * independently-verified operators (dedupExact, dedupNgramJaccard,
    * textQuality, tokenization, Scale.prefixSum) into the shard manifest.
    *
    * Scale: each stage is individually audited; the composition adds only
    * doc_id-keyed joins (anti-join for drops) and the two-phase prefix
    * sum — nothing quadratic beyond the bucketed candidate generation
    * already inside the dedup stage.
    */
  def corpusPipeline(s: SparkSession, d: String): DataFrame = {
    val survivors = Dedup.dedupExact(s, d).select(col("keep_id").as("doc_id"))
    val drops = Dedup.dedupNgramJaccard(s, d)
      .select(col("doc_b").as("doc_id")).distinct()
    val keepers = textQuality(s, d).filter(col("keep") === 1)
      .select(col("doc_id"), col("quality"))
    val toks = docs(s, d).select(col("doc_id"), col("n_tokens"))
    val clean = survivors.join(drops, Seq("doc_id"), "left_anti")
      .join(keepers, "doc_id").join(toks, "doc_id")
    Scale.prefixSum(clean, "doc_id", "n_tokens")
      .withColumn("shard",
        floor((col("cum") - col("n_tokens")) / Sampling.PackBudget))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        (floor(sum(col("quality").cast("decimal(18,4)")).cast("double")
          / count(lit(1)) * 1e4) / 1e4).as("mean_quality"))
  }

  /** Benchmark decontamination — the pre-training hygiene step: flag
    * training docs that share any contiguous N-token gram with the held-out
    * benchmark slice (here doc_id % 50 == 0 stands in for the eval set).
    * This is the industry-standard n-gram collision check (per the GPT-3 /
    * PaLM appendices, which use 8–13 grams; N=5 here because the synthetic
    * corpus's overlaps are short). Inverted gram postings + equality join:
    * shuffle is by gram, cost linear in corpus size plus matches — never
    * doc × doc. Gram rows build with posexplode + window `lead`, the same
    * measured convention as Dedup.shinglePostings (nested HOF slicing was
    * 4× slower per doc); the doc-keyed exchange it costs is linear. Output:
    * contaminated doc, #shared distinct grams, #benchmark docs hit.
    */
  val DecontamN = 5
  val BenchMod = 50

  /** Distinct (doc_id, gram) N-gram rows — shared by the exact postings
    * decontaminator and the Bloom-filter variant so both see byte-identical
    * gram sets.
    */
  private def decontamGrams(s: SparkSession, d: String): DataFrame = {
    // map-side N-gram set per doc (index transform + array_distinct — the
    // shinglePostingsOf shape, r15): the posexplode + N-1 lead() windows +
    // dropDuplicates form paid a doc-keyed exchange plus a (doc, gram)
    // distinct exchange for a value computable per row. The bare explode is
    // safe here (unlike the postings case) because the generator CONSUMES
    // the array — only doc_id rides through Generate.
    val t = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= DecontamN)
    t.select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - DecontamN),
          i => concat_ws(" ", (0 until DecontamN).map(j =>
            element_at(col("toks"), i + j + 1)): _*)))).as("gram"))
  }

  def textDecontaminate(s: SparkSession, d: String): DataFrame = {
    val grams = decontamGrams(s, d)
    val bench = grams.filter(col("doc_id") % BenchMod === 0)
      .select(col("doc_id").as("bench_id"), col("gram"))
    val train = grams.filter(col("doc_id") % BenchMod =!= 0)
    train.join(bench, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** Bloom-filter benchmark decontamination — the broadcast path the
    * postings join cannot take at corpus scale. [[textDecontaminate]]
    * shuffles every training gram to meet the benchmark grams by key; at
    * 100 TB that is a corpus-sized exchange to interrogate a benchmark that
    * is, by nature, tiny and fixed. The production recipe (Dolma, Soldaini
    * et al. 2024, which decontaminates with Bloom filters; same role as the
    * GPT-3/PaLM n-gram checks) inverts it: build a bit array over the
    * benchmark's grams ONCE, ship it to every task, and flag training grams
    * with a per-row membership probe — zero shuffle on the corpus side
    * except the final doc_id rollup.
    *
    * Mechanics: the filter is M bits (M = next power of two ≥ 64× the
    * benchmark's distinct gram count, floor 2^16 — sized so the set-bit
    * fraction stays ≤ ~3/64 and the false-positive rate ≤ (3·G/M)^3 ≈
    * 1e-4), probed by BloomK affine hashes from the shared [[PortableHash]]
    * family over a salted 60-bit gram hash. The packed bit words embed as a
    * LITERAL array in the scoring expression (the text_quality_model /
    * knn_ivf trained-artifact pattern; the build-side aggregate is bounded
    * at M/64 rows whatever the benchmark size). A hit = all BloomK bits
    * set, so exact-contaminated docs are flagged BY CONSTRUCTION (no false
    * negatives — DecontamBloomSpec pins the superset) and false positives
    * are the documented, bounded price of the broadcast. The generated
    * oracle restates membership STRUCTURALLY INDEPENDENTLY — a distinct
    * set-bit-position table joined per probe, all-K-matched — so the two
    * engines agree on every bit, false positives included.
    */
  val BloomK = 3
  val BloomMinM: Long = 1L << 16

  /** Largest power of two ≤ PortableHash.P. The affine probe hash is
    * already reduced mod P ≈ 1e9, so a bitmap wider than P would leave
    * positions ≥ P permanently unset (dead top of the bitmap, silently
    * degraded FP bound on BOTH engines — the oracle gate can't see it).
    * Capping m here keeps every position reachable; past the cap the FP
    * rate grows gracefully instead of the bitmap corrupting.
    */
  val BloomMaxM: Long = java.lang.Long.highestOneBit(graft.functions.PortableHash.P)

  final case class BloomIndex(m: Long, words: Array[Long])

  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, BloomIndex]()

  /** The BloomK probe positions for a gram column, as columns. */
  private def bloomPos(gram: org.apache.spark.sql.Column, m: Long) = {
    val hm = hmod(concat(lit("bloom:"), gram))
    (0 until BloomK).map(i => graft.functions.PortableHash.affine(i, hm) % lit(m))
  }

  private def bloomBuild(s: SparkSession, d: String): BloomIndex = {
    val bench = decontamGrams(s, d).filter(col("doc_id") % BenchMod === 0)
      .select(col("gram")).distinct()
    val g = bench.count()
    val m = math.min(BloomMaxM, math.max(BloomMinM, java.lang.Long.highestOneBit(
      math.max(64L * g - 1L, 1L)) << 1))
    require(64L * g <= BloomMaxM,
      s"bloom benchmark has $g grams; 64*G exceeds the reachable bitmap " +
        s"width $BloomMaxM (affine hash range) — shard the benchmark or " +
        "accept a denser bitmap explicitly")
    // pack set bits into M/64 words distributedly; only the ≤ M/64-row
    // word frame ever reaches the driver
    val words = bench
      .select(explode(array(bloomPos(col("gram"), m): _*)).as("p"))
      .select(floor(col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("bit"))
      .groupBy(col("w")).agg(bit_or(col("bit")).as("bits"))
      .collect()
    val arr = new Array[Long]((m / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    BloomIndex(m, arr)
  }

  private[graft] def bloomFor(s: SparkSession, d: String): BloomIndex =
    bloomCache.computeIfAbsent(d, _ => bloomBuild(s, d))

  /** Per-row membership probe over a gram expression: all BloomK bits set
    * in the literal packed bitmap. Pure Column math, so it composes into
    * higher-order lambdas (the streaming gate probes inside a `filter`
    * over the per-row gram array).
    */
  private[graft] def bloomHitOn(bi: BloomIndex,
      gram: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val wLit = typedlit(bi.words.toIndexedSeq)
    bloomPos(gram, bi.m).map { p =>
      call_function("shiftright", element_at(wLit, floor(p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  private[graft] def bloomHitExpr(bi: BloomIndex): org.apache.spark.sql.Column =
    bloomHitOn(bi, col("gram"))

  /** The per-row gram array of a `toks` column — the HOF twin of
    * [[decontamGrams]] (same N, same join-by-space encoding), for
    * shuffle-free per-row scoring in the streaming gate.
    */
  private[graft] def gramArray: org.apache.spark.sql.Column =
    array_distinct(transform(
      sequence(lit(0), size(col("toks")) - DecontamN),
      i => concat_ws(" ", (0 until DecontamN).map(j =>
        element_at(col("toks"), i + j + 1)): _*)))

  def textDecontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val bi = bloomFor(s, d)
    decontamGrams(s, d).filter(col("doc_id") % BenchMod =!= 0)
      .withColumn("hit", bloomHitExpr(bi))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("hit"), lit(1L)).otherwise(lit(0L))).as("n_flagged"))
      .filter(col("n_flagged") > 0)
  }

  /** Exact substring-span duplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr policy,
    * re-expressed relationally): a K-token window is duplicated when its
    * token string occurs more than once anywhere in the corpus (another
    * document OR another position of the same document). Per affected doc:
    * the number of duplicated windows and the fraction of token positions
    * covered by the union of those windows — the span a training pipeline
    * would cut. K = 12 ≈ a quarter of the mean synthetic doc (the paper
    * uses 50 BPE tokens at web scale); the probe at sf0.01 shows 1.9k dup
    * windows over 45 docs at this K, so the op has real signal here.
    *
    * Scale: this is the one dedup flavor that is INHERENTLY linear — no
    * candidate pairs exist anywhere in the plan. Window rows shuffle once
    * by gram for the occurrence count (a boilerplate gram with df = 10⁶
    * contributes 10⁶ linear rows, never df²; AQE skew-splits the hot
    * key), then once by doc_id for the two per-doc aggregations. Gram
    * rows build with posexplode + window `lead` (the measured
    * decontaminate convention — nested HOF slicing was 4× slower).
    * Suffix arrays (the paper's tool) find variable-length maximal
    * repeats; fixed-K windows find the same spans ≥ K at 1/K the index
    * size, the right trade on a shared-nothing engine.
    */
  val SubstrK = 12

  def textSubstrDedup(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).filter(col("n_tokens") >= SubstrK)
      .select(col("doc_id"), col("n_tokens"), col("toks"))
    // map-side K-gram windows with their start position (index transform,
    // struct-carried pos — the shinglePostingsOf shape, r15): replaces the
    // posexplode + K-1 lead() windows' doc-keyed exchange
    val grams = base.select(col("doc_id"), col("n_tokens"),
        explode(transform(sequence(lit(0), size(col("toks")) - SubstrK),
          i => struct(i.cast("int").as("pos"),
            concat_ws(" ", (0 until SubstrK).map(j =>
              element_at(col("toks"), i + j + 1)): _*).as("gram")))).as("e"))
      .select(col("doc_id"), col("n_tokens"), col("e.pos").as("pos"),
        col("e.gram").as("gram"))
    // occurrence count via a window over the gram partition: one linear
    // shuffle by gram, no postings self-join. Materialized once — both
    // per-doc aggregations below read the filtered window rows.
    val dup = grams
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("occ") > 1)
      .select(col("doc_id"), col("n_tokens"), col("pos"))
      .transform(Scale.materialize)
    val perDoc = dup.groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("dup_windows"))
    val covered = dup
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SubstrK - 1))).as("tpos"))
      .groupBy(col("doc_id")).agg(countDistinct(col("tpos")).as("covered"))
    perDoc.join(covered, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("dup_windows"), col("covered"),
        detRound(col("covered").cast("double") / col("n_tokens"), 4).as("dup_frac"))
  }

  /** Integer-exact unigram surprisal — "how surprising is this document
    * under the corpus' own unigram model", the LM-quality signal a
    * pretraining filter ranks documents by (high = rare-token-heavy or
    * noise; low = boilerplate). Computed entirely in bit-length fixed
    * point: info(w) = bitlen(N) − bitlen(cnt(w)) — an integer
    * ⌊log2(N)⌋−⌊log2(cnt)⌋ surrogate for −log2 p(w) — so cross-engine
    * parity is EXACT (no transcendental log whose last ulp differs between
    * java.lang.Math and libm; precedent: part_pagerank's integer
    * fixed-point).
    *
    * Scale: token explode is a linear scan; the vocab agg shuffles one row
    * per distinct word (Zipf ⇒ small vs corpus); the tokens⟕vocab join is
    * left to Catalyst/AQE — an aggregated vocab broadcasts at runtime when
    * it fits, and a Zipf-hot shuffle key falls to AQE skew handling
    * otherwise (no forced hint, same policy as minhash verification). The
    * 1-row total is an explicit broadcast (the q22 global-avg pattern).
    */
  def textSurprisal(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d).select(col("doc_id"), explode(col("toks")).as("w"))
      .transform(graft.operators.Scale.materialize) // feeds vocab, total, and the join
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(counts, "w")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (length(bin(col("n"))) - length(bin(col("cnt")))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bits")).as("surprisal_bits"), count(lit(1)).as("n_toks"))
      .withColumn("avg_centibits",
        expr("(100 * surprisal_bits) div n_toks"))
  }

  /** CCNet-style quality tiers (Wenzek et al., 2020): per language, rank
    * documents by model surprisal and cut the corpus into head / middle /
    * tail thirds — the standard pretraining-data quality triage. The
    * "model" is the corpus-unigram surprisal of [[textSurprisal]] (integer
    * fixed point, so ordering is engine-exact); ranking is by
    * (avg_centibits asc, doc_id) — lowest surprisal = most fluent = head.
    *
    * The oracle states it as plain `ntile(3) OVER (PARTITION BY lang ORDER
    * BY ...)`. The Spark plan does NOT: a per-language ntile window puts an
    * entire language's corpus in one reducer partition — the single-node
    * sort this repo bans everywhere else. Instead the exact rank is
    * assembled from three bounded pieces (the [[Scale.prefixSum]] design
    * applied to ranking):
    *   1. value-level cumulative offsets — a window over the AGGREGATED
    *      (lang, value) frame, rows = distinct surprisal values per
    *      language (bounded by value granularity, not corpus size);
    *   2. tie ranks within (lang, value, doc_id div 4096) — partitions
    *      hold ≤ 4096 doc ids BY CONSTRUCTION, whatever the tie width;
    *   3. per-(lang, value) bucket offsets — a window over the per-bucket
    *      counts (≤ n/4096 aggregated rows).
    * rank = value offset + tie-bucket offset + in-bucket rank, then the
    * ntile group arithmetic (first n%3 groups get one extra row) computed
    * in integer `div`/`%` — identical in both engines.
    */
  val TierBuckets = 3
  val TieBucket = 4096L

  def textCcnetBuckets(s: SparkSession, d: String): DataFrame = {
    val x = textSurprisal(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("avg_centibits"))
      .transform(Scale.materialize) // feeds totals, value counts, tie ranks
    val totals = x.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val voff = x.groupBy(col("lang"), col("avg_centibits"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(
        Window.partitionBy(col("lang")).orderBy(col("avg_centibits"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("avg_centibits"), col("off"))
    val tb = x.withColumn("tb", expr(s"doc_id div $TieBucket"))
    val boff = tb.groupBy(col("lang"), col("avg_centibits"), col("tb"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("boff", coalesce(sum(col("bc")).over(
        Window.partitionBy(col("lang"), col("avg_centibits")).orderBy(col("tb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("avg_centibits"), col("tb"), col("boff"))
    tb.withColumn("tr", row_number().over(
        Window.partitionBy(col("lang"), col("avg_centibits"), col("tb"))
          .orderBy(col("doc_id"))))
      .join(boff, Seq("lang", "avg_centibits", "tb"))
      .join(voff, Seq("lang", "avg_centibits"))
      .join(broadcast(totals), "lang")
      .withColumn("p", col("off") + col("boff") + col("tr") - 1) // 0-based rank
      .withColumn("bucket",
        when(col("p") < (expr(s"n div $TierBuckets") + 1) * (col("n") % TierBuckets),
          expr(s"p div (n div $TierBuckets + 1)") + 1)
        .otherwise(col("n") % TierBuckets +
          expr(s"(p - (n div $TierBuckets + 1) * (n % $TierBuckets)) div (n div $TierBuckets)") + 1))
      .select(col("doc_id"), col("lang"), col("avg_centibits"),
        col("bucket").cast("int").as("bucket"),
        when(col("bucket") === 1, lit("head"))
          .when(col("bucket") === 2, lit("middle"))
          .otherwise(lit("tail")).as("tier"))
  }

  /** Bigram conditional surprisal — the 2-gram upgrade of
    * [[textSurprisal]]: info(w₂|w₁) = bitlen(cnt(w₁·)) − bitlen(cnt(w₁w₂)),
    * the integer bit-length surrogate for −log₂ p(w₂|w₁). A conditional
    * model scores local fluency (word-salad docs with plausible unigrams
    * rank high-surprisal here), which is what a pretraining quality filter
    * actually wants from its LM signal. Same exact-parity discipline: no
    * transcendental log, every term an integer.
    *
    * Scale: the bigram frame materializes once and feeds the bigram
    * vocabulary agg, the context agg, and the scoring join — Zipf keeps
    * both vocabularies small relative to the corpus; the joins are
    * left to Catalyst/AQE exactly like the unigram op.
    */
  def textBigramSurprisal(s: SparkSession, d: String): DataFrame = {
    // map-side bigram rows (index transform, struct-carried pair — the
    // shinglePostingsOf shape, r15): replaces the posexplode + lead()
    // window's doc-keyed exchange
    val bi = docs(s, d).filter(col("n_tokens") >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("e"))
      .select(col("doc_id"), col("e.w1").as("w1"), col("e.w2").as("w2"))
      .transform(Scale.materialize)
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cc = bi.groupBy(col("w1")).agg(count(lit(1)).as("cc"))
    bi.join(bc, Seq("w1", "w2")).join(cc, Seq("w1"))
      .select(col("doc_id"), (length(bin(col("cc"))) - length(bin(col("cb")))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bits")).as("surprisal_bits"), count(lit(1)).as("n_bigrams"))
      .withColumn("avg_centibits", expr("(100 * surprisal_bits) div n_bigrams"))
  }

  /** DSIR-style data selection (Xie et al., NeurIPS 2023 — Data Selection
    * via Importance Resampling): score every document by how much more
    * likely its hashed-bigram features are under a TARGET distribution than
    * under the raw-pool distribution, then keep the docs whose importance
    * weight is positive. The target here is the corpus' own verified
    * quality keepers ([[textQuality]] keep = 1) — the production shape
    * (target = a curated slice, pool = the crawl) with the curated slice
    * the pipeline already computes.
    *
    * The importance weight is DSIR's hashed-ngram likelihood ratio in this
    * repo's integer bit-length fixed point: with add-one smoothing,
    *   λ(f) = bitlen(ct(f)+1) + bitlen(Nq) − bitlen(cq(f)+1) − bitlen(Nt)
    * — an integer ⌊log₂⌋ surrogate of log (p_target(f)/q_raw(f)) built as a
    * SUM of bit lengths (never a product: (ct+1)·Nq would overflow BIGINT
    * on a 100 TB corpus; the sum form never exceeds 130). Exact cross-
    * engine parity: no transcendental log (the text_surprisal discipline).
    * The per-doc mean is the one signed average in the repo, so it is
    * floor(100·bits/n) computed in DOUBLE — a single correctly-rounded
    * division on exactly-representable integers — NOT integer division:
    * Spark's `div` truncates toward zero while DuckDB's `//` floors, and
    * they disagree on negative scores.
    *
    * Scale — the reason DSIR is the published answer at pretraining size:
    * the "model" is the bucket table, BOUNDED at DsirBuckets rows whatever
    * the corpus (feature hashing), so both count aggregations shuffle into
    * ≤ D groups, the λ table is broadcast, and scoring is one linear scan
    * over the bigram frame (materialized once, feeding both counts and the
    * scoring join). No corpus-sized shuffle anywhere but the per-doc sum,
    * keyed on doc_id.
    */
  val DsirBuckets = 4096L

  def sampleDsir(s: SparkSession, d: String): DataFrame = {
    val bi = docs(s, d).filter(col("n_tokens") >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(2))))).as("g"))
      .withColumn("f", hexH(concat(lit("dsir:"), col("g"))) % DsirBuckets)
      .select(col("doc_id"), col("f"))
      .transform(Scale.materialize) // feeds raw counts, target counts, scoring
    val target = textQuality(s, d).filter(col("keep") === 1).select(col("doc_id"))
    val cq = bi.groupBy(col("f")).agg(count(lit(1)).as("cq"))
    val ct = bi.join(target, Seq("doc_id"), "left_semi")
      .groupBy(col("f")).agg(count(lit(1)).as("ct"))
    // totals as a global window over the ≤ DsirBuckets-row count frame (one
    // partition of ≤ 4096 rows at ANY corpus size) — computing them as
    // separate aggregates would re-scan the bigram frame twice more
    val w0 = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lam = cq.join(ct, Seq("f"), "left_outer")
      .withColumn("nq", sum(col("cq")).over(w0))
      .withColumn("nt", sum(coalesce(col("ct"), lit(0L))).over(w0))
      .select(col("f"),
        (length(bin(coalesce(col("ct"), lit(0L)) + 1)) + length(bin(col("nq")))
          - length(bin(col("cq") + 1)) - length(bin(col("nt")))).cast("long").as("lam"))
    bi.join(broadcast(lam), "f")
      .groupBy(col("doc_id"))
      .agg(sum(col("lam")).as("dsir_bits"), count(lit(1)).as("n_feats"))
      .withColumn("avg_centibits",
        floor(col("dsir_bits").cast("double") * 100.0 / col("n_feats")).cast("long"))
      .withColumn("keep", when(col("dsir_bits") > 0, lit(1)).otherwise(lit(0)))
  }

  /** Model-based quality filtering (the GPT-3 / LLaMA pipeline stage: a
    * linear classifier over hashed bag-of-words features, fastText-shaped,
    * scoring every crawl document against a curated target): an integer
    * PERCEPTRON trained driver-side on a bounded deterministic sample,
    * labels = the rule-based [[textQuality]] keep flag (the production
    * shape distills a cheap rule — or human curation — into a model that
    * generalizes the boundary; here it also makes the model's quality
    * measurable: disagreement with the rule is visible in the output).
    *
    * Training follows the trained-quantizer precedent (knn_ivf): a
    * deterministic xxhash64-ordered sample (QmTrainSample docs), features
    * computed IN SPARK with the same portable hash the scoring expression
    * uses (no driver-side hash twin to drift), integer perceptron updates
    * in doc_id order for QmEpochs epochs — bit-exact reproducible, and the
    * trained weights embed in the generated oracle as BIGINT literals so
    * both engines score identically (everything stays integer; no float
    * boundary anywhere).
    *
    * Scale: the model is QmDim longs — a per-row literal lookup table, so
    * scoring is a shuffle-free codegen-friendly scan (Σ w[h(tok)] folded
    * per row); training I/O is one bounded sample collect. The label join
    * for the output is doc_id-keyed.
    */
  val QmDim = 256
  val QmTrainSample = 512
  val QmEpochs = 5

  final case class QmModel(w: Array[Long], b: Long)

  private val qmCache =
    new java.util.concurrent.ConcurrentHashMap[String, QmModel]()

  private def qmBucket(t: org.apache.spark.sql.Column) =
    (hexH(concat(lit("qm:"), t)) % QmDim).cast("int")

  private def qmTrain(s: SparkSession, d: String): QmModel = {
    val labels = textQuality(s, d).select(col("doc_id"), col("keep"))
    val sample = labels.orderBy(xxhash64(col("doc_id")), col("doc_id"))
      .limit(QmTrainSample)
    val feats = docs(s, d)
      .join(broadcast(sample), "doc_id")
      .select(col("doc_id"), col("keep"), explode(col("toks")).as("t"))
      .withColumn("f", qmBucket(col("t")))
      .groupBy(col("doc_id"), col("keep"), col("f"))
      .agg(count(lit(1)).as("c"))
      .collect()
    // per-doc sparse vectors, trained in doc_id order — deterministic
    val byDoc = feats.groupBy(_.getLong(0)).toArray.sortBy(_._1).map {
      case (_, rows) =>
        val y = if (rows.head.getInt(1) == 1) 1L else -1L
        (y, rows.map(r => (r.getInt(2), r.getLong(3))).sortBy(_._1))
    }
    // AVERAGED perceptron, kept integer: the decision score > 0 is
    // scale-invariant, so the "average" is the unnormalized SUM of the
    // weight vector over every training step — no division, no float.
    val w = new Array[Long](QmDim)
    val wa = new Array[Long](QmDim)
    var b = 0L
    var ba = 0L
    for (_ <- 1 to QmEpochs; (y, xs) <- byDoc) {
      var score = b
      xs.foreach { case (f, c) => score += w(f) * c }
      if (y * score <= 0L) {
        xs.foreach { case (f, c) => w(f) += y * c }
        b += y
      }
      var i = 0
      while (i < QmDim) { wa(i) += w(i); i += 1 }
      ba += b
    }
    QmModel(wa, ba)
  }

  private[graft] def qmFor(s: SparkSession, d: String): QmModel =
    qmCache.computeIfAbsent(d, _ => qmTrain(s, d))

  /** The scoring expression over a `toks` array column — shared by the
    * batch query and the streaming ingestion gate (StreamQualityGate), so
    * the gate admits exactly the rows the batch filter would keep.
    */
  private[graft] def qmScore(m: QmModel): org.apache.spark.sql.Column = {
    val wLit = typedlit(m.w.toIndexedSeq)
    aggregate(
      transform(col("toks"), t => element_at(wLit, qmBucket(t) + 1)),
      lit(m.b), (acc, x) => acc + x)
  }

  def textQualityModel(s: SparkSession, d: String): DataFrame = {
    val m = qmFor(s, d)
    docs(s, d)
      .select(col("doc_id"), qmScore(m).as("qm_score"))
      .join(textQuality(s, d).select(col("doc_id"), col("keep").as("label")), "doc_id")
      .select(col("doc_id"), col("qm_score"),
        when(col("qm_score") > 0, lit(1)).otherwise(lit(0)).as("pred"),
        col("label"))
  }

  private def qmOracleSql(m: QmModel): String = {
    val wSql = m.w.mkString("([", ",", "]::BIGINT[])")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id,
       |  CASE WHEN floor((0.4*least(1.0, CAST(len(toks) AS DOUBLE)/100.0)
       |       + 0.3*least(1.0, (CAST(${hitsSql(enStop)} AS DOUBLE)/len(toks))*5.0)
       |       + 0.3*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)))*1e4)/1e4 >= 0.5
       |    THEN 1 ELSE 0 END AS label FROM t),
       |sc AS (SELECT doc_id,
       |    ${m.b} + list_aggregate(list_transform(toks,
       |      tk -> $wSql[(${hexHSql("'qm:' || tk")} % $QmDim) + 1]), 'sum') AS qm_score
       |  FROM t)
       |SELECT sc.doc_id, CAST(qm_score AS BIGINT) AS qm_score,
       |  CASE WHEN qm_score > 0 THEN 1 ELSE 0 END AS pred, q.label
       |FROM sc JOIN q USING (doc_id)""".stripMargin
  }

  private def maybeQmOracle: Map[String, String] =
    if (qmCache.size == 1)
      Map("text_quality_model" -> qmOracleSql(qmCache.values.iterator.next()))
    else Map.empty

  /** Bloom oracle: membership restated structurally independently — the
    * benchmark's DISTINCT set-bit positions as a table, each training
    * gram's BloomK probes joined against it, flagged iff all BloomK rows
    * matched. Equivalent to the Spark side's literal-bitmap probe bit for
    * bit (the bits table IS the bitmap), false positives included; only M
    * is embedded from the build.
    */
  private def bloomOracleSql(m: Long): String = {
    import graft.functions.PortableHash.affineSql
    val probes = (0 until BloomK)
      .map(i => s"${affineSql(i, "hm")} % $m").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |raw AS (SELECT doc_id,
       |    unnest(list_transform(range(0, len(toks) - ${DecontamN - 1}),
       |      i -> array_to_string(list_slice(toks, i+1, i+$DecontamN), ' '))) AS gram
       |  FROM t WHERE len(toks) >= $DecontamN),
       |g AS (SELECT DISTINCT doc_id, gram FROM raw),
       |h AS (SELECT doc_id, gram,
       |    ${hexHSql("'bloom:' || gram")} % ${graft.functions.PortableHash.P} AS hm FROM g),
       |bpos AS (SELECT DISTINCT pos FROM (
       |    SELECT unnest([$probes]) AS pos FROM h WHERE doc_id % $BenchMod = 0)),
       |tr AS (SELECT doc_id, gram, unnest([$probes]) AS pos
       |  FROM h WHERE doc_id % $BenchMod <> 0),
       |hits AS (SELECT doc_id, gram, count(*) AS k
       |  FROM tr JOIN bpos USING (pos) GROUP BY 1, 2),
       |ng AS (SELECT doc_id, count(*) AS n_grams FROM h
       |  WHERE doc_id % $BenchMod <> 0 GROUP BY 1),
       |fl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged
       |  FROM hits WHERE k = $BloomK GROUP BY 1)
       |SELECT doc_id, n_grams, n_flagged FROM ng JOIN fl USING (doc_id)""".stripMargin
  }

  private def maybeBloomOracle: Map[String, String] =
    if (bloomCache.size == 1)
      Map("text_decontaminate_bloom" ->
        bloomOracleSql(bloomCache.values.iterator.next().m))
    else Map.empty

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_decontaminate_bloom" -> textDecontaminateBloom,
    "text_quality_model" -> textQualityModel,
    "sample_dsir" -> sampleDsir,
    "text_bigram_surprisal" -> textBigramSurprisal,
    "text_ccnet_buckets" -> textCcnetBuckets,
    "text_substr_dedup" -> textSubstrDedup,
    "text_surprisal" -> textSurprisal,
    "text_decontaminate" -> textDecontaminate,
    "text_pii_scrub" -> textPiiScrub,
    "corpus_clean" -> corpusClean,
    "corpus_pipeline" -> corpusPipeline,
    "dataset_card" -> datasetCard,
    "text_stats" -> textStats,
    "text_quality" -> textQuality,
    "text_repetition" -> textRepetition,
    "text_langid" -> textLangid,
    "text_lang_confusion" -> textLangConfusion,
    "text_signal_corr" -> textSignalCorr,
    "text_fingerprint" -> textFingerprint,
    "text_winnow_fp" -> textWinnowFp,
    "text_containment" -> textContainment,
    "text_topterms" -> textTopterms,
    "text_zipf_fit" -> textZipfFit,
    "text_heaps_law" -> textHeapsLaw,
  )

  /** Heaps'-law vocabulary-growth curve (Herdan 1960 / Heaps 1978; the
    * "how fast does the vocab still grow?" corpus-saturation audit next to
    * [[textZipfFit]]): vocabulary size at power-of-two document prefixes
    * of the corpus, in doc_id order. The cumulative-distinct question is
    * inherently sequential — solved by factoring through each term's FIRST
    * document: a term is in prefix 2^k iff bitlen(first_doc) ≤ k, so ONE
    * vocab-frame aggregate groups terms by that bit-level, docs/token
    * totals group the doc frame the same way, and the growth curve is a
    * cum-sum window over the ≤ log₂(n)-row level frame. All integer; no
    * per-prefix rescans, no corpus-sized window. Levels are doc_id
    * bit-lengths (doc_ids are dense by generation; the statistic is
    * well-defined for any ids — "prefix" then means ids below 2^k).
    */
  def textHeapsLaw(s: SparkSession, d: String): DataFrame = {
    def lvl(c: Column): Column =
      when(c === 0, 0).otherwise(length(bin(c))).cast("int")
    val dd = docs(s, d).select(col("doc_id"), col("n_tokens"))
    val dl = dd.groupBy(lvl(col("doc_id")).as("lvl"))
      .agg(count(lit(1)).as("d_docs"),
        sum(col("n_tokens").cast("long")).as("d_tokens"))
    val vocab = docs(s, d)
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("f"))
    val vl = vocab.groupBy(lvl(col("f")).as("lvl"))
      .agg(count(lit(1)).as("d_vocab"))
    val w = Window.orderBy(col("lvl")) // bounded level frame (≤ 64 rows)
    dl.join(vl, Seq("lvl"), "left_outer") // vocab levels ⊆ doc levels
      .select(col("lvl"), col("d_docs"), col("d_tokens"),
        coalesce(col("d_vocab"), lit(0L)).as("d_vocab"))
      .select(col("lvl"),
        sum(col("d_docs")).over(w).as("n_docs"),
        sum(col("d_tokens")).over(w).as("n_tokens"),
        sum(col("d_vocab")).over(w).as("vocab"))
  }

  // SQL mirrors: same normalization/tokenization, same marker lists, same
  // floor-based rounding.
  private val normSql = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
  private val toksSql = s"string_split($normSql, ' ')"
  private def hitsSql(words: Seq[String]) =
    s"len(list_filter(toks, t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t)))"

  /** text_signal_corr's oracle: the same exact-BIGINT sums (DuckDB widens to
    * HUGEINT — still exact), then the identical CASE/CAST/sqrt association
    * so the final double is bit-identical to the Spark plan's.
    */
  private def corrOracleSql: String = {
    val sigs = CorrSignals
    val pairs = for { i <- sigs.indices; j <- i + 1 until sigs.size } yield (sigs(i), sigs(j))
    val sums = sigs.map(x =>
      s"sum(CAST($x AS BIGINT)) AS s_$x, sum(CAST($x AS BIGINT)*CAST($x AS BIGINT)) AS ss_$x")
    val sps = pairs.map { case (a, b) =>
      s"sum(CAST($a AS BIGINT)*CAST($b AS BIGINT)) AS sp_${a}__$b" }
    def corr(a: String, b: String) =
      s"""CASE WHEN (n*ss_$a - s_$a*s_$a) = 0 OR (n*ss_$b - s_$b*s_$b) = 0 THEN NULL
         |  ELSE CAST(n*sp_${a}__$b - s_$a*s_$b AS DOUBLE) /
         |    sqrt(CAST(n*ss_$a - s_$a*s_$a AS DOUBLE) * CAST(n*ss_$b - s_$b*s_$b AS DOUBLE)) END""".stripMargin
    val rows = pairs.map { case (a, b) =>
      s"SELECT '$a' AS signal_a, '$b' AS signal_b, n, ${corr(a, b)} AS corr FROM g" }
      .mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |st AS (SELECT doc_id, len(toks) AS n_tokens,
       |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
       |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
       |  ${hitsSql(enStop)} AS en_hits FROM t),
       |tu AS (SELECT doc_id, unnest(toks) AS w FROM t),
       |c AS (SELECT w, count(*) AS cnt FROM tu GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM tu),
       |su AS (SELECT doc_id,
       |  (100 * CAST(sum(length(bin(nn.n)) - length(bin(cnt))) AS BIGINT)) // count(*) AS avg_centibits
       |  FROM tu JOIN c USING (w) CROSS JOIN nn GROUP BY doc_id),
       |f AS (SELECT st.doc_id, n_tokens, n_punct, n_digits, avg_centibits, en_hits
       |  FROM st JOIN su ON st.doc_id = su.doc_id),
       |g AS (SELECT count(*) AS n, ${(sums ++ sps).mkString(",\n  ")} FROM f)
       |$rows""".stripMargin
  }

  /** Winnow fingerprint postings `p(doc_id, fp)` — shared by the winnow and
    * containment oracles; same rolling hash / window-min / distinct as
    * textWinnowFp.
    */
  private lazy val winnowPostingsCte: String =
    s"""n AS (SELECT doc_id, $normSql AS norm FROM documents),
       |t AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM n),
       |h AS (SELECT doc_id, norm, toks,
       |  list_transform(toks, tk -> ${graft.functions.PortableHash.hexHSql("tk")} % $P) AS hs FROM t),
       |r AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
       |    list_transform(range(0, len(toks)-2), i ->
       |      (hs[i+1]*${WinnowB * WinnowB} + hs[i+2]*$WinnowB + hs[i+3]) % $P)
       |    ELSE [${graft.functions.PortableHash.hexHSql("norm")} % $P] END AS rh FROM h),
       |f AS (SELECT doc_id,
       |  list_distinct(list_transform(range(0, greatest(len(rh)-$WinnowW, 0)+1),
       |    j -> list_min(list_slice(rh, j+1, j+$WinnowW)))) AS fps FROM r),
       |p AS (SELECT doc_id, unnest(fps) AS fp FROM f)""".stripMargin

  /** corpus_pipeline's oracle, parametric in the near-dup pair source: the
    * driver gate plugs in the brute all-pairs jaccard, the sf1+ scale
    * attestation the postings form (identical pair set — see
    * Dedup.postingsJaccardSqlAt).
    */
  private def corpusPipelineOracleFrom(pairsSql: String): String =
    s"""WITH surv AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)),
       |np AS (SELECT DISTINCT doc_b AS doc_id FROM (
       |$pairsSql
       |)),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id, len(toks) AS n_tokens,
       |  floor((0.4*least(1.0, CAST(len(toks) AS DOUBLE)/100.0)
       |       + 0.3*least(1.0, (CAST(${hitsSql(enStop)} AS DOUBLE)/len(toks))*5.0)
       |       + 0.3*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)))*1e4)/1e4 AS quality
       | FROM t),
       |clean AS (SELECT s.doc_id, q.quality, q.n_tokens
       |  FROM surv s JOIN q ON s.doc_id = q.doc_id
       |  WHERE q.quality >= 0.5
       |    AND s.doc_id NOT IN (SELECT doc_id FROM np)),
       |c AS (SELECT doc_id, quality, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM clean),
       |sh AS (SELECT doc_id, quality, n_tokens,
       |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / ${Sampling.PackBudget}) AS BIGINT) AS shard
       |  FROM c)
       |SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  floor(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE)/count(*)*1e4)/1e4 AS mean_quality
       |FROM sh GROUP BY 1""".stripMargin

  /** sf1+ attestation oracle (see Dedup.scaleOracles). */
  def scaleOracles: Map[String, String] = Map(
    "corpus_pipeline" ->
      corpusPipelineOracleFrom(graft.operators.Dedup.postingsJaccardSqlAt(0.5)))

  def oracles: Map[String, String] = maybeQmOracle ++ maybeBloomOracle ++ Map(
    "sample_dsir" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id,
         |  floor((0.4*least(1.0, CAST(len(toks) AS DOUBLE)/100.0)
         |       + 0.3*least(1.0, (CAST(${hitsSql(enStop)} AS DOUBLE)/len(toks))*5.0)
         |       + 0.3*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)))*1e4)/1e4 AS quality
         | FROM t),
         |tgt AS (SELECT doc_id FROM q WHERE quality >= 0.5),
         |bi AS (SELECT doc_id, ${hexHSql("'dsir:' || g")} % $DsirBuckets AS f FROM
         |  (SELECT doc_id,
         |     unnest(list_transform(range(0, len(toks)-1),
         |       i -> array_to_string(list_slice(toks, i+1, i+2), ' '))) AS g
         |   FROM t WHERE len(toks) >= 2)),
         |cq AS (SELECT f, CAST(count(*) AS BIGINT) AS cq FROM bi GROUP BY 1),
         |ct AS (SELECT f, CAST(count(*) AS BIGINT) AS ct FROM bi
         |  WHERE doc_id IN (SELECT doc_id FROM tgt) GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(sum(cq) AS BIGINT) FROM cq) AS nq,
         |               (SELECT CAST(sum(ct) AS BIGINT) FROM ct) AS nt),
         |w AS (SELECT f,
         |    CAST(length(bin(coalesce(ct, 0)+1)) + length(bin(nq))
         |       - length(bin(cq+1)) - length(bin(nt)) AS BIGINT) AS lam
         |  FROM cq LEFT JOIN ct USING (f), tot)
         |SELECT doc_id, CAST(sum(lam) AS BIGINT) AS dsir_bits,
         |  count(*) AS n_feats,
         |  CAST(floor(CAST(sum(lam) AS DOUBLE) * 100.0 / count(*)) AS BIGINT) AS avg_centibits,
         |  CASE WHEN sum(lam) > 0 THEN 1 ELSE 0 END AS keep
         |FROM bi JOIN w USING (f) GROUP BY doc_id""".stripMargin,
    "text_bigram_surprisal" ->
      s"""WITH t AS (SELECT doc_id, unnest(toks) AS w1,
         |    generate_subscripts(toks, 1) AS pos
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents) x
         |  WHERE len(toks) >= 2),
         |b0 AS (SELECT doc_id, w1,
         |    lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM t),
         |bi AS (SELECT doc_id, w1, w2 FROM b0 WHERE w2 IS NOT NULL),
         |bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
         |cc AS (SELECT w1, count(*) AS cc FROM bi GROUP BY 1)
         |SELECT doc_id,
         |  CAST(sum(length(bin(cc.cc)) - length(bin(bc.cb))) AS BIGINT) AS surprisal_bits,
         |  count(*) AS n_bigrams,
         |  (100 * CAST(sum(length(bin(cc.cc)) - length(bin(bc.cb))) AS BIGINT)) // count(*) AS avg_centibits
         |FROM bi JOIN bc USING (w1, w2) JOIN cc USING (w1)
         |GROUP BY doc_id""".stripMargin,
    "text_ccnet_buckets" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |c AS (SELECT w, count(*) AS cnt FROM t GROUP BY 1),
         |nt AS (SELECT count(*) AS nn FROM t),
         |sur AS (SELECT doc_id,
         |    (100 * CAST(sum(length(bin(nn)) - length(bin(cnt))) AS BIGINT)) // count(*) AS avg_centibits
         |  FROM t JOIN c USING (w) CROSS JOIN nt GROUP BY doc_id),
         |x AS (SELECT d.doc_id, d.lang, sur.avg_centibits
         |  FROM documents d JOIN sur ON d.doc_id = sur.doc_id),
         |b AS (SELECT doc_id, lang, avg_centibits,
         |    ntile($TierBuckets) OVER (PARTITION BY lang ORDER BY avg_centibits, doc_id) AS bucket
         |  FROM x)
         |SELECT doc_id, lang, avg_centibits, bucket,
         |  CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
         |FROM b""".stripMargin,
    "text_substr_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |b AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t WHERE len(toks) >= $SubstrK),
         |w AS (SELECT doc_id, n_tokens,
         |    unnest(range(0, n_tokens - ${SubstrK - 1})) AS pos,
         |    unnest(list_transform(range(0, n_tokens - ${SubstrK - 1}),
         |      i -> array_to_string(list_slice(toks, i+1, i+$SubstrK), ' '))) AS gram
         |  FROM b),
         |o AS (SELECT doc_id, n_tokens, pos, count(*) OVER (PARTITION BY gram) AS occ FROM w),
         |dw AS (SELECT doc_id, n_tokens, pos FROM o WHERE occ > 1),
         |agg AS (SELECT doc_id, n_tokens, count(*) AS dup_windows FROM dw GROUP BY 1, 2),
         |cov AS (SELECT doc_id, count(DISTINCT tpos) AS covered FROM
         |  (SELECT doc_id, unnest(range(pos, pos + $SubstrK)) AS tpos FROM dw) GROUP BY 1)
         |SELECT doc_id, n_tokens, dup_windows, covered,
         |  floor(CAST(covered AS DOUBLE) / n_tokens * 1e4)/1e4 AS dup_frac
         |FROM agg JOIN cov USING (doc_id)""".stripMargin,
    "text_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |raw AS (SELECT doc_id,
         |    unnest(list_transform(range(0, len(toks) - ${DecontamN - 1}),
         |      i -> array_to_string(list_slice(toks, i+1, i+$DecontamN), ' '))) AS gram
         |  FROM t WHERE len(toks) >= $DecontamN),
         |g AS (SELECT DISTINCT doc_id, gram FROM raw),
         |bench AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % $BenchMod = 0),
         |train AS (SELECT * FROM g WHERE doc_id % $BenchMod <> 0)
         |SELECT doc_id, count(*) AS n_hits, count(DISTINCT bench_id) AS n_bench_docs
         |FROM train JOIN bench USING (gram) GROUP BY 1""".stripMargin,
    "text_pii_scrub" ->
      s"""WITH t AS (SELECT doc_id, $normSql AS norm FROM documents)
         |SELECT doc_id,
         | len(regexp_extract_all(norm, '$emailRe')) AS n_emails,
         | len(regexp_extract_all(norm, '$digitsRe')) AS n_digit_runs,
         | md5(regexp_replace(regexp_replace(norm, '$emailRe', '<EMAIL>', 'g'),
         |     '$digitsRe', '<NUM>', 'g')) AS scrubbed_fp
         |FROM t""".stripMargin,
    "corpus_pipeline" -> corpusPipelineOracleFrom(graft.operators.Dedup.jaccardOracleSql),
    "corpus_clean" ->
      s"""WITH survivors AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)),
         |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id,
         |  floor((0.4*least(1.0, CAST(len(toks) AS DOUBLE)/100.0)
         |       + 0.3*least(1.0, (CAST(${hitsSql(enStop)} AS DOUBLE)/len(toks))*5.0)
         |       + 0.3*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)))*1e4)/1e4 AS quality
         | FROM t)
         |SELECT s.doc_id, q.quality FROM survivors s JOIN q ON s.doc_id = q.doc_id
         |WHERE q.quality >= 0.5""".stripMargin,
    "dataset_card" ->
      s"""WITH t AS (SELECT doc_id, lang, $normSql AS norm, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id, lang, len(toks) AS n_tokens, md5(norm) AS fp,
         |  floor((0.4*least(1.0, CAST(len(toks) AS DOUBLE)/100.0)
         |       + 0.3*least(1.0, (CAST(${hitsSql(enStop)} AS DOUBLE)/len(toks))*5.0)
         |       + 0.3*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)))*1e4)/1e4 AS quality
         | FROM t),
         |g AS (SELECT fp, count(*) AS n_in_group FROM q GROUP BY 1)
         |SELECT lang, count(*) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         | CAST(sum(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         | CAST(sum(CASE WHEN n_in_group > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         | floor(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE)/count(*)*1e4)/1e4 AS mean_quality
         |FROM q JOIN g ON q.fp = g.fp GROUP BY 1""".stripMargin,
    "text_signal_corr" -> corrOracleSql,
    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
         |SELECT doc_id, len(toks) AS n_tokens, length(text) AS n_chars_raw,
         | len(regexp_extract_all($normSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subtokens,
         | floor(CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
         |       / len(toks) * 1e4) / 1e4 AS avg_word_len,
         | length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         | length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
         |FROM t""".stripMargin,
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t WHERE len(toks) >= 3),
         |b2 AS (SELECT doc_id, n_tokens,
         |    unnest(list_transform(range(0, len(toks)-1),
         |      i -> array_to_string(list_slice(toks, i+1, i+2), ' '))) AS g
         |  FROM base),
         |c2 AS (SELECT doc_id, n_tokens, g, count(*) AS c FROM b2 GROUP BY 1,2,3),
         |a2 AS (SELECT doc_id, n_tokens, max(c) AS top2_cnt,
         |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup2_occ
         |  FROM c2 GROUP BY 1,2),
         |b3 AS (SELECT doc_id, n_tokens,
         |    unnest(list_transform(range(0, len(toks)-2),
         |      i -> array_to_string(list_slice(toks, i+1, i+3), ' '))) AS g
         |  FROM base),
         |c3 AS (SELECT doc_id, n_tokens, g, count(*) AS c FROM b3 GROUP BY 1,2,3),
         |a3 AS (SELECT doc_id, max(c) AS top3_cnt,
         |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup3_occ
         |  FROM c3 GROUP BY 1),
         |m AS (SELECT a2.doc_id, n_tokens,
         |  floor(CAST(top2_cnt AS DOUBLE)*2 / n_tokens * 1e4)/1e4 AS top2_frac,
         |  floor(CAST(top3_cnt AS DOUBLE)*3 / n_tokens * 1e4)/1e4 AS top3_frac,
         |  floor(CAST(dup2_occ AS DOUBLE) / (n_tokens-1) * 1e4)/1e4 AS dup2_frac,
         |  floor(CAST(dup3_occ AS DOUBLE) / (n_tokens-2) * 1e4)/1e4 AS dup3_frac
         | FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id)
         |SELECT doc_id, n_tokens, top2_frac, top3_frac, dup2_frac, dup3_frac,
         | CASE WHEN top2_frac <= 0.20 AND dup3_frac <= 0.30 THEN 1 ELSE 0 END AS keep
         |FROM m""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id,
         |  least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) AS len_score,
         |  CAST(${hitsSql(enStop)} AS DOUBLE) / len(toks) AS stop_ratio,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
         | FROM t),
         |sc AS (SELECT doc_id, len_score, stop_ratio, uniq_ratio,
         |  floor((0.4*len_score + 0.3*least(1.0, stop_ratio*5.0) + 0.3*uniq_ratio)*1e4)/1e4 AS quality
         | FROM q)
         |SELECT doc_id, floor(len_score*1e4)/1e4 AS len_score,
         | floor(stop_ratio*1e4)/1e4 AS stop_ratio,
         | floor(uniq_ratio*1e4)/1e4 AS uniq_ratio, quality,
         | CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END AS keep
         |FROM sc""".stripMargin,
    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, lang,
         |  ${hitsSql(enStop)} AS en_hits, ${hitsSql(esStop)} AS es_hits,
         |  ${hitsSql(deStop)} AS de_hits, ${hitsSql(frStop)} AS fr_hits
         | FROM t)
         |SELECT doc_id, lang,
         | CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
         |      WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
         |      WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang,
         | en_hits, es_hits, de_hits, fr_hits
         |FROM h""".stripMargin,
    "text_lang_confusion" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, lang,
         |  ${hitsSql(enStop)} AS en_hits, ${hitsSql(esStop)} AS es_hits,
         |  ${hitsSql(deStop)} AS de_hits, ${hitsSql(frStop)} AS fr_hits
         | FROM t),
         |p AS (SELECT lang,
         | CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
         |      WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
         |      WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang
         | FROM h),
         |cm AS (SELECT lang, pred_lang, count(*) AS n_docs FROM p GROUP BY 1, 2),
         |tt AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS truth_total
         |  FROM cm GROUP BY 1)
         |SELECT cm.lang, pred_lang, n_docs, truth_total,
         |  (n_docs * CAST(1000000 AS BIGINT)) // truth_total AS share_ppm,
         |  CASE WHEN cm.lang = pred_lang THEN 1 ELSE 0 END AS is_correct
         |FROM cm JOIN tt ON cm.lang = tt.lang""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, md5($normSql) AS fp,
         | greatest(len($toksSql) - 2, 0) AS n_shingles
         |FROM documents""".stripMargin,
    "text_winnow_fp" ->
      s"""WITH $winnowPostingsCte
         |SELECT doc_id, fp FROM p""".stripMargin,
    "text_containment" ->
      s"""WITH $winnowPostingsCte,
         |pk AS (SELECT doc_id, fp FROM (
         |  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM p)
         |  WHERE df <= $MaxFpDf),
         |sz AS (SELECT doc_id, count(*) AS nfp FROM pk GROUP BY 1),
         |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM pk a JOIN pk b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |c AS (SELECT doc_a, doc_b, shared,
         |    CAST(shared AS DOUBLE) / least(sa.nfp, sb.nfp) AS containment
         |  FROM sh JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, shared, floor(containment*1e4)/1e4 AS containment
         |FROM c WHERE containment >= $ContainmentTau""".stripMargin,
    "text_surprisal" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |c AS (SELECT w, count(*) AS cnt FROM t GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM t)
         |SELECT doc_id,
         |  CAST(sum(length(bin(n)) - length(bin(cnt))) AS BIGINT) AS surprisal_bits,
         |  count(*) AS n_toks,
         |  (100 * CAST(sum(length(bin(n)) - length(bin(cnt))) AS BIGINT)) // count(*) AS avg_centibits
         |FROM t JOIN c USING (w) CROSS JOIN n
         |GROUP BY doc_id""".stripMargin,
    "text_topterms" ->
      s"""WITH t AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |g AS (SELECT source, term, count(*) AS n FROM t GROUP BY 1, 2),
         |r AS (SELECT source, term, n,
         |  row_number() OVER (PARTITION BY source ORDER BY n DESC, term) AS rnk FROM g)
         |SELECT source, term, n, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "text_zipf_fit" ->
      s"""WITH t AS (SELECT unnest($toksSql) AS w FROM documents),
         |g AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
         |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rnk FROM g),
         |p AS (SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS x,
         |    CAST(length(bin(n)) - 1 AS BIGINT) AS y
         |  FROM r WHERE rnk <= ${ZipfTopN}),
         |m AS (SELECT CAST(count(*) AS HUGEINT) AS cnt,
         |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(x*y) AS HUGEINT) AS sxy, CAST(sum(x*x) AS HUGEINT) AS sxx
         |  FROM p),
         |s AS (SELECT CAST(cnt AS BIGINT) AS n_terms,
         |    CAST(cnt*sxy - sx*sy AS DOUBLE) / CAST(cnt*sxx - sx*sx AS DOUBLE) AS slope,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         |  FROM m)
         |SELECT n_terms, slope, (syd - slope * sxd) / n_terms AS intercept
         |FROM s""".stripMargin,
    "text_heaps_law" ->
      s"""WITH dd AS (SELECT doc_id, len($toksSql) AS n_tokens FROM documents),
         |dl AS (SELECT CASE WHEN doc_id = 0 THEN 0
         |      ELSE CAST(length(bin(doc_id)) AS INT) END AS lvl,
         |    count(*) AS d_docs, CAST(sum(n_tokens) AS BIGINT) AS d_tokens
         |  FROM dd GROUP BY 1),
         |t AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |vocab AS (SELECT w, min(doc_id) AS f FROM t GROUP BY 1),
         |vl AS (SELECT CASE WHEN f = 0 THEN 0
         |      ELSE CAST(length(bin(f)) AS INT) END AS lvl,
         |    count(*) AS d_vocab
         |  FROM vocab GROUP BY 1),
         |g AS (SELECT dl.lvl, dl.d_docs, dl.d_tokens,
         |    coalesce(vl.d_vocab, 0) AS d_vocab
         |  FROM dl LEFT JOIN vl ON dl.lvl = vl.lvl)
         |SELECT lvl, CAST(sum(d_docs) OVER cw AS BIGINT) AS n_docs,
         |  CAST(sum(d_tokens) OVER cw AS BIGINT) AS n_tokens,
         |  CAST(sum(d_vocab) OVER cw AS BIGINT) AS vocab
         |FROM g WINDOW cw AS (ORDER BY lvl)""".stripMargin,
  )
}
