package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash.{hexH, hexHSql}
import graft.functions.TextFunctions.detRound

/** Reproducible sampling + featurization for training-data pipelines.
  *
  * Sampling by hash threshold (not `rand()`): membership is a pure function
  * of the row key, so the sample is identical across runs, engines, and
  * cluster layouts — the property a training pipeline needs for exact
  * re-materialization. Per-row ops, shuffle-free.
  */
object Sampling {

  /** ~`permille`/1000 of rows per stratum, keyed by a deterministic hash of
    * the row id; stratum column rides along for per-stratum rate checks.
    */
  def sampleStratified(s: SparkSession, d: String, permille: Int = 200): DataFrame =
    Tables.documents(s, d)
      .filter(hexH(concat(lit("sample:"), col("doc_id"))) % 1000 < permille)
      .select(col("doc_id"), col("lang"), col("source"))

  /** Hashing-trick document embedding: 64 buckets of token counts,
    * L2-normalized — the cheap featurizer that connects the text pack to
    * the vector ops (its output shape is exactly the embeddings table's).
    * Emitted as exploded (doc_id, dim, weight) rows with weight > 0 —
    * scalar columns hash-compare robustly and the sparse form is what a
    * feature store keeps anyway.
    */
  val EmbedDim = 64
  def textHashEmbed(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("dim", (hexH(col("tok")) % EmbedDim).cast("int"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).cast("double").as("c"))
    val norm = counts.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("c") * col("c"))).as("l2"))
    counts.join(norm, "doc_id")
      .select(col("doc_id"), col("dim"),
        (floor(col("c") / col("l2") * 1e6) / 1e6).as("weight"))
  }

  /** Deterministic train/val/test split — the assignment every training
    * pipeline must reproduce exactly: bucket = portable hash of the doc id
    * in [0,100); train < 80 ≤ val < 90 ≤ test. Pure per-row function of the
    * key (identical across runs/engines/partitionings, stable under corpus
    * growth: adding docs never moves an existing doc's split). Summarized
    * per (split, lang) for the driver check.
    */
  def sampleSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = hexH(concat(lit("split:"), col("doc_id"))) % 100
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise(lit("test")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("source")).as("n_sources"))
  }

  /** Token-budget shard packing — the document-granularity half of sequence
    * packing: walk the corpus in doc_id order, accumulate token counts, cut
    * a new training shard every `PackBudget` tokens. shard = floor(tokens
    * before this doc / budget), so a doc straddling a boundary starts the
    * next shard. The running total uses `Scale.prefixSum` (two-phase
    * parallel scan): a naive `sum() OVER (ORDER BY doc_id)` sorts the whole
    * corpus on one reducer; here sorts are bucket-local and only one tiny
    * row per bucket is global. Output is the per-shard manifest.
    */
  val PackBudget = 2000L

  def corpusPack(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
    Scale.prefixSum(docs, "doc_id", "n_tokens")
      .withColumn("shard", floor((col("cum") - col("n_tokens")) / PackBudget))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Target training mixture by language, in permille — the published
    * practice (Pile / DoReMi-style domain weights) of re-weighting a
    * crawled corpus toward a chosen mixture at sampling time.
    */
  val MixTarget: Seq[(String, Long)] =
    Seq("en" -> 500L, "de" -> 150L, "es" -> 150L, "fr" -> 100L, "zh" -> 100L)

  /** Deterministic mixture resampling: accept each doc with a per-language
    * rate so the SAMPLE approaches the target mixture, scaled so the most
    * over-demanded language (max weight/available ratio) is consumed fully
    * (no upsampling — rates are capped at 1 by construction). Acceptance is
    * a pure hash of the doc id compared by INTEGER cross-multiplication —
    * (h % 1e6)·w_b·n_l < w_l·n_b·1e6 — so no float-division boundary can
    * disagree between engines, and membership is stable across runs and
    * cluster layouts.
    *
    * Scale: one 5-row aggregate (partial map-side) to count languages, a
    * 1-row binding selection, then a broadcast join + per-row filter —
    * scan-parallel at any corpus size.
    */
  def sampleMixture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val rates = counts.join(MixTarget.toDF("lang", "w"), "lang")
    val binding = rates
      .orderBy((col("w").cast("double") / col("n")).desc, col("lang"))
      .limit(1)
      .select(col("w").as("wb"), col("n").as("nb"))
    docs.join(broadcast(rates), "lang")
      .join(broadcast(binding))
      .filter(
        (hexH(concat(lit("mix:"), col("doc_id"))) % 1000000L) * (col("wb") * col("n"))
          < col("w") * col("nb") * 1000000L)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Temperature-flattened language resampling (the mT5 / UniMax
    * multilingual practice): keep each language with probability chosen so
    * the sample's language distribution ∝ n_l^(1/T), T = 2 — rare
    * languages keep everything, dominant ones are downsampled toward the
    * flattened share. Target weight w_l = ⌊√n_l⌋: IEEE-754 requires sqrt
    * to be CORRECTLY ROUNDED (unlike log/exp), so ⌊sqrt⌋ of a count is
    * engine-exact — the one transcendental-adjacent function this repo's
    * parity discipline permits. Rates scale so the most over-demanded
    * language is fully consumed (rate 1, no upsampling) and acceptance is
    * the same integer cross-multiplication as [[sampleMixture]] — no
    * float-division boundary, membership stable across runs and layouts.
    * Output: per-language kept counts against the originals (the rate
    * table a pipeline records next to the sampled corpus).
    *
    * Scale: identical to sampleMixture — a language-count aggregate, a
    * 1-row binding selection, broadcast join + per-row filter, then the
    * same 5-row rollup.
    */
  val Temp = 2

  def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val rates = counts
      .withColumn("w", floor(sqrt(col("n").cast("double"))).cast("long"))
    val binding = rates
      .orderBy((col("w").cast("double") / col("n")).desc, col("lang"))
      .limit(1).select(col("w").as("wb"), col("n").as("nb"))
    val kept = docs.join(broadcast(rates), "lang")
      .join(broadcast(binding))
      .filter(
        (hexH(concat(lit("temp:"), col("doc_id"))) % 1000000L) * (col("wb") * col("n"))
          < col("w") * col("nb") * 1000000L)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    counts.join(kept, Seq("lang"), "left_outer")
      .select(col("lang"), col("n").as("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (floor(coalesce(col("n_kept"), lit(0L)).cast("double") / col("n") * 1e4) / 1e4)
          .as("kept_rate"))
  }

  /** One-pass Poisson-bootstrap error bars on a corpus metric — the
    * web-scale answer to "how certain is this dashboard number": a classic
    * bootstrap redraws the corpus R times (R full passes, or a
    * non-distributable multinomial); the Poisson approximation gives every
    * doc an independent Poisson(1) replicate weight, so ALL R replicates
    * materialize in one scan as an explode(×R) and the estimator's spread
    * falls out of a groupBy. Here: per-language mean quality with its
    * bootstrap standard error.
    *
    * Engine-exact by the repo's integer discipline: replicate weights come
    * from inverse-CDF lookup of the r-th affine portable hash against
    * PRECOMPUTED integer thresholds floor(cdf_k·P) (truncated at w ≤ 8,
    * residual mass ~1e-5 — a deterministic convention, not a rounding
    * hazard), quality re-enters as exact q4 = round(quality·1e4) LONGs, and
    * every replicate mean is ONE correctly-rounded division of exact
    * integers. The only float folds are over the R=16 SORTED replicate
    * means — sequential left-to-right in BOTH engines (Spark `aggregate`
    * with 0.0 init ≡ DuckDB `list_reduce` seeded by the first element,
    * identical because 0.0 + x = x exactly), so variance and sqrt are
    * bit-identical.
    *
    * Scale: explode ×R then ONE shuffle to (lang, r) — R·corpus rows of
    * three scalar columns on the wire, partial-aggregated map-side; the
    * fold frame is #langs × R rows. No resampling passes, no per-replicate
    * jobs.
    */
  val BootReps = 16

  /** Poisson(1) CDF thresholds in the hash field [0, P): w(u) = #{k : u ≥ t_k}. */
  private val poisThresholds: IndexedSeq[Long] = {
    var pmf = math.exp(-1.0)
    var cdf = pmf
    (0 until 8).map { k =>
      val t = math.floor(cdf * graft.functions.PortableHash.P).toLong
      pmf /= (k + 1); cdf += pmf
      t
    }
  }

  def statsBootstrap(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PortableHash.{P, coefs}
    val q = TextQueries.textQuality(s, d).select(col("doc_id"), col("quality"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang"),
        floor(col("quality") * 1e4 + 0.5).cast("long").as("q4"),
        (hexH(concat(lit("bs:"), col("doc_id"))) % P).as("hm"))
      .transform(Scale.materialize) // feeds the point estimate AND the replicate frame
    val aLit = typedlit((0 until BootReps).map(i => coefs(i)._1))
    val bLit = typedlit((0 until BootReps).map(i => coefs(i)._2))
    val g = q
      .select(col("lang"), col("q4"), col("hm"),
        explode(sequence(lit(0), lit(BootReps - 1))).as("r"))
      .withColumn("u",
        (element_at(aLit, col("r") + 1) * col("hm") + element_at(bLit, col("r") + 1)) % P)
      .withColumn("w",
        poisThresholds.map(t => when(col("u") >= t, lit(1L)).otherwise(lit(0L)))
          .reduce(_ + _))
      .groupBy(col("lang"), col("r"))
      .agg(sum(col("w") * col("q4")).as("sr"), sum(col("w")).as("wr"))
      .withColumn("m", col("sr").cast("double") / col("wr"))
    val folded = g.groupBy(col("lang"))
      .agg(sort_array(collect_list(struct(col("r"), col("m")))).as("ms"))
      .withColumn("marr", transform(col("ms"), x => x.getField("m")))
      .select(col("lang"),
        aggregate(col("marr"), lit(0.0), (a, x) => a + x).as("sm"),
        aggregate(col("marr"), lit(0.0), (a, x) => a + x * x).as("sm2"))
    val point = q.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("q4")).as("sq"))
    point.join(folded, "lang")
      .select(col("lang"), col("n_docs"),
        (col("sq").cast("double") / col("n_docs") / lit(1e4)).as("mean_q"),
        (sqrt(greatest(
          (col("sm2") - col("sm") * col("sm") / lit(BootReps.toDouble))
            / lit((BootReps - 1).toDouble),
          lit(0.0))) / lit(1e4)).as("boot_std"))
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): the provably
    * near-optimal weighted sample for SUBSET-SUM estimation — the "how many
    * tokens does this slice hold" question a training-mix planner asks of a
    * 100 TB corpus it cannot afford to scan per query. Each doc draws
    * priority q = w/u with u = (h+1)/2^60 off the portable hash; the top-k
    * by q are the sample, τ = q₍k+₁₎, and Σ max(w, τ) over the sample is an
    * unbiased estimate of Σw for ANY weight-subset — here audited per
    * source against the exact character totals.
    *
    * Determinism discipline: q is ONE double product then ONE division of
    * exactly-convertible integers — both engines produce identical doubles,
    * and (q desc, doc_id) is a total order. The estimator is rewritten
    * Σ_{w>τ} w + |{w ≤ τ}|·τ — an INTEGER sum plus a single product, so no
    * float summation order exists to diverge. Groups smaller than k+1 take
    * τ = 0 and the estimate degenerates to the exact total.
    *
    * Scale: top-(k+1) per source via the two-phase [[Scale.topKPerGroup]]
    * (no source-sized sort partition); everything downstream is k·sources
    * rows. One corpus scan, one bounded shuffle.
    */
  val PriK = 16
  private val PriSpace = math.pow(2.0, 60)

  def samplePriority(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        hexH(concat(lit("pri:"), col("doc_id"))).as("h"))
      .withColumn("q", (col("n_chars").cast("double") * lit(PriSpace))
        / (col("h") + 1).cast("double"))
    val top = Scale.topKPerGroup(docs, Seq("source"),
      Seq(col("q").desc, col("doc_id")), PriK + 1, saltSrc = col("doc_id"))
    val tau = top.filter(col("rnk") === PriK + 1)
      .select(col("source"), col("q").as("tau"))
    val sample = top.filter(col("rnk") <= PriK)
      .join(tau, Seq("source"), "left")
      .withColumn("tau", coalesce(col("tau"), lit(0.0)))
    val est = sample.groupBy(col("source"), col("tau"))
      .agg(count(lit(1)).as("n_sample"),
        sum(when(col("n_chars").cast("double") > col("tau"), col("n_chars"))
          .otherwise(0L)).as("_wgt"),
        sum(when(col("n_chars").cast("double") > col("tau"), 0L)
          .otherwise(1L)).as("_nle"))
      .withColumn("est_chars",
        col("_wgt").cast("double") + col("_nle").cast("double") * col("tau"))
    val exact = Tables.documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("exact_chars"))
    est.join(exact, "source")
      .select(col("source"), col("n_docs"), col("n_sample"),
        detRound(col("tau"), 4).as("tau_r"),
        col("exact_chars"),
        detRound(col("est_chars"), 2).as("est_chars"),
        detRound(abs(col("est_chars") - col("exact_chars").cast("double"))
          / col("exact_chars").cast("double") * lit(1e6), 0).as("err_ppm"))
  }

  private def priorityOracleSql: String = {
    val h = hexHSql("'pri:' || doc_id")
    val space = {
      val t = PriSpace.toString
      if (t.contains("E") || t.contains("e")) t else t + "e0"
    }
    s"""WITH dq AS (SELECT source, doc_id, n_chars,
       |    (CAST(n_chars AS DOUBLE) * ($space))
       |      / CAST(($h) + 1 AS DOUBLE) AS q
       |  FROM documents),
       |rk AS (SELECT *, row_number() OVER (
       |    PARTITION BY source ORDER BY q DESC, doc_id) AS rnk FROM dq),
       |tau AS (SELECT source, q AS tau FROM rk WHERE rnk = ${PriK + 1}),
       |sm AS (SELECT rk.source, n_chars, coalesce(tau, 0e0) AS tau
       |  FROM rk LEFT JOIN tau ON rk.source = tau.source
       |  WHERE rnk <= $PriK),
       |est AS (SELECT source, tau, count(*) AS n_sample,
       |    CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) > tau THEN n_chars
       |      ELSE 0 END) AS BIGINT) AS wgt,
       |    CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) > tau THEN 0
       |      ELSE 1 END) AS BIGINT) AS nle
       |  FROM sm GROUP BY 1, 2),
       |est2 AS (SELECT source, tau, n_sample,
       |    CAST(wgt AS DOUBLE) + CAST(nle AS DOUBLE) * tau AS est_chars
       |  FROM est),
       |ex AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS exact_chars
       |  FROM documents GROUP BY 1)
       |SELECT est2.source, n_docs, n_sample,
       |  floor(tau * 1e4) / 1e4 AS tau_r,
       |  exact_chars,
       |  floor(est_chars * 1e2) / 1e2 AS est_chars,
       |  floor((abs(est_chars - CAST(exact_chars AS DOUBLE))
       |    / CAST(exact_chars AS DOUBLE) * 1e6) * 1e0) / 1e0 AS err_ppm
       |FROM est2 JOIN ex ON est2.source = ex.source""".stripMargin
  }

  // ------------------------------------------------------------- chunking
  /** Fixed-window token chunking with overlap — the context-length
    * shaping pass between cleaning and packing in an LLM data pipeline:
    * every document splits into [[ChunkW]]-token windows starting every
    * [[ChunkS]] tokens (overlap = W−S), the last window short by
    * construction. Output is the chunk MANIFEST (doc, chunk index, token
    * span) — offsets into the tokenization, so downstream stages slice
    * lazily instead of materializing duplicated text bytes (at 100 TB the
    * W−S overlap would otherwise re-write ~25% of the corpus).
    *
    * Scale: pure map-side — one `sequence` explode per document, no
    * shuffle at all; output rows ≈ n_tokens/S per doc.
    */
  val ChunkW = 64
  val ChunkS = 48

  def corpusChunk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n"))
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0L), col("n") - 1L, lit(ChunkS.toLong)))
          .as("tok_lo"))
      .select(col("doc_id"),
        expr(s"tok_lo div $ChunkS").as("chunk_idx"),
        col("tok_lo"),
        least(col("tok_lo") + ChunkW.toLong, col("n")).as("tok_hi"))
      .withColumn("n_toks", col("tok_hi") - col("tok_lo"))

  private def chunkOracleSql: String =
    s"""WITH n AS (SELECT doc_id, CAST(len(string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '))
       |    AS BIGINT) AS n
       |  FROM documents),
       |c AS (SELECT doc_id, n, i AS tok_lo
       |  FROM n, unnest(range(0, n, $ChunkS)) AS u(i))
       |SELECT doc_id, tok_lo // $ChunkS AS chunk_idx, tok_lo,
       |  least(tok_lo + $ChunkW, n) AS tok_hi,
       |  least(tok_lo + $ChunkW, n) - tok_lo AS n_toks
       |FROM c""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_chunk" -> corpusChunk,
    "sample_priority" -> samplePriority,
    "stats_bootstrap" -> statsBootstrap,
    "sample_stratified" -> ((s: SparkSession, d: String) => sampleStratified(s, d, 200)),
    "sample_temperature" -> sampleTemperature,
    "sample_mixture" -> sampleMixture,
    "sample_split" -> sampleSplit,
    "text_hash_embed" -> textHashEmbed,
    "corpus_pack" -> corpusPack,
  )

  /** stats_bootstrap oracle: same integer thresholds, same affine family,
    * same fold order (list_reduce seeded by the first element ≡ Spark's
    * 0.0-seeded aggregate, since 0.0 + x = x exactly).
    */
  private def bootstrapOracleSql: String = {
    import graft.functions.PortableHash.{P, coefs}
    val enStop = graft.functions.TextFunctions.enStop
    val aArr = (0 until BootReps).map(i => coefs(i)._1).mkString("[", ",", "]")
    val bArr = (0 until BootReps).map(i => coefs(i)._2).mkString("[", ",", "]")
    val wSum = poisThresholds
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, lang,
       |    string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |q AS (SELECT doc_id, lang,
       |    floor((0.4*least(1.0, CAST(len(toks) AS DOUBLE)/100.0)
       |      + 0.3*least(1.0, (CAST(len(list_filter(toks, tk -> list_contains([${enStop.map("'" + _ + "'").mkString(",")}], tk))) AS DOUBLE)/len(toks))*5.0)
       |      + 0.3*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)))*1e4)/1e4 AS quality
       |  FROM t),
       |q2 AS (SELECT lang, CAST(floor(quality*1e4 + 0.5) AS BIGINT) AS q4,
       |    ${hexHSql("'bs:' || doc_id")} % $P AS hm FROM q),
       |rep AS (SELECT lang, q4, hm, unnest(range(0, $BootReps)) AS r FROM q2),
       |uu AS (SELECT lang, q4, r,
       |    ($aArr[r+1] * hm + $bArr[r+1]) % $P AS u FROM rep),
       |ww AS (SELECT lang, q4, r, $wSum AS w FROM uu),
       |g AS (SELECT lang, r, CAST(sum(w*q4) AS BIGINT) AS sr,
       |    CAST(sum(w) AS BIGINT) AS wr FROM ww GROUP BY 1, 2),
       |m AS (SELECT lang, r, CAST(sr AS DOUBLE)/wr AS m FROM g),
       |f AS (SELECT lang, list(m ORDER BY r) AS marr FROM m GROUP BY 1),
       |s AS (SELECT lang,
       |    list_reduce(marr, (a, x) -> a + x) AS sm,
       |    list_reduce(list_transform(marr, x -> x*x), (a, x) -> a + x) AS sm2
       |  FROM f),
       |p AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(q4) AS BIGINT) AS sq FROM q2 GROUP BY 1)
       |SELECT p.lang, n_docs,
       |  CAST(sq AS DOUBLE) / n_docs / 1e4 AS mean_q,
       |  sqrt(greatest((sm2 - sm * sm / $BootReps.0) / ${BootReps - 1}.0, 0.0)) / 1e4 AS boot_std
       |FROM p JOIN s ON p.lang = s.lang""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "corpus_chunk" -> chunkOracleSql,
    "sample_priority" -> priorityOracleSql,
    "stats_bootstrap" -> bootstrapOracleSql,
    "sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${hexHSql("'sample:' || doc_id")} % 1000 < 200""".stripMargin,
    "sample_mixture" ->
      s"""WITH w(lang, w) AS (VALUES ${MixTarget.map { case (l, p) => s"('$l', CAST($p AS BIGINT))" }.mkString(", ")}),
         |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         |j AS (SELECT w.lang, w.w, n.n FROM w JOIN n USING (lang)),
         |b AS (SELECT w AS wb, n AS nb FROM j
         |  ORDER BY CAST(w AS DOUBLE)/n DESC, lang LIMIT 1)
         |SELECT doc_id, d.lang, source FROM documents d JOIN j ON d.lang = j.lang, b
         |WHERE (${hexHSql("'mix:' || doc_id")} % 1000000) * (wb * j.n)
         |  < j.w * nb * 1000000""".stripMargin,
    "sample_temperature" ->
      s"""WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         |j AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM n),
         |b AS (SELECT w AS wb, n AS nb FROM j
         |  ORDER BY CAST(w AS DOUBLE)/n DESC, lang LIMIT 1),
         |k AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
         |  FROM documents d JOIN j ON d.lang = j.lang, b
         |  WHERE (${hexHSql("'temp:' || doc_id")} % 1000000) * (wb * j.n)
         |    < j.w * nb * 1000000
         |  GROUP BY 1)
         |SELECT j.lang, j.n AS n_docs, coalesce(k.n_kept, 0) AS n_kept,
         |  floor(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / j.n * 1e4)/1e4 AS kept_rate
         |FROM j LEFT JOIN k USING (lang)""".stripMargin,
    "sample_split" ->
      s"""WITH b AS (SELECT doc_id, lang, source,
         |    ${hexHSql("'split:' || doc_id")} % 100 AS bucket FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         | lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources
         |FROM b GROUP BY 1, 2""".stripMargin,
    "text_hash_embed" ->
      s"""WITH t AS (SELECT doc_id,
         |    unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS tok
         |  FROM documents),
         |c AS (SELECT doc_id, CAST(${hexHSql("tok")} % $EmbedDim AS INT) AS dim,
         |    CAST(count(*) AS DOUBLE) AS c
         |  FROM t GROUP BY 1, 2),
         |n AS (SELECT doc_id, sqrt(sum(c*c)) AS l2 FROM c GROUP BY 1)
         |SELECT c.doc_id, dim, floor(c / l2 * 1e6) / 1e6 AS weight
         |FROM c JOIN n ON c.doc_id = n.doc_id""".stripMargin,
    // the oracle states the packing as the plain global running sum the
    // two-phase prefixSum is proven equivalent to
    "corpus_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t),
         |sh AS (SELECT doc_id, n_tokens, CAST(floor(CAST(cum - n_tokens AS DOUBLE) / $PackBudget) AS BIGINT) AS shard FROM c)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         | min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM sh GROUP BY 1""".stripMargin,
  )
}
