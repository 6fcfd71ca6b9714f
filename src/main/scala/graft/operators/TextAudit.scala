package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens

/** Corpus hygiene audits over `documents` — the checks a training-data
  * pipeline runs BEFORE spending tokenizer/training compute: byte/encoding
  * sanity, within-document lexical diversity, and top-n-gram mass
  * concentration (the memorization/duplication pressure signal). All
  * statistics are exact integers or floor-ppm ratios (one truncated
  * division in the final projection), so DuckDB restates them bit for
  * bit; regex classes are plain byte ranges that mean the same thing to
  * Java regex and RE2.
  *
  * Reference role: the CDC reference ships raw text onward unchecked
  * (cdc_processor.py forwards payloads as-is); these are the audits the
  * downstream corpus owner runs on that feed.
  */
object TextAudit {

  /** Gram size for the coverage audit (the dedup literature's shingle). */
  val CoverageGram = 5

  /** Coverage is reported at these top-K cuts. */
  val CoverageKs = Seq(10, 100, 1000)

  // ----------------------------------------------------------- utf8 audit
  /** Encoding/byte-class audit per source: document and char counts, the
    * printable-ASCII char share in ppm, control-char and U+FFFD
    * (replacement char — the scar of a mis-decoded byte) totals, and how
    * many documents contain ANY non-printable-ASCII char. On a clean
    * corpus every row reads 1e6/0/0 — that flatline IS the audit (the
    * text_lang_confusion discipline: the check exists to catch the feed
    * that breaks it). Scale: per-doc regex counts are map-side projections;
    * one rollup keyed by source.
    */
  def textUtf8Audit(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d).select(col("source"),
      length(col("text")).as("len"),
      length(regexp_replace(col("text"), "[^\\x20-\\x7e]", "")).as("ascii"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[\\x00-\\x1f\\x7f]", "")))
        .as("ctrl"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "\\x{fffd}", ""))).as("repl"))
    per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).cast("long").as("n_chars"),
        sum(col("ascii")).cast("long").as("n_ascii"),
        sum(col("ctrl")).cast("long").as("n_ctrl"),
        sum(col("repl")).cast("long").as("n_repl"),
        sum(when(col("ascii") < col("len"), 1L).otherwise(0L))
          .as("n_nonascii_docs"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        expr("CAST(n_ascii * 1000000 div nullif(n_chars, 0) AS BIGINT)")
          .as("ascii_ppm"),
        col("n_ctrl"), col("n_repl"), col("n_nonascii_docs"))
  }

  private def utf8OracleSql: String =
    """WITH per AS (SELECT source, length(text) AS len,
      |    length(regexp_replace(text, '[^\x20-\x7e]', '', 'g')) AS ascii,
      |    length(text) -
      |      length(regexp_replace(text, '[\x00-\x1f\x7f]', '', 'g')) AS ctrl,
      |    length(text) -
      |      length(regexp_replace(text, '\x{fffd}', '', 'g')) AS repl
      |  FROM documents),
      |ag AS (SELECT source, count(*) AS n_docs, sum(len) AS n_chars,
      |    sum(ascii) AS n_ascii, sum(ctrl) AS n_ctrl, sum(repl) AS n_repl,
      |    count(*) FILTER (ascii < len) AS n_nonascii_docs
      |  FROM per GROUP BY 1)
      |SELECT source, n_docs, CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(n_ascii * 1000000 // nullif(n_chars, 0) AS BIGINT) AS ascii_ppm,
      |  CAST(n_ctrl AS BIGINT) AS n_ctrl, CAST(n_repl AS BIGINT) AS n_repl,
      |  CAST(n_nonascii_docs AS BIGINT) AS n_nonascii_docs
      |FROM ag""".stripMargin

  // ------------------------------------------------------ token diversity
  /** Within-document lexical diversity rolled up per source: the floored
    * mean type–token ratio (distinct/total tokens, ppm) and mean
    * Gini–Simpson diversity 1 − Σp² = (n² − Σc²)/n² (ppm) — both exact
    * rationals per doc, so no entropy/log crosses engines. Low diversity
    * flags the repetitive/templated documents a quality filter should
    * drop (the Gopher-style signal, as a distribution statistic rather
    * than text_repetition's per-doc dup-gram fractions). Scale: explode →
    * (doc, token) count → per-doc agg → per-source rollup, partial
    * aggregation before every shuffle, keyed on doc_id then source.
    */
  def textTokenDiversity(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("types"),
        sum(expr("c * c")).as("sumc2"))
      .select(col("source"),
        expr("types * 1000000 div n").as("ttr_ppm"),
        expr("(n * n - sumc2) * 1000000 div (n * n)").as("simpson_ppm"))
    per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(ttr_ppm) div count(1)").as("avg_ttr_ppm"),
        expr("sum(simpson_ppm) div count(1)").as("avg_simpson_ppm"))
  }

  private def diversityOracleSql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |    unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ',
       |      'g'), ' ')) AS tok
       |  FROM documents),
       |cnt AS (SELECT doc_id, source, tok, count(*) AS c
       |  FROM t GROUP BY 1, 2, 3),
       |per AS (SELECT doc_id, source, sum(c) AS n, count(*) AS types,
       |    sum(c * c) AS sumc2 FROM cnt GROUP BY 1, 2),
       |pp AS (SELECT source, types * 1000000 // n AS ttr_ppm,
       |    (n * n - sumc2) * 1000000 // (n * n) AS simpson_ppm FROM per)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(ttr_ppm) // count(*) AS BIGINT) AS avg_ttr_ppm,
       |  CAST(sum(simpson_ppm) // count(*) AS BIGINT) AS avg_simpson_ppm
       |FROM pp GROUP BY 1""".stripMargin

  // ------------------------------------------------------- ngram coverage
  /** Top-n-gram mass concentration: what fraction (ppm) of all
    * [[CoverageGram]]-gram instances in the corpus is covered by the
    * top-K most frequent grams, at K = [[CoverageKs]]. A steep curve
    * means a few templates dominate the corpus (dedup/memorization
    * pressure); a flat one means the mass is in the tail. Output per K:
    * the distinct grams actually available at that cut, their combined
    * instance mass, the corpus total, and coverage ppm.
    *
    * Scale: one gram-count aggregate (map-side partial, shuffled on the
    * gram), then a TWO-PHASE top-K — `orderBy(cnt desc, gram).limit(max
    * K)` is a TakeOrdered (per-partition heads, no global sort), and
    * every step after runs on that ≤1000-row frame crossed with the
    * 1-row total. The tie at the K boundary is broken lexically so both
    * engines cut identically.
    */
  def textNgramCoverage(s: SparkSession, d: String): DataFrame = {
    val n = CoverageGram
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("nt"), col("toks"))
      .filter(col("nt") >= n)
    val grams = toks.select(
        explode(transform(sequence(lit(0), col("nt") - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .transform(Scale.materialize) // consumed by the total AND the top-K
    val total = grams.agg(sum(col("cnt")).as("total_mass"),
      count(lit(1)).as("n_distinct"))
    val top = grams.orderBy(col("cnt").desc, col("g"))
      .limit(CoverageKs.max) // TakeOrdered — two-phase top-K
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("g")))) // bounded ≤1000 rows
    top.withColumn("k", explode(array(CoverageKs.map(lit): _*)))
      .filter(col("rnk") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_grams"), sum(col("cnt")).as("top_mass"))
      .crossJoin(broadcast(total)) // 1-row total
      .select(col("k").cast("long").as("k"), col("n_grams"), col("top_mass"),
        col("total_mass"),
        expr("CAST(top_mass * 1000000 div total_mass AS BIGINT)")
          .as("coverage_ppm"))
  }

  private def coverageOracleSql: String = {
    val n = CoverageGram
    s"""WITH t AS (SELECT string_split(regexp_replace(trim(lower(text)),
       |      '\\s+', ' ', 'g'), ' ') AS toks FROM documents),
       |b AS (SELECT toks, len(toks) AS nt FROM t WHERE len(toks) >= $n),
       |g AS (SELECT array_to_string(list_slice(toks, i + 1, i + $n), ' ')
       |      AS g
       |  FROM (SELECT toks, unnest(range(0, nt - $n + 1)) AS i FROM b)),
       |cnt AS (SELECT g, count(*) AS cnt FROM g GROUP BY 1),
       |tot AS (SELECT sum(cnt) AS total_mass FROM cnt),
       |top AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, g) AS rnk
       |  FROM cnt ORDER BY cnt DESC, g LIMIT ${CoverageKs.max}),
       |ks AS (SELECT unnest([${CoverageKs.mkString(", ")}]) AS k)
       |SELECT CAST(k AS BIGINT) AS k, count(*) AS n_grams,
       |  CAST(sum(cnt) AS BIGINT) AS top_mass,
       |  CAST(total_mass AS BIGINT) AS total_mass,
       |  CAST(sum(cnt) * 1000000 // total_mass AS BIGINT) AS coverage_ppm
       |FROM top, ks, tot WHERE rnk <= k
       |GROUP BY k, total_mass""".stripMargin
  }

  // --------------------------------------------------------- source drift
  /** Per-source vocabulary drift — a χ²-style distance between each
    * source's unigram distribution and the corpus distribution, computed
    * over the corpus's top-[[DriftVocab]] terms: the domain-mix monitor
    * that catches a crawl slice going off-distribution before it poisons
    * a training mix (embed_centroid_drift's role, lexical form). Both
    * distributions quantize to ppm shares FIRST (p_obs = o·10⁶ div n_s,
    * p_exp = C·10⁶ div T — the quantization is part of the defined
    * statistic, so both engines sum identical integers), each vocab term
    * contributes (p_obs−p_exp)² div p_exp, and terms whose corpus share
    * floors to 0 ppm are excluded by contract. A source that never uses a
    * vocab term still pays its full expected-share penalty (the grid is
    * source × vocab, not observed pairs only).
    *
    * Scale: corpus and per-source counts are map-side-partial aggregates;
    * the vocab cut is a global TakeOrdered to a bounded [[DriftVocab]]-row
    * frame; the scoring grid is |sources| × [[DriftVocab]] — a broadcast
    * cross of two bounded frames, never corpus-sized.
    */
  val DriftVocab = 100

  def textSourceDrift(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .transform(Scale.materialize) // feeds corpus counts AND source counts
    val corpus = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .transform(Scale.materialize) // feeds T, the vocab cut
    val total = corpus.agg(sum(col("cw")).as("t"))
    // DECIMAL(38) for the ×10⁶ share numerators: corpus counts at 100 TB
    // (~10¹³ tokens) put cw·10⁶ past BIGINT
    val vocab = corpus.orderBy(col("cw").desc, col("w")).limit(DriftVocab)
      .crossJoin(broadcast(total))
      .select(col("w"),
        expr("CAST(CAST(cw AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)")
          .as("p_exp"))
      .filter(col("p_exp") > 0)
    val perSource = toks.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("o"))
      .transform(Scale.materialize) // feeds n_s AND the grid join
    val ns = perSource.groupBy(col("source")).agg(sum(col("o")).as("n_s"))
    ns.crossJoin(broadcast(vocab)) // bounded |sources| × vocab grid
      .join(perSource, Seq("source", "w"), "left_outer")
      .select(col("source"), col("n_s"),
        expr("CAST(CAST(coalesce(o, 0) AS DECIMAL(38,0)) * 1000000 " +
          "div n_s AS BIGINT)").as("p_obs"),
        col("p_exp"))
      .select(col("source"), col("n_s"),
        expr("((p_obs - p_exp) * (p_obs - p_exp)) div p_exp").as("contrib"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("contrib")).as("chi2_ppm"))
  }

  private def sourceDriftOracleSql: String =
    s"""WITH t AS (SELECT source, unnest(string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents),
       |corpus AS (SELECT w, count(*) AS cw FROM t GROUP BY 1),
       |tot AS (SELECT sum(cw) AS tt FROM corpus),
       |vocab AS (SELECT w, CAST(CAST(cw AS HUGEINT) * 1000000 // tt
       |      AS BIGINT) AS p_exp
       |  FROM (SELECT w, cw FROM corpus ORDER BY cw DESC, w
       |        LIMIT $DriftVocab), tot
       |  WHERE CAST(cw AS HUGEINT) * 1000000 // tt > 0),
       |ps AS (SELECT source, w, count(*) AS o FROM t GROUP BY 1, 2),
       |ns AS (SELECT source, sum(o) AS n_s FROM ps GROUP BY 1),
       |g0 AS (SELECT ns.source, ns.n_s, vocab.w, vocab.p_exp
       |  FROM ns, vocab),
       |grid AS (SELECT g0.source, g0.n_s, g0.p_exp,
       |    CAST(CAST(coalesce(ps.o, 0) AS HUGEINT) * 1000000 // g0.n_s
       |      AS BIGINT) AS p_obs
       |  FROM g0 LEFT JOIN ps ON ps.source = g0.source AND ps.w = g0.w)
       |SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
       |  count(*) AS n_terms,
       |  CAST(sum(((p_obs - p_exp) * (p_obs - p_exp)) // p_exp) AS BIGINT)
       |    AS chi2_ppm
       |FROM grid GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_utf8_audit" -> textUtf8Audit,
    "text_token_diversity" -> textTokenDiversity,
    "text_ngram_coverage" -> textNgramCoverage,
    "text_source_drift" -> textSourceDrift,
  )

  val oracles: Map[String, String] = Map(
    "text_utf8_audit" -> utf8OracleSql,
    "text_token_diversity" -> diversityOracleSql,
    "text_ngram_coverage" -> coverageOracleSql,
    "text_source_drift" -> sourceDriftOracleSql,
  )
}
