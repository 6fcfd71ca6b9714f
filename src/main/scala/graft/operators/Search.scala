package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens

/** Keyword retrieval & tokenizer-training statistics over the documents
  * corpus — the search-side complement of the embedding kNN family
  * (`knn_rrf` fuses rankers; `text_bm25` is the lexical ranker a real
  * hybrid-retrieval stack fuses WITH), plus the first step of BPE
  * tokenizer training (the adjacent-pair count that picks each merge).
  *
  * Scale design: BM25 never materializes the full postings — the explode
  * is immediately filtered to the literal query-term set (predicate on the
  * generator output, so the shuffle carries only matched (doc, term)
  * rows), per-term idf and the corpus avgdl are DRIVER-TRAINED ONCE from
  * bounded aggregates (|terms| rows + 2 scalars — the literal-model
  * pattern of knn_ivf/text_quality_model) and re-enter the plan as
  * literals, and the top-k ends in the bucketed two-phase
  * [[Scale.topKPerGroup]]. Per-term contributions quantize to BIGINT
  * (floor x 1e6) BEFORE the per-doc sum, so aggregation order can never
  * change a bit and the DuckDB oracle restates the identical integers.
  * `text_bpe_pairs` confines work to the DISTINCT-word frame (vocabulary,
  * not corpus, sized) with frequency weights — the standard corpus-scale
  * BPE formulation.
  */
object Search {

  /** BM25 constants (Robertson et al.; the Lucene-default parametrization). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 10

  /** The literal benchmark queries (terms drawn from the corpus vocab). */
  val Bm25Queries: Seq[(String, Seq[String])] = Seq(
    "q_spark_merge" -> Seq("spark", "merge", "join"),
    "q_fast_scan" -> Seq("fast", "scan", "filter"),
    "q_customer_order" -> Seq("customer", "order", "value"),
    "q_hash_table" -> Seq("hash", "table", "row"),
  )
  val Bm25Terms: Seq[String] = Bm25Queries.flatMap(_._2).distinct

  /** Trained retrieval stats: Lucene-style idf per query term +
    * corpus avgdl, computed once per sf dir from bounded aggregates
    * (|terms|-row collect + 2 scalars) and embedded as the same double
    * literals in the Spark plan and the generated oracle.
    */
  final case class Bm25Stats(idf: Map[String, Double], avgdl: Double)

  private[graft] val bm25Cache =
    new java.util.concurrent.ConcurrentHashMap[String, Bm25Stats]()

  private def bm25StatsFor(s: SparkSession, d: String): Bm25Stats =
    bm25Cache.computeIfAbsent(d, _ => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val corpus = docs.agg(count(lit(1)).as("n"),
        sum(size(col("toks")).cast("long")).as("tot")).head()
      val n = corpus.getLong(0)
      val avgdl = corpus.getLong(1).toDouble / n
      val dfRows = docs
        .select(explode(array_distinct(col("toks"))).as("term"))
        .filter(col("term").isin(Bm25Terms: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .collect()
      val dfMap = dfRows.map(r => r.getString(0) -> r.getLong(1)).toMap
      val idf = Bm25Terms.map { t =>
        val df = dfMap.getOrElse(t, 0L).toDouble
        t -> math.log((n.toDouble - df + 0.5) / (df + 0.5) + 1.0)
      }.toMap
      Bm25Stats(idf, avgdl)
    })

  /** BM25 top-k per benchmark query. Per-term contribution
    * floor(idf * tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl)) * 1e6) as
    * BIGINT; doc score = integer sum; rank (score desc, doc_id).
    */
  def textBm25(s: SparkSession, d: String): DataFrame = {
    val st = bm25StatsFor(s, d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    import s.implicits._
    val qt = broadcast(
      Bm25Queries.flatMap { case (qid, ts) => ts.map(t => (qid, t, st.idf(t))) }
        .toDF("query_id", "term", "idf"))
    val scored = tf.join(qt, "term")
      .withColumn("si", floor(col("idf") *
        ((col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(Bm25K1) *
            (lit(0.25) + lit(Bm25B) * (col("dl").cast("double") / lit(st.avgdl))))) * 1e6)
        .cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("si")).as("score"))
    Scale.topKPerGroup(scored, Seq("query_id"),
        Seq(col("score").desc, col("doc_id")), k = Bm25TopK,
        saltSrc = col("doc_id"))
      .select(col("query_id"), col("rnk"), col("doc_id"), col("score"))
  }

  /** Double literal DuckDB parses as DOUBLE with the same bits. */
  private def dlit(x: Double): String = {
    val s = x.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /** The shared BM25 ranking prefix — CTEs up to `rk` (query_id, doc_id,
    * score, rnk). Both the retrieval oracle and the NDCG-eval oracle
    * append their own final SELECT to this.
    */
  private def bm25RankCte(st: Bm25Stats): String = {
    val termList = Bm25Terms.map("'" + _ + "'").mkString(", ")
    val qtRows = Bm25Queries.flatMap { case (qid, ts) =>
      ts.map(t => s"('$qid', '$t', ${dlit(st.idf(t))})")
    }.mkString(",\n|  ")
    s"""WITH t AS (SELECT doc_id,
       |    string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t),
       |e AS (SELECT doc_id, dl, unnest(toks) AS term FROM dd),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM e
       |  WHERE term IN ($termList) GROUP BY 1, 2, 3),
       |qt(query_id, term, idf) AS (VALUES ${qtRows}),
       |si AS (SELECT query_id, doc_id,
       |    CAST(floor(idf * ((CAST(tf AS DOUBLE) * 2.2e0)
       |      / (CAST(tf AS DOUBLE) + ${dlit(Bm25K1)} * (0.25e0 + ${dlit(Bm25B)}
       |        * (CAST(dl AS DOUBLE) / ${dlit(st.avgdl)})))) * 1e6) AS BIGINT) AS si
       |  FROM tf JOIN qt USING (term)),
       |sc AS (SELECT query_id, doc_id, CAST(sum(si) AS BIGINT) AS score
       |  FROM si GROUP BY 1, 2),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS rnk FROM sc)""".stripMargin
  }

  private def bm25OracleSql(st: Bm25Stats): String =
    s"""${bm25RankCte(st)}
       |SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id, score
       |FROM rk WHERE rnk <= $Bm25TopK""".stripMargin

  /** Discount weights floor(1e9 / log2(r+1)) for ranks 1..[[Bm25TopK]] —
    * driver-computed integer literals shared verbatim with the oracle, so
    * no log2 is ever evaluated inside either engine.
    */
  private val ndcgW: Seq[(Int, Long)] = (1 to Bm25TopK).map(r =>
    r -> math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** NDCG@k of the BM25 ranking — the retrieval-quality eval run next to
    * the ranker it grades (knn_recall_eval's lexical sibling). Graded
    * relevance = number of DISTINCT query terms a document contains
    * (0..|terms|, engine-independent ground truth); DCG numerators are
    * rel·floor(1e9/log2(r+1)) with the discount table as driver-computed
    * integer literals, so the whole metric is 64-bit integer until the
    * final ppm division. IDCG ranks the corpus-wide top-k relevance values
    * per query through the bucketed two-phase [[Scale.topKPerGroup]] (never
    * a per-query global sort).
    *
    * Scale: the relevance frame is (docs with ≥1 query term) × ≤4 queries —
    * linear in matched docs; everything else is the already-audited BM25
    * plan plus bounded-frame joins against the ≤k-row weight table.
    */
  def textNdcgEval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ranked = textBm25(s, d) // (query_id, rnk, doc_id, score)
    val qterms = broadcast(
      Bm25Queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
        .toDF("query_id", "term"))
    val rel = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .join(qterms, "term")
      .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("rel"))
    val wdf = broadcast(ndcgW.toDF("rnk", "w"))
    val dcg = ranked.join(rel, Seq("query_id", "doc_id"), "left_outer")
      .select(col("query_id"), col("rnk"), coalesce(col("rel"), lit(0L)).as("rel"))
      .join(wdf, "rnk")
      .groupBy(col("query_id")).agg(sum(col("rel") * col("w")).as("dcg_num"))
    val ideal = Scale.topKPerGroup(rel, Seq("query_id"),
        Seq(col("rel").desc, col("doc_id")), k = Bm25TopK, saltSrc = col("doc_id"))
      .join(wdf, "rnk")
      .groupBy(col("query_id")).agg(sum(col("rel") * col("w")).as("idcg_num"))
    dcg.join(ideal, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("dcg_num"),
        coalesce(col("idcg_num"), lit(0L)).as("idcg_num"))
      .withColumn("ndcg_ppm",
        expr("CASE WHEN idcg_num > 0 THEN dcg_num * 1000000 div idcg_num " +
          "ELSE CAST(0 AS BIGINT) END"))
  }

  private def ndcgOracleSql(st: Bm25Stats): String = {
    val wRows = ndcgW.map { case (r, w) => s"($r, CAST($w AS BIGINT))" }.mkString(", ")
    s"""${bm25RankCte(st)},
       |qt2 AS (SELECT DISTINCT query_id, term FROM qt),
       |dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM dd),
       |rel AS (SELECT q.query_id, d.doc_id, count(*) AS rel
       |  FROM dt d JOIN qt2 q USING (term) GROUP BY 1, 2),
       |wt(rnk, w) AS (VALUES $wRows),
       |dcg AS (SELECT r.query_id,
       |    CAST(sum(coalesce(rel.rel, 0) * w.w) AS BIGINT) AS dcg_num
       |  FROM rk r
       |  LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
       |  JOIN wt w ON w.rnk = r.rnk
       |  WHERE r.rnk <= $Bm25TopK GROUP BY 1),
       |irk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, doc_id) AS rnk FROM rel),
       |ideal AS (SELECT i.query_id, CAST(sum(i.rel * w.w) AS BIGINT) AS idcg_num
       |  FROM irk i JOIN wt w USING (rnk)
       |  WHERE i.rnk <= $Bm25TopK GROUP BY 1)
       |SELECT d.query_id, d.dcg_num, coalesce(i.idcg_num, 0) AS idcg_num,
       |  CASE WHEN coalesce(i.idcg_num, 0) > 0
       |    THEN d.dcg_num * 1000000 // i.idcg_num
       |    ELSE CAST(0 AS BIGINT) END AS ndcg_ppm
       |FROM dcg d LEFT JOIN ideal i USING (query_id)""".stripMargin
  }

  /** Top adjacent character pairs the first BPE merge would pick. */
  val BpeTopPairs = 20

  /** Frequency-weighted within-word character-pair counts — the statistic
    * BPE training recomputes each merge round; one round is exactly
    * expressible relationally (later rounds re-tokenize on the merged
    * symbol, a driver-loop over this same bounded query). Work is
    * vocabulary-sized: pairs explode off the DISTINCT-word frame.
    */
  def textBpePairs(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .filter(length(col("word")) >= 2)
    val pairs = words
      .select(col("wc"), col("word"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(expr("substr(word, i, 2)").as("pair"), col("wc"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
    pairs.orderBy(col("cnt").desc, col("pair")).limit(BpeTopPairs)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("pair"))))
      .select(col("rnk"), col("pair"), col("cnt"))
  }

  private val bpeOracleSql: String =
    s"""WITH w AS (SELECT unnest(string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS word
       |  FROM documents),
       |v AS (SELECT word, count(*) AS wc FROM w GROUP BY 1),
       |v2 AS (SELECT word, wc FROM v WHERE length(word) >= 2),
       |p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, wc
       |  FROM v2, unnest(range(1, length(word))) AS u(i)),
       |c AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM p GROUP BY 1),
       |rk AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk FROM c)
       |SELECT CAST(rnk AS INT) AS rnk, pair, cnt FROM rk
       |WHERE rnk <= $BpeTopPairs""".stripMargin

  /** Number of BPE merge rounds `text_bpe_train` runs. */
  val BpeMerges = 10

  /** Space-delimited symbol string for a word: " c h a r s " — sentinel
    * spaces on both ends so a merge pattern " a b " can only match at a
    * symbol boundary (never inside a multi-char symbol).
    */
  private def charSeq(word: org.apache.spark.sql.Column) =
    concat(regexp_replace(word, "(.)", " $1"), lit(" "))

  /** Apply one BPE merge to a symbol string: replace every non-overlapping
    * " a b " with " ab ". A single left-to-right `replace` consumes the
    * trailing space of each match, so an occurrence immediately following a
    * replaced one loses its leading space and survives; the second pass
    * catches exactly those (remaining occurrences are non-adjacent after
    * pass one), making the composition the full simultaneous
    * non-overlapping merge — proven against a token-list merge in
    * SearchSpec. Plain `replace` (not regexp), so symbols never need
    * escaping, and both engines share Java/DuckDB's identical left-to-right
    * non-overlap semantics.
    */
  private def mergeOnce(seq: org.apache.spark.sql.Column, pair: String) = {
    val from = lit(" " + pair + " ")
    val to = lit(" " + pair.replace(" ", "") + " ")
    call_function("replace", call_function("replace", seq, from, to), from, to)
  }

  /** Full BPE tokenizer training: [[BpeMerges]] merge rounds over the
    * frequency-weighted vocabulary frame — the corpus-scale formulation
    * (Sennrich et al. 2016 §3.2): the corpus is scanned ONCE into
    * (word, count); every round after that touches only the vocabulary
    * frame, whose symbol strings shrink as merges apply. Per round: pair
    * counts collapse to the pair alphabet map-side, the argmax is a
    * TakeOrdered limit(1) (a bounded 1-row collect, the literal-model
    * pattern), and the chosen merge applies as a narrow string map with the
    * frame re-materialized to keep lineage flat (the Graph.scala superstep
    * discipline). The oracle is fully independent: it restates the whole
    * loop as [[BpeMerges]] unrolled CTE rounds and recomputes each argmax
    * itself — no trained literals cross over.
    */
  /** The base vocabulary frame (word, wc, seq) — the ONE corpus scan. */
  private def baseVocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"), charSeq(col("word")).as("seq"))

  /** The trained merge list, cached per sf dir so `text_bpe_train` and
    * `text_bpe_tokenize` share one training run. Only the LITERAL merges
    * are cached — never a checkpointed frame, which Bench's between-query
    * unpersist would invalidate; the trained vocab rebuilds from them as a
    * pure narrow replace-chain (see [[trainedVocab]]).
    */
  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, String, Long)]]()

  private def bpeMerges(s: SparkSession, d: String): Seq[(Int, String, Long)] =
    bpeCache.computeIfAbsent(d, _ => {
      var vocab = baseVocab(s, d).transform(Scale.materialize)
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
      var r = 1
      var done = false
      while (r <= BpeMerges && !done) {
        val best = vocab
          .select(col("wc"), split(trim(col("seq")), " ").as("sy"))
          .filter(size(col("sy")) >= 2)
          .select(col("wc"), col("sy"),
            explode(sequence(lit(1), size(col("sy")) - 1)).as("i"))
          .select(concat(element_at(col("sy"), col("i")), lit(" "),
            element_at(col("sy"), col("i") + 1)).as("pair"), col("wc"))
          .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val pair = best(0).getString(0)
          merges += ((r, pair, best(0).getLong(1)))
          vocab = vocab.withColumn("seq", mergeOnce(col("seq"), pair))
            .transform(Scale.materialize)
          r += 1
        }
      }
      merges.toSeq
    })

  /** Vocabulary with the trained segmentation: the cached merges applied
    * to a fresh base vocab as ONE projection of chained narrow replaces —
    * no per-round barrier, no checkpoint to invalidate.
    */
  private def trainedVocab(s: SparkSession, d: String): DataFrame = {
    val seqCol = bpeMerges(s, d).foldLeft(col("seq")) {
      case (c, (_, pair, _)) => mergeOnce(c, pair)
    }
    baseVocab(s, d).select(col("word"), col("wc"), seqCol.as("seq"))
  }

  def textBpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeMerges(s, d).toDF("rnk", "pair", "cnt")
  }

  /** Tokenize the corpus under the trained merges and report per-source
    * fertility — the statistic that decides whether a tokenizer suits a
    * corpus (tokens per word, chars per token). The corpus is tokenized
    * through the VOCABULARY frame (each word type segmented once, the
    * trained seq is already its segmentation), so the apply step is one
    * word-keyed join + a per-source agg; no per-document re-segmentation.
    * All-integer outputs (`*1e6 div`) keep it hash-exact; the oracle
    * retrains from scratch in SQL (the unrolled rounds) and re-applies —
    * nothing trained crosses over.
    */
  def textBpeTokenize(s: SparkSession, d: String): DataFrame = {
    val wt = trainedVocab(s, d)
      .select(col("word"), size(split(trim(col("seq")), " ")).as("n_tok"))
    Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .join(wt, "word")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok").cast("long")).as("n_tokens"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .withColumn("fertility_ppm", expr("n_tokens * 1000000 div n_words"))
      .withColumn("chars_per_tok_ppm", expr("n_chars * 1000000 div n_tokens"))
  }

  /** The shared training prefix: vocabulary + [[BpeMerges]] unrolled merge
    * rounds, ending at `u{BpeMerges}` (word, wc, seq) — both BPE oracles
    * append their own final SELECT to this.
    */
  private val bpeRoundsCte: String = {
    val rounds = (1 to BpeMerges).map { r =>
      s"""s$r AS MATERIALIZED (SELECT word, wc, seq, string_split(trim(seq), ' ') AS sy FROM u${r - 1}),
         |p$r AS (SELECT sy[CAST(i AS INT)] || ' ' || sy[CAST(i AS INT)+1] AS pair, wc
         |  FROM s$r, unnest(range(1, len(sy))) AS t(i) WHERE len(sy) >= 2),
         |c$r AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM p$r GROUP BY 1),
         |b$r AS (SELECT pair, cnt FROM c$r ORDER BY cnt DESC, pair LIMIT 1),
         |u$r AS (SELECT word, wc, replace(replace(seq,
         |    ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
         |    ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ') AS seq
         |  FROM s$r, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT unnest(string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS word
       |  FROM documents),
       |v AS (SELECT word, count(*) AS wc FROM w GROUP BY 1),
       |u0 AS (SELECT word, wc, regexp_replace(word, '(.)', ' \\1', 'g') || ' ' AS seq FROM v),
       |$rounds""".stripMargin
  }

  private val bpeTrainOracleSql: String = {
    val sel = (1 to BpeMerges).map { r =>
      s"SELECT CAST($r AS INT) AS rnk, pair, cnt FROM b$r"
    }.mkString("\nUNION ALL ")
    s"""$bpeRoundsCte
       |$sel""".stripMargin
  }

  private val bpeTokenizeOracleSql: String =
    s"""$bpeRoundsCte,
       |wt AS (SELECT word, len(string_split(trim(seq), ' ')) AS n_tok FROM u$BpeMerges),
       |dw AS (SELECT source, unnest(string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS word
       |  FROM documents)
       |SELECT source, count(*) AS n_words,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(length(word)) AS BIGINT) AS n_chars,
       |  (CAST(sum(n_tok) AS BIGINT) * 1000000) // count(*) AS fertility_ppm,
       |  (CAST(sum(length(word)) AS BIGINT) * 1000000)
       |    // CAST(sum(n_tok) AS BIGINT) AS chars_per_tok_ppm
       |FROM dw JOIN wt USING (word) GROUP BY 1""".stripMargin

  /** Word n-gram order for the novelty statistic. */
  val NovN = 3

  /** First-occurrence n-gram novelty per source — the curation statistic
    * behind "is this source adding new content or re-mixing what the
    * corpus already has?" (the n-gram-overlap view of dedup, aggregated to
    * a per-source report instead of per-pair). A doc's distinct word
    * [[NovN]]-grams are novel iff their corpus-wide first occurrence
    * (min doc_id) is this doc. Three linear shuffles — distinct on
    * (doc, gram), min-agg on gram, join back on gram — all SF-scaled keys,
    * report bounded at |sources| rows; novelty_ppm stays integer
    * (`*1e6 div`) so the oracle is hash-exact.
    */
  def textNgramNovelty(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= NovN)
    val grams = toks
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), size(col("toks")) - (NovN - 1))).as("i"),
        col("toks"))
      .select(col("doc_id"), col("source"),
        concat_ws(" ", element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1),
          element_at(col("toks"), col("i") + 2)).as("g"))
      .distinct()
    val first = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "g")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)).as("novel_grams"))
      .withColumn("novelty_ppm", expr("novel_grams * 1000000 div n_grams"))
  }

  private val noveltyOracleSql: String =
    s"""WITH t AS (SELECT doc_id, source, string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |g0 AS (SELECT DISTINCT doc_id, source,
       |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1]
       |      || ' ' || toks[CAST(i AS INT)+2] AS g
       |  FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
       |  WHERE len(toks) >= $NovN),
       |f AS (SELECT g, min(doc_id) AS first_doc FROM g0 GROUP BY 1)
       |SELECT source, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
       |  (CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000) // count(*) AS novelty_ppm
       |FROM g0 JOIN f USING (g) GROUP BY 1""".stripMargin

  // --------------------------------------------------------- tf-idf keywords
  /** Per-document keyword extraction — top-[[KeywordsK]] terms by
    * tf·idf, the tagging/faceting pass a corpus catalog runs over every
    * document. idf uses the integer bit-length form (centibits,
    * `length(bin(N)) − length(bin(df))` — textSurprisal's cross-engine-
    * exact discipline; no transcendental log crosses the engine boundary),
    * so scores are BIGINTs and ties break on the term itself.
    *
    * Scale: (doc, term) tf and per-term df are both map-side-partial
    * aggregates; the corpus size is a 1-row broadcast; the per-doc cut is
    * the bucketed two-phase [[Scale.topKPerGroup]] — no vocab-sized or
    * corpus-sized single-partition window anywhere.
    */
  val KeywordsK = 3

  def textKeywords(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .transform(Scale.materialize) // feeds both df and the scored join
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nd = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
    val scored = tf.join(df, "w").join(broadcast(nd))
      .withColumn("score_cb",
        (length(bin(col("nd"))) - length(bin(col("df")))).cast("long")
          * 100L * col("tf"))
    Scale.topKPerGroup(
        scored.select(col("doc_id"), col("w").as("term"), col("tf"),
          col("score_cb")),
        Seq("doc_id"), Seq(col("score_cb").desc, col("term")),
        k = KeywordsK, saltSrc = col("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("score_cb"),
        col("rnk").as("rank"))
  }

  private def keywordsOracleSql: String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
       |nd AS (SELECT count(*) AS nd FROM documents),
       |sc AS (SELECT doc_id, w AS term, tf,
       |    CAST(length(bin(nd.nd)) - length(bin(df.df)) AS BIGINT)
       |      * 100 * tf AS score_cb
       |  FROM tf JOIN df USING (w), nd),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score_cb DESC, term) AS rank FROM sc)
       |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
       |  CAST(score_cb AS BIGINT) AS score_cb, CAST(rank AS INT) AS rank
       |FROM rk WHERE rank <= $KeywordsK""".stripMargin

  // ------------------------------------------------------ collocation mining
  /** Corpus collocations — adjacent word bigrams ranked by the Dice
    * coefficient (2·c_ab/(c_a+c_b) in ppm — rational, so integer-exact
    * cross-engine where PMI's log is not), with a minimum-support floor
    * and a bounded top-[[CollocTopK]] cut. The phrase-mining pass that
    * feeds tokenizer merge rules and stop-phrase lists.
    *
    * Scale: bigrams are generated MAP-SIDE from each token array (a
    * `transform(sequence(...))` projection — no posexplode self-join, no
    * position shuffle); counts collapse onto the bigram-vocabulary frame;
    * the two unigram joins are vocab-sized; the final cut is a global
    * TakeOrdered (sort+limit), never a full sort.
    */
  val CollocMinSupport = 5L
  val CollocTopK = 50

  def textCollocDice(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .transform(Scale.materialize) // joined twice (w1 and w2 sides)
    val cab = docs.filter(col("n") >= 2)
      .select(explode(expr(
        "transform(sequence(1, n - 1), i -> " +
        "struct(toks[i-1] AS w1, toks[i] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CollocMinSupport)
    cab
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        expr("CAST(2 * CAST(c_ab AS DECIMAL(38,0)) * 1000000 " +
          "div (c_a + c_b) AS BIGINT)").as("dice_ppm"))
      .orderBy(col("dice_ppm").desc, col("w1"), col("w2"))
      .limit(CollocTopK)
  }

  private def collocOracleSql: String =
    s"""WITH dt AS (SELECT doc_id, string_split(
       |      regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents),
       |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
       |  FROM dt, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
       |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2
       |  HAVING count(*) >= $CollocMinSupport),
       |uni AS (SELECT unnest(t) AS w FROM dt),
       |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1)
       |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
       |  CAST(a.c AS BIGINT) AS c_a, CAST(b.c AS BIGINT) AS c_b,
       |  CAST(2 * CAST(c_ab AS HUGEINT) * 1000000 // (a.c + b.c) AS BIGINT)
       |    AS dice_ppm
       |FROM cab JOIN uc a ON a.w = cab.w1 JOIN uc b ON b.w = cab.w2
       |ORDER BY dice_ppm DESC, w1, w2 LIMIT $CollocTopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_keywords" -> textKeywords,
    "text_colloc_dice" -> textCollocDice,
    "text_bm25" -> textBm25,
    "text_ndcg_eval" -> textNdcgEval,
    "text_bpe_pairs" -> textBpePairs,
    "text_bpe_train" -> textBpeTrain,
    "text_bpe_tokenize" -> textBpeTokenize,
    "text_ngram_novelty" -> textNgramNovelty,
  )

  /** bm25's oracle follows the generated-after-training contract (see
    * Similarity.oracles): emitted only when exactly one sf dir has trained
    * in this JVM, so the SQL restates the exact literals the plan used.
    */
  def oracles: Map[String, String] = {
    val base = Map(
      "text_keywords" -> keywordsOracleSql,
      "text_colloc_dice" -> collocOracleSql,
      "text_bpe_pairs" -> bpeOracleSql,
      "text_bpe_train" -> bpeTrainOracleSql,
      "text_bpe_tokenize" -> bpeTokenizeOracleSql,
      "text_ngram_novelty" -> noveltyOracleSql)
    if (bm25Cache.size == 1) {
      val st = bm25Cache.values.iterator.next()
      base + ("text_bm25" -> bm25OracleSql(st)) +
        ("text_ndcg_eval" -> ndcgOracleSql(st))
    } else base
  }
}
