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

  private def bm25OracleSql(st: Bm25Stats): String = {
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
       |    ORDER BY score DESC, doc_id) AS rnk FROM sc)
       |SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id, score
       |FROM rk WHERE rnk <= $Bm25TopK""".stripMargin
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25" -> textBm25,
    "text_bpe_pairs" -> textBpePairs,
  )

  /** bm25's oracle follows the generated-after-training contract (see
    * Similarity.oracles): emitted only when exactly one sf dir has trained
    * in this JVM, so the SQL restates the exact literals the plan used.
    */
  def oracles: Map[String, String] = {
    val base = Map("text_bpe_pairs" -> bpeOracleSql)
    if (bm25Cache.size == 1)
      base + ("text_bm25" -> bm25OracleSql(bm25Cache.values.iterator.next()))
    else base
  }
}
