package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.{normalize, tokens, detRound}
import graft.functions.PortableHash._
import graft.functions.VectorFunctions._

/** Document deduplication family: exact, shingle-Jaccard, MinHash+LSH,
  * SimHash, embedding-cosine.
  *
  * Scale design: nothing here does a global cross join. Candidate pairs come
  * from equality joins on blocking keys — length bands (jaccard), LSH band
  * signatures (minhash), 15-bit hash chunks (simhash) — so the quadratic
  * work is confined to same-bucket groups. Every blocking join is a plain
  * hash shuffle; hot buckets split under AQE skew handling. The only
  * pairwise-complete operator is `dedup_embedding`, kept exact here because
  * the corpus table is small; the LSH/IVF scale path for vectors lives in
  * Similarity.
  */
object Dedup {

  /** 3-token shingle set (docs shorter than 3 tokens fall back to the whole
    * text as a single shingle).
    */
  def shingleSet(toks: Column): Column = array_distinct(
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array(concat_ws(" ", toks))))

  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), shingleSet(col("toks")).as("shs"))

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // ---------------------------------------------------------------- exact
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(normalize(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  // ------------------------------------------------------- n-gram jaccard
  /** Length-band blocked exact Jaccard: each doc lands in bands
    * {⌊n/20⌋, ⌊n/20⌋+1} so near-equal-length pairs always co-occur.
    */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val ds = docShingles(s, d).withColumn("band", floor(size(col("toks")) / 20))
    val keyed = ds.select(col("doc_id"),
      explode(array(col("band"), col("band") + 1)).as("k"))
    val pairs = keyed.as("a").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sh = ds.select(col("doc_id"), col("shs"))
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shs", "sa"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shs", "sb"), "doc_b")
      .withColumn("jacc", jaccard(col("sa"), col("sb")))
      .filter(col("jacc") >= 0.5)
      .select(col("doc_a"), col("doc_b"), detRound(col("jacc"), 4).as("jacc"))
  }

  // --------------------------------------------------------- minhash + LSH
  /** MinHash signatures (16 portable hashes) banded 4×4; same-signature
    * bands nominate candidates, exact Jaccard confirms.
    */
  def minhashSignatures(ds: DataFrame): DataFrame = {
    val hs = ds.withColumn("hs", transform(col("shs"), sh => hmod(sh)))
    hs.withColumn("mh", array((0 until NumHashes).map(i =>
      array_min(transform(col("hs"), h => affine(i, h)))): _*))
  }

  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val m = minhashSignatures(docShingles(s, d)).select(col("doc_id"), col("shs"), col("mh"))
    val bands = m.select(col("doc_id"), explode(array((0 until Bands).map(k =>
      struct(lit(k).as("k"),
        concat_ws(",", slice(col("mh"), k * RowsPerBand + 1, RowsPerBand)).as("sig"))): _*)).as("b"))
      .select(col("doc_id"), col("b.k").as("k"), col("b.sig").as("sig"))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val side = m.select(col("doc_id"), col("shs"), col("mh"))
    pairs
      .join(side.toDF("doc_a", "sa", "ma"), "doc_a")
      .join(side.toDF("doc_b", "sb", "mb"), "doc_b")
      .withColumn("jacc", jaccard(col("sa"), col("sb")))
      .withColumn("est", aggregate(zip_with(col("ma"), col("mb"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
        .cast("double") / NumHashes)
      .filter(col("jacc") >= 0.5)
      .select(col("doc_a"), col("doc_b"),
        detRound(col("jacc"), 4).as("jacc"), detRound(col("est"), 4).as("est"))
  }

  // --------------------------------------------------------------- simhash
  /** 60-bit SimHash over the distinct-token set (md5-derived bits), near
    * pairs via 4×15-bit chunk banding + exact hamming ≤ 20.
    */
  def simhashColumn: Column = {
    (0 until 60).map { i =>
      when(aggregate(col("hts"), lit(0L),
        (acc, h) => acc + (shiftright(h, i) % 2L) * 2L - 1L) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("tset"))
      .withColumn("hts", transform(col("tset"), t => hexH(t)))
      .withColumn("sim", simhashColumn)
      .select("doc_id", "sim")
    val chunked = base.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          (shiftright(col("sim"), 15 * k) % lit(32768L)).as("c"))): _*)).as("b"))
      .select(col("doc_id"), col("sim"), col("b.k").as("k"), col("b.c").as("c"))
    chunked.as("a").join(chunked.as("b"),
        col("a.k") === col("b.k") && col("a.c") === col("b.c") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 20)
  }

  // ----------------------------------------------------- embedding cosine
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= 0.40)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        detRound(col("cos"), 6).as("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding" -> dedupEmbedding,
  )

  // ------------------------------------------------------------- oracles
  private val normSql = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
  private val toksSql = s"string_split($normSql, ' ')"
  private val shsSql =
    s"""list_distinct(CASE WHEN len(toks) >= 3
       | THEN list_transform(range(0, len(toks)-2), i -> array_to_string(list_slice(toks, i+1, i+3), ' '))
       | ELSE [array_to_string(toks, ' ')] END)""".stripMargin
  private val docShinglesSql =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |s AS (SELECT doc_id, toks, $shsSql AS shs FROM t)""".stripMargin
  private def jaccSql(a: String, b: String) =
    s"(CAST(len(list_intersect($a,$b)) AS DOUBLE) / (len($a)+len($b)-len(list_intersect($a,$b))))"

  private val mhSql: String = {
    val mins = (0 until NumHashes)
      .map(i => s"list_min(list_transform(hs, h -> ${affineSql(i, "h")}))")
      .mkString("[", ", ", "]")
    s"""h AS (SELECT doc_id, shs, list_transform(shs, sh -> ${hexHSql("sh")} % $P) AS hs FROM s),
       |m AS (SELECT doc_id, shs, $mins AS mh FROM h)""".stripMargin
  }

  private val simhashSql: String =
    s"""hb AS (SELECT doc_id,
       |  list_transform(list_distinct(toks), tk -> ${hexHSql("tk")}) AS hts FROM t),
       |sh AS (SELECT doc_id,
       |  list_sum(list_transform(range(0, 60), i ->
       |    CASE WHEN list_sum(list_transform(hts, h -> ((h >> i) & 1)*2 - 1)) > 0
       |         THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS sim
       |  FROM hb)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      s"""SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
         |FROM documents GROUP BY 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $docShinglesSql,
         |bd AS (SELECT doc_id, CAST(floor(len(toks)/20) AS BIGINT) AS band FROM s),
         |kb AS (SELECT doc_id, band + x AS k FROM bd, (SELECT unnest([0,1]) AS x)),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM kb a JOIN kb b ON a.k = b.k AND a.doc_id < b.doc_id),
         |j AS (SELECT doc_a, doc_b, ${jaccSql("sa.shs", "sb.shs")} AS jacc
         |  FROM pairs JOIN s sa ON doc_a = sa.doc_id JOIN s sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, floor(jacc*1e4)/1e4 AS jacc FROM j WHERE jacc >= 0.5""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $docShinglesSql,
         |$mhSql,
         |bands AS (SELECT doc_id, k,
         |    array_to_string(list_slice(mh, k*$RowsPerBand+1, k*$RowsPerBand+$RowsPerBand), ',') AS sig
         |  FROM m, (SELECT unnest([0,1,2,3]) AS k)),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.k = b.k AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |j AS (SELECT doc_a, doc_b, ${jaccSql("ma.shs", "mb.shs")} AS jacc,
         |    CAST(list_sum(list_transform(range(1, ${NumHashes + 1}), i ->
         |      CASE WHEN ma.mh[i] = mb.mh[i] THEN 1 ELSE 0 END)) AS DOUBLE) / $NumHashes AS est
         |  FROM pairs JOIN m ma ON doc_a = ma.doc_id JOIN m mb ON doc_b = mb.doc_id)
         |SELECT doc_a, doc_b, floor(jacc*1e4)/1e4 AS jacc, floor(est*1e4)/1e4 AS est
         |FROM j WHERE jacc >= 0.5""".stripMargin,
    "dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |$simhashSql,
         |ch AS (SELECT doc_id, sim, k, (sim >> (15*k)) % 32768 AS c
         |  FROM sh, (SELECT unnest([0,1,2,3]) AS k)),
         |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.sim, b.sim)) AS hamming
         |  FROM ch a JOIN ch b ON a.k = b.k AND a.c = b.c AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pr WHERE hamming <= 20""".stripMargin,
    "dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${cosineSql("a.v", "b.v")} AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, floor(cos*1e6)/1e6 AS cos FROM p WHERE cos >= 0.40""".stripMargin,
  )
}
