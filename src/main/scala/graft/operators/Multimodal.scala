package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A decoded-media record produced by the (stubbed) native decoder. */
case class DecodedMeta(doc_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, duration_ms: Long)

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The container has no media libraries, so the DECODE step is a
  * deterministic stub (`stubDecode` — shapes derived from the payload hash);
  * everything around it — binary casting, schema, partition-preserving
  * mapPartitions batch shape, frame slicing/explosion — is the real Spark
  * plumbing a decoder would plug into. At scale these are per-row map
  * operations: no shuffle, scan-bound, codegen'd except the explicit
  * mapPartitions decode seam.
  */
object Multimodal {

  /** documents.text bytes stand in for the media payload. */
  private def withPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Deterministic media-kind assignment (stub for magic-byte sniffing). */
  private def kind = element_at(
    array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))

  def mmBinaryMeta(s: SparkSession, d: String): DataFrame =
    withPayload(s, d).select(
      col("doc_id"),
      kind.as("kind"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha"),
      // Stubbed decode metadata: deterministic fake dims from payload size.
      (lit(64) + octet_length(col("payload")) % 1216).as("width"),
      (lit(64) + (octet_length(col("payload")) * 7) % 656).as("height"))

  /** Frame sampling: 64-byte frames, every 4th sampled, exploded to rows —
    * the batch shape a video pipeline needs (doc × frame grid), without a
    * real codec.
    */
  val FrameBytes = 64
  val SampleEvery = 4

  def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    val n = ceil(octet_length(col("payload")).cast("double") / FrameBytes).cast("long")
    withPayload(s, d)
      .withColumn("n_frames", n)
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1), i => i % SampleEvery === 0)))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        sha2(substring(col("payload"), (col("frame_idx") * FrameBytes + 1).cast("int"), lit(FrameBytes)), 256)
          .as("frame_sha"),
        octet_length(substring(col("payload"), (col("frame_idx") * FrameBytes + 1).cast("int"), lit(FrameBytes)))
          .as("frame_bytes"))
  }

  /** The decode seam a real system would fill with a native library: typed
    * mapPartitions so the decoder amortizes per-partition init (codec
    * contexts, GPU handles), one partition per task, no shuffle. The stub
    * derives deterministic shapes from the payload; a real impl replaces
    * only the body of `decodeOne`. Exercised by MultimodalSpec.
    */
  def decodePartitioned(s: SparkSession, d: String): Dataset[DecodedMeta] = {
    import s.implicits._
    withPayload(s, d)
      .withColumn("kind", kind)
      .select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec context / GPU handle)
        it.map { case (id, k, bytes) => decodeOne(id, k, bytes) }
      }
  }

  /** STUB decoder — deterministic fake in place of the real codec call. */
  def decodeOne(id: Long, k: String, bytes: Array[Byte]): DecodedMeta = {
    val n = bytes.length.toLong
    DecodedMeta(id, k, n,
      width = (64 + n % 1216).toInt,
      height = (64 + (n * 7) % 656).toInt,
      duration_ms = if (k == "image") 0L else n * 10)
  }

  /** Exact binary dedup — the first pass every media corpus runs: group by
    * payload digest, elect the min doc id. One shuffle keyed by digest;
    * map-side partial agg; payload bytes never shuffle (only the 32-byte
    * sha).
    */
  def mmDedupExact(s: SparkSession, d: String): DataFrame =
    withPayload(s, d)
      .groupBy(sha2(col("payload"), 256).as("sha"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_dups"),
        sum(octet_length(col("payload")).cast("long")).as("total_bytes"))

  /** Perceptual-hash near-dup over media payloads — the image/video analog
    * of text simhash. The fingerprint is a LOCALITY-SENSITIVE stub: a
    * 60-bit majority-vote simhash over the payload's distinct rolling byte
    * 8-grams, so payloads with mostly-shared content land at small hamming
    * distance (a content hash would only ever find byte-exact copies —
    * trivially empty next to mm_dedup_exact). This is the decode seam: a
    * real deployment swaps the 8-gram features for decoder-derived ones
    * (DCT coefficients of pixels), while everything downstream — the
    * corpus-parametric Manku multi-chunk key tables and the hamming ≤ r
    * verify — is modality-independent and exactly the machinery proven
    * complete (pigeonhole, DedupSpec) on text simhash.
    *
    * Scale: the 8-gram explode is ~8× byte amplification feeding one
    * map-side-partial 60-column aggregation — linear, no shuffle beyond
    * the per-doc agg (a real pHash decode costs more per byte); the pair
    * stage is the bounded key-table join. The oracle is the structurally
    * independent brute-force: ALL fingerprint pairs at hamming ≤ r —
    * proving the key tables lose nothing.
    */
  /** Duplicate fraction past which [[phashFingerprints]] routes through the
    * per-DISTINCT-payload kernel: the gram explode is ~8× byte
    * amplification, so fingerprinting once per distinct payload pays for
    * its extra payload pass + two digest joins once more than ~1/8 of the
    * corpus is byte-identical copies — the regime real media corpora live
    * in (mm_dedup_exact exists because of it). Below it (this repo's
    * synthetic corpus: 0.16% dups at sf1) the per-doc kernel is the faster
    * plan and the dispatch keeps it.
    */
  val PhashDistinctDupFrac = 0.125

  /** The stub pHash fingerprints (doc_id, sim) — shared by the pair query
    * and the ScaleStress bucket audit. Dispatches between two
    * output-identical kernels on the MEASURED byte-dup rate (the
    * dedup_embedding size-dispatch precedent): a digest-only aggregate
    * (count vs distinct-sha count — 32-byte shas shuffle, payloads never
    * do) picks per-doc below [[PhashDistinctDupFrac]], per-distinct above.
    */
  private[graft] def phashFingerprints(s: SparkSession, d: String): DataFrame = {
    val docs = withPayload(s, d)
      .select(col("doc_id"), sha2(col("payload"), 256).as("sha"))
    val Array(n, nd) = docs
      .agg(count(lit(1)).cast("long"), countDistinct(col("sha")).cast("long"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    phashFingerprintsOf(withPayload(s, d), docs,
      perDistinct = n > 0 && (n - nd).toDouble / n > PhashDistinctDupFrac)
  }

  /** Both fingerprint kernels over an explicit (doc_id, payload) frame +
    * its (doc_id, sha) digest projection — parameterized so MultimodalSpec
    * can prove output parity on a constructed dup-heavy corpus that the
    * synthetic testdata (byte-dup-free) never exercises through the
    * dispatch.
    *
    * The fingerprint itself is the native [[graft.functions.PhashSimhash]]
    * expression (r15 — the sf10 `weak` fix): distinct rolling 8-grams →
    * md5-top-60-bits → majority vote, one codegen'd pass per payload. The
    * declarative explode-form it replaced (one substring row per payload
    * byte feeding a 61-column aggregate) survives as MultimodalSpec's
    * parity reference and in the oracle SQL — semantics are pinned
    * identical; only the per-byte row amplification and the wide aggregate
    * are gone, which removes the fingerprint stage's shuffle entirely.
    *
    * Per-doc: fingerprint every payload. Per-distinct: elect min-doc_id
    * representative per sha (digest-only shuffle), fingerprint
    * REPRESENTATIVES only — byte-identical copies never re-pay the gram
    * scan — and map fingerprints back over the two digest-keyed joins.
    */
  private[graft] def phashFingerprintsOf(payloads: DataFrame, docs: DataFrame,
      perDistinct: Boolean): DataFrame = {
    def simsOf(df: DataFrame): DataFrame = df.select(col("doc_id"),
      graft.functions.PhashSimhash(col("payload")).as("sim"))
    if (!perDistinct) simsOf(payloads)
    else {
      val reps = docs.groupBy(col("sha")).agg(min(col("doc_id")).as("rep_id"))
      val repPayloads = payloads
        .join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      val repSims = simsOf(repPayloads)
        .select(col("doc_id").as("rep_id"), col("sim"))
      docs.join(reps, "sha").join(repSims, "rep_id")
        .select(col("doc_id"), col("sim"))
    }
  }

  /** Constellation fingerprint matching (Wang 2003, the Shazam landmark
    * algorithm) — TIME-OFFSET-ROBUST payload matching, the audio sibling
    * of `mm_phash_neardup` (which fingerprints the WHOLE payload and is
    * blind to "clip B is a segment of track A"). The decode seam is the
    * usual stub: a real deployment's STFT peak extractor is replaced by a
    * deterministic per-frame "peak bin" = portable-hash of each 16-byte
    * frame mod 65521; everything downstream — landmark pairing, inverted
    * key index, offset-histogram voting — is the real algorithm.
    *
    * Landmarks: for each frame t and fan-out j ∈ {1,2,3}, key =
    * (peak[t]·65521 + peak[t+j])·4 + j (a ~1.7·10¹⁰ key space, so chance
    * collisions stay negligible at any corpus size — the key space must
    * outgrow the landmark count or df-filtering collapses with scale).
    * A match between two payloads is a VOTE at their frame offset
    * δ = t_a − t_b; pairs where one offset accumulates ≥ [[ConstMinVotes]]
    * votes match AT that offset — byte-identical copies vote at δ = 0
    * with every landmark, a grid-aligned excerpt votes at its start frame.
    *
    * Scale: landmark generation is pure map-side (one flatten-transform
    * per payload, frames never materialize as rows); the postings
    * self-join is confined by (a) dropping keys seen in < 2 docs (cannot
    * match — the bulk of the index) and (b) capping key doc-frequency at
    * [[ConstMaxDf]] (the standard too-common-landmark suppression; also
    * the hot-postings quadratic guard, same role as PPJoin's prefix
    * bound). Votes aggregate map-side-partially on (a, b, δ).
    */
  val ConstWindow = 16
  val ConstPeakMod = 65521L // 16-bit prime "frequency bin" alphabet
  val ConstFanout = 3
  val ConstMaxDf = 64
  val ConstMinVotes = 8

  def mmConstellationFp(s: SparkSession, d: String): DataFrame =
    constellationOf(withPayload(s, d))

  /** The kernel over an explicit (doc_id, payload) frame — parameterized so
    * MultimodalSpec can prove the δ-offset voting and the df suppression on
    * constructed corpora (grid-aligned excerpts, >ConstMaxDf dup storms)
    * that the synthetic testdata never exercises.
    */
  private[graft] def constellationOf(payloads: DataFrame): DataFrame = {
    val posts = payloads
      .withColumn("nf", (octet_length(col("payload")) / ConstWindow).cast("long"))
      .filter(col("nf") >= 2)
      .withColumn("peaks", transform(
        sequence(lit(0L), col("nf") - 1),
        t => graft.functions.PortableHash.hexH(
          col("payload").substr((t * ConstWindow + 1).cast("int"), lit(ConstWindow)))
          % ConstPeakMod))
      .select(col("doc_id"), explode(flatten(transform(
        sequence(lit(0L), col("nf") - 2),
        t => transform(
          filter(sequence(lit(1L), lit(ConstFanout.toLong)), j => t + j <= col("nf") - 1),
          j => struct(t.as("t"),
            ((element_at(col("peaks"), (t + 1).cast("int")) * ConstPeakMod
              + element_at(col("peaks"), (t + j + 1).cast("int"))) * 4 + j).as("key")))))).as("lm"))
      .select(col("doc_id"), col("lm.t").as("t"), col("lm.key").as("key"))
      // three consumers (df counts + both self-join sides) — settle the
      // landmark scan once or the per-payload substring-hash pass, the
      // dominant stage, runs three times (r16; the simhashPairs precedent)
      .transform(graft.operators.Scale.materialize)
    val matchable = posts.groupBy(col("key"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= ConstMaxDf)
      .select(col("key"))
    val pp = posts.join(matchable, Seq("key"), "left_semi")
    val a = pp.select(col("key"), col("doc_id").as("media_a"), col("t").as("ta"))
    val b = pp.select(col("key"), col("doc_id").as("media_b"), col("t").as("tb"))
    a.join(b, a("key") === b("key") && col("media_a") < col("media_b"))
      .groupBy(col("media_a"), col("media_b"), (col("ta") - col("tb")).as("dt"))
      .agg(count(lit(1)).as("n_votes"))
      .filter(col("n_votes") >= ConstMinVotes)
  }

  def mmPhashNeardup(s: SparkSession, d: String): DataFrame = {
    val n = Tables.documents(s, d).count()
    val (widths, combos) = Dedup.simhashGeometry(n)
    Dedup.simhashPairs(
      Dedup.simhashKeys(phashFingerprints(s, d), widths, combos))
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }

  /** Cross-modal caption retrieval — the CLIP-role query of a multimodal
    * training pipeline: embed the media side and the text side into one
    * space, retrieve each media item's top-k candidate captions, and carry
    * an `is_self` marker so alignment quality (true caption's rank) is
    * read straight off the result. The media encoder is the decode-seam
    * stub: the SAME hashed-feature embedding as `text_hash_embed`, but
    * computed through a LOSSY channel (every 3rd token dropped) — a
    * deterministic stand-in for the modality gap; a real deployment swaps
    * in decoder-derived features and keeps everything downstream.
    *
    * Engine-exact by construction: dims are integer hash buckets, dot
    * products are INTEGER count sums (order-free), norms are sqrt of
    * integer sums (IEEE sqrt is correctly rounded), so cos =
    * int_dot / (l2q · l2c) is bit-identical in both engines — no float
    * accumulation-order hazard anywhere.
    *
    * Scale: the query side is a bounded broadcast (NumQueries dense
    * 64-long vectors); scoring is one linear pass over corpus embeddings
    * with a codegen'd zip_with fold; top-k is the two-phase bucketed
    * operator. The corpus-scale path for all-pairs retrieval is knn_graph;
    * this is the monitored-query shape.
    */
  val CapQueries = 10
  val CapK = 5

  def mmCaptionRetrieval(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.{tokens, detRound}
    import graft.functions.PortableHash.hexH
    val dim = Sampling.EmbedDim
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("dim", (hexH(col("tok")) % dim).cast("int"))
      .transform(Scale.materialize) // corpus and query embeddings both read it
    def densify(counts: DataFrame, key: String) = counts
      .groupBy(col(key), col("dim")).agg(count(lit(1)).as("c"))
      .groupBy(col(key))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("c")))).as("m"),
        sqrt(sum(col("c") * col("c")).cast("double")).as("l2"))
      .select(col(key),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("v"),
        col("l2"))
    val corpus = densify(toks.select(col("doc_id"), col("dim")), "doc_id")
    val queries = densify(
      toks.filter(col("doc_id") < CapQueries && (col("pos") + 1) % 3 =!= 0)
        .select(col("doc_id").as("q_id"), col("dim")), "q_id")
      .select(col("q_id"), col("v").as("qv"), col("l2").as("ql2"))
    // native integer dot (ArrayDotLong — the SQ8 shortlist kernel) instead
    // of the HOF aggregate(zip_with(...)) lambda, which falls out of
    // whole-stage codegen on this hot pairwise path (§4); integer sums are
    // order-free, so the value is identical by construction
    val scored = broadcast(queries).join(corpus)
      .withColumn("dot", graft.functions.NativeVector.dotLong(col("qv"), col("v")))
      .withColumn("cos", col("dot").cast("double") / (col("ql2") * col("l2")))
    graft.operators.Scale.topKPerGroup(
        scored.select(col("q_id"), col("doc_id"), col("cos")),
        Seq("q_id"), Seq(col("cos").desc, col("doc_id")),
        k = CapK, saltSrc = col("doc_id"))
      .select(col("q_id"), col("doc_id"), col("rnk").as("rank"),
        detRound(col("cos"), 6).as("cos"),
        when(col("q_id") === col("doc_id"), 1).otherwise(0).as("is_self"))
  }

  /** Per-kind media rollup — the dataset card for the binary side: volume,
    * bytes, dedup rate, stub-decoded dimension means (floor-rounded).
    */
  def mmKindStats(s: SparkSession, d: String): DataFrame =
    mmBinaryMeta(s, d)
      .withColumn("dup_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sha")).orderBy(col("doc_id"))))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(when(col("dup_rank") > 1, 1).otherwise(0)).as("n_dup_docs"),
        (floor(sum(col("width").cast("long")) / count(lit(1)) * 1e2) / 1e2).as("avg_width"),
        (floor(sum(col("height").cast("long")) / count(lit(1)) * 1e2) / 1e2).as("avg_height"))

  /** Byte-budget media shard packing — the manifest a multimodal training
    * loader consumes: a new shard every [[PackBytes]] payload bytes, doc
    * order preserved. Same two-phase `Scale.prefixSum` as corpus_pack (no
    * single-reducer global cumsum), summing payload SIZES only — the
    * payloads themselves never shuffle.
    */
  val PackBytes = 65536L

  def mmPack(s: SparkSession, d: String): DataFrame = {
    val sizes = withPayload(s, d)
      .select(col("doc_id"), octet_length(col("payload")).cast("long").as("n_bytes"))
    graft.operators.Scale.prefixSum(sizes, "doc_id", "n_bytes")
      .withColumn("shard", floor((col("cum") - col("n_bytes")) / PackBytes))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  // --------------------------------------------------------- byte entropy
  /** Per-kind payload byte diversity — the Gini–Simpson index over the
    * byte-value distribution (1 − Σc²/n², the probability two random
    * payload bytes differ), plus the distinct-byte alphabet width: the
    * compressibility/corruption screen a media lake runs per modality.
    * Near-zero diversity = constant filler (truncated uploads, zeroed
    * buffers); a full 256-value alphabet at high diversity = already-
    * compressed or encrypted payloads a transcoder shouldn't re-touch.
    * Rational and integer-exact (DECIMAL(38): Σc² at 100 TB per kind is
    * ~10²⁸).
    *
    * Plan (r11): the per-payload byte distribution comes from the native
    * [[graft.functions.ByteHistogram]] codegen expression (one bounded
    * 256-slot loop per payload inside the stage), posexploded to ≤256
    * (byte, count) rows per doc — NOT one row per byte. The old
    * `explode(transform(sequence(...)))` form was the sf10 smoke's worst
    * per-10× ratio (7.6×, 50.3 s): payload-sized row amplification through
    * the hash aggregate. Same (kind, byte) count groups, same oracle;
    * measured sf1 6.6→1.1 s, sf10 50.3→2.7 s (2.5× per 10× — sublinear;
    * BENCH_sf10.json).
    */
  def mmPayloadEntropy(s: SparkSession, d: String): DataFrame =
    withPayload(s, d)
      .select(kind.as("kind"),
        posexplode(graft.functions.ByteHistogram(col("payload")))
          .as(Seq("b", "c0")))
      .filter(col("c0") > 0)
      .groupBy(col("kind"), col("b")).agg(sum(col("c0")).as("c"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("c")).as("n_bytes"),
        expr("CAST((CAST(sum(c) AS DECIMAL(38,0)) * sum(c) " +
          "- sum(CAST(c AS DECIMAL(38,0)) * c)) * 1000000 " +
          "div (CAST(sum(c) AS DECIMAL(38,0)) * sum(c)) AS BIGINT)")
          .as("simpson_ppm"))

  // ------------------------------------------------------ size percentiles
  /** Per-kind payload size profile — exact type-1 percentiles (p25/p50/
    * p75/p90) and max of payload bytes, the shard-sizing and
    * decode-budget planning view (a video corpus whose p90 is 100× its
    * p50 packs very differently from a uniform one). Counting method on
    * the bounded (kind × distinct size) frame — the
    * orders_fulfillment_latency discipline; no per-group value buffer.
    */
  def mmSizePercentiles(s: SparkSession, d: String): DataFrame = {
    val sizes = withPayload(s, d)
      .select(kind.as("kind"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("kind"), col("n_bytes")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind")).orderBy(col("n_bytes"))
    val wk = org.apache.spark.sql.expressions.Window.partitionBy(col("kind"))
    sizes
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wk))
      .groupBy(col("kind"))
      .agg(max(col("n")).as("n_docs"),
        min(when(col("cum") * 4 >= col("n"), col("n_bytes"))).as("p25_bytes"),
        min(when(col("cum") * 2 >= col("n"), col("n_bytes"))).as("p50_bytes"),
        min(when(col("cum") * 4 >= col("n") * 3, col("n_bytes"))).as("p75_bytes"),
        min(when(col("cum") * 10 >= col("n") * 9, col("n_bytes"))).as("p90_bytes"),
        max(col("n_bytes")).as("max_bytes"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_payload_entropy" -> mmPayloadEntropy,
    "mm_size_percentiles" -> mmSizePercentiles,
    "mm_binary_meta" -> mmBinaryMeta,
    "mm_frame_sample" -> mmFrameSample,
    "mm_dedup_exact" -> mmDedupExact,
    "mm_phash_neardup" -> mmPhashNeardup,
    "mm_constellation_fp" -> mmConstellationFp,
    "mm_kind_stats" -> mmKindStats,
    "mm_pack" -> mmPack,
    "mm_caption_retrieval" -> mmCaptionRetrieval,
  )

  val oracles: Map[String, String] = Map(
    // BYTE entropy on both engines: DuckDB has no BLOB substring, so the
    // oracle slices 2-char pairs of hex(encode(text)) — one pair per byte
    // of the UTF-8 encoding, byte-exact for multibyte text too (a char
    // slice of the VARCHAR would diverge from Spark's binary slice on any
    // non-ASCII document). Distinct/Simpson over hex pairs ≡ over bytes.
    "mm_payload_entropy" ->
      """WITH b AS (SELECT
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    unnest(list_transform(range(1, octet_length(encode(text))
        |      + 1), i -> substr(hex(encode(text)), CAST(2*i-1 AS INT), 2))) AS b
        |  FROM documents),
        |ct AS (SELECT kind, b, count(*) AS c FROM b GROUP BY 1, 2)
        |SELECT kind, count(*) AS n_distinct, CAST(sum(c) AS BIGINT) AS n_bytes,
        |  CAST((CAST(sum(c) AS HUGEINT) * sum(c)
        |      - sum(CAST(c AS HUGEINT) * c)) * 1000000
        |    // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT) AS simpson_ppm
        |FROM ct GROUP BY 1""".stripMargin,
    "mm_size_percentiles" ->
      """WITH m AS (SELECT
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |ct AS (SELECT kind, n_bytes, count(*) AS cnt FROM m GROUP BY 1, 2),
        |cw AS (SELECT kind, n_bytes,
        |    sum(cnt) OVER (PARTITION BY kind ORDER BY n_bytes) AS cum,
        |    sum(cnt) OVER (PARTITION BY kind) AS n FROM ct)
        |SELECT kind, CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST(min(CASE WHEN cum * 4 >= n THEN n_bytes END) AS BIGINT)
        |    AS p25_bytes,
        |  CAST(min(CASE WHEN cum * 2 >= n THEN n_bytes END) AS BIGINT)
        |    AS p50_bytes,
        |  CAST(min(CASE WHEN cum * 4 >= n * 3 THEN n_bytes END) AS BIGINT)
        |    AS p75_bytes,
        |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN n_bytes END) AS BIGINT)
        |    AS p90_bytes,
        |  CAST(max(n_bytes) AS BIGINT) AS max_bytes
        |FROM cw GROUP BY 1""".stripMargin,
    "mm_caption_retrieval" -> {
      val toksSql =
        "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"
      val h = graft.functions.PortableHash.hexHSql("tok")
      s"""WITH t AS (SELECT doc_id, unnest(toks) AS tok,
         |    generate_subscripts(toks, 1) AS pos
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
         |hh AS (SELECT doc_id, pos, CAST($h % ${Sampling.EmbedDim} AS INT) AS dim FROM t),
         |c AS (SELECT doc_id, dim, CAST(count(*) AS BIGINT) AS c FROM hh GROUP BY 1, 2),
         |cn AS (SELECT doc_id, sqrt(CAST(sum(c*c) AS DOUBLE)) AS l2 FROM c GROUP BY 1),
         |q AS (SELECT doc_id AS q_id, dim, CAST(count(*) AS BIGINT) AS cq
         |  FROM hh WHERE doc_id < $CapQueries AND pos % 3 <> 0 GROUP BY 1, 2),
         |qn AS (SELECT q_id, sqrt(CAST(sum(cq*cq) AS DOUBLE)) AS l2 FROM q GROUP BY 1),
         |dotp AS (SELECT q_id, c.doc_id, CAST(sum(cq * c.c) AS BIGINT) AS d
         |  FROM q JOIN c USING (dim) GROUP BY 1, 2),
         |pairs AS (SELECT q_id, doc_id FROM (SELECT DISTINCT q_id FROM q),
         |  (SELECT DISTINCT doc_id FROM c)),
         |sc AS (SELECT p.q_id, p.doc_id,
         |    CAST(coalesce(d, 0) AS DOUBLE) / (qn.l2 * cn.l2) AS cos
         |  FROM pairs p
         |  LEFT JOIN dotp ON p.q_id = dotp.q_id AND p.doc_id = dotp.doc_id
         |  JOIN qn ON p.q_id = qn.q_id JOIN cn ON p.doc_id = cn.doc_id),
         |r AS (SELECT q_id, doc_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS rank
         |  FROM sc)
         |SELECT q_id, doc_id, rank, floor(cos*1e6)/1e6 AS cos,
         |  CASE WHEN q_id = doc_id THEN 1 ELSE 0 END AS is_self
         |FROM r WHERE rank <= $CapK""".stripMargin
    },
    // Byte-length fields across these oracles use octet_length(encode(text))
    // — byte-exact for ANY text, and unlike CAST(text AS BLOB) it cannot
    // ERROR (DuckDB rejects VARCHAR→BLOB casts containing non-ASCII).
    // The two remaining char-based slices — this oracle's 8-grams and
    // mm_frame_sample's frame_sha — keep the documented ASCII assumption:
    // this DuckDB's sha256() accepts only VARCHAR, so a byte-slice hash
    // has no restatement (frame BYTE COUNTS are exact via least()).
    // structurally independent: brute-force ALL pairs at the radius (the
    // dedup_simhash oracle pattern) — proves the key tables lose nothing.
    // ASCII payloads make DuckDB's char-based substr byte-identical to
    // Spark's binary substr.
    "mm_phash_neardup" ->
      s"""WITH g AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, greatest(octet_length(encode(text)) - 7, 1) + 1),
         |    i -> substr(text, CAST(i AS INT), 8))) AS gs FROM documents),
         |hb AS (SELECT doc_id,
         |  list_transform(gs, gk -> ${graft.functions.PortableHash.hexHSql("gk")}) AS hts FROM g),
         |sh AS (SELECT doc_id,
         |  list_sum(list_transform(range(0, 60), i ->
         |    CASE WHEN list_sum(list_transform(hts, h -> ((h >> i) & 1)*2 - 1)) > 0
         |         THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS sim
         |  FROM hb)
         |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
         |  bit_count(xor(a.sim, b.sim)) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= ${Dedup.SimhashRadius}""".stripMargin,
    // Same documented ASCII assumption as mm_frame_sample/mm_phash_neardup:
    // DuckDB's char-based substr ≡ Spark's binary substr on this corpus,
    // and md5 of the same 16 bytes agrees. The landmark algebra is pure
    // integer arithmetic restated verbatim.
    "mm_constellation_fp" -> {
      val pk = graft.functions.PortableHash.hexHSql(
        s"substr(text, CAST(t*$ConstWindow + 1 AS INT), $ConstWindow)")
      s"""WITH p AS (SELECT doc_id, text,
         |    octet_length(encode(text)) // $ConstWindow AS nf
         |  FROM documents WHERE octet_length(encode(text)) // $ConstWindow >= 2),
         |f AS (SELECT doc_id, unnest(range(0, nf)) AS t, text, nf FROM p),
         |pk AS (SELECT doc_id, t, nf, $pk % $ConstPeakMod AS peak FROM f),
         |lm AS (SELECT a.doc_id, a.t AS t,
         |    (a.peak * $ConstPeakMod + b.peak) * 4 + j.j AS key
         |  FROM pk a
         |  JOIN (VALUES (1), (2), (3)) j(j) ON TRUE
         |  JOIN pk b ON b.doc_id = a.doc_id AND b.t = a.t + j.j),
         |kd AS (SELECT key FROM (SELECT key, count(DISTINCT doc_id) AS df
         |    FROM lm GROUP BY 1) WHERE df BETWEEN 2 AND $ConstMaxDf),
         |pp AS (SELECT lm.* FROM lm JOIN kd USING (key))
         |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
         |  CAST(a.t - b.t AS BIGINT) AS dt,
         |  CAST(count(*) AS BIGINT) AS n_votes
         |FROM pp a JOIN pp b ON a.key = b.key AND a.doc_id < b.doc_id
         |GROUP BY 1, 2, 3
         |HAVING count(*) >= $ConstMinVotes""".stripMargin
    },
    "mm_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |c AS (SELECT doc_id, n_bytes,
         |    sum(n_bytes) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t),
         |sh AS (SELECT doc_id, n_bytes,
         |    CAST(floor(CAST(cum - n_bytes AS DOUBLE) / $PackBytes) AS BIGINT) AS shard FROM c)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
         | min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM sh GROUP BY 1""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | octet_length(encode(text)) AS n_bytes,
        | sha256(text) AS sha,
        | 64 + octet_length(encode(text)) % 1216 AS width,
        | 64 + (octet_length(encode(text)) * 7) % 656 AS height
        |FROM documents""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH p AS (SELECT doc_id, text,
         |    CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / $FrameBytes) AS BIGINT) AS n_frames
         |  FROM documents),
         |f AS (SELECT doc_id, n_frames, unnest(list_filter(range(0, n_frames), i -> i % $SampleEvery = 0)) AS frame_idx
         |  FROM p)
         |SELECT f.doc_id, f.n_frames, frame_idx,
         |  sha256(substring(p.text, CAST(frame_idx*$FrameBytes + 1 AS INT), $FrameBytes)) AS frame_sha,
         |  least($FrameBytes, octet_length(encode(p.text)) - frame_idx*$FrameBytes) AS frame_bytes
         |FROM f JOIN p ON f.doc_id = p.doc_id""".stripMargin,
    "mm_dedup_exact" ->
      """SELECT sha256(text) AS sha, min(doc_id) AS keep_id, count(*) AS n_dups,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1""".stripMargin,
    "mm_kind_stats" ->
      """WITH m AS (SELECT doc_id,
        |   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   octet_length(encode(text)) AS n_bytes,
        |   sha256(text) AS sha,
        |   64 + octet_length(encode(text)) % 1216 AS width,
        |   64 + (octet_length(encode(text)) * 7) % 656 AS height
        | FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY sha ORDER BY doc_id) AS dup_rank FROM m)
        |SELECT kind, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        | CAST(sum(CASE WHEN dup_rank > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        | floor(CAST(sum(width) AS DOUBLE)/count(*)*1e2)/1e2 AS avg_width,
        | floor(CAST(sum(height) AS DOUBLE)/count(*)*1e2)/1e2 AS avg_height
        |FROM r GROUP BY 1""".stripMargin,
  )
}
