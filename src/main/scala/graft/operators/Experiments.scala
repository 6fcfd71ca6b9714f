package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash.{hexH, hexHSql}

/** Experimentation & distribution-shift statistics over the behavioral
  * stream — the measurement layer a data pipeline needs next to its marts:
  * deterministic A/B bucketing with a two-sample z-test, and an exact
  * two-sample Kolmogorov–Smirnov statistic for per-source distribution
  * drift.
  *
  * Reference anchor: the reference's mart role (init-clickhouse.sql) stops
  * at daily aggregates; these are the two canonical next questions asked of
  * the same events/documents tables ("did the experiment move the metric?",
  * "does this source's length distribution drift from the corpus?").
  *
  * Scale design: `events_ab_test` is two groupBys whose state is one row
  * per user then one row per variant (all map-side partial, DECIMAL-exact
  * sums so the shuffle order can never change a bit); `text_length_ks`
  * confines the quadratic-looking CDF grid to |sources| x |distinct
  * lengths| rows (both bounded corpus statistics, NOT corpus-sized), built
  * by a broadcast of the tiny length-value frame; everything until the
  * final division is 64-bit integer arithmetic, so the DuckDB oracle is
  * hash-exact by construction.
  */
object Experiments {

  /** |z| above which the A/B verdict reports significance (two-sided 5%). */
  val AbZCrit = 1.96

  /** Deterministic hash-bucket A/B test over purchase revenue per user.
    *
    * Assignment is `hexH("ab:"||user_id) % 2` — the portable md5 family, so
    * the split is stable across runs, engines, and cluster layouts (the
    * property a real experiment system needs: a user never flips variant).
    * Metric = per-user total purchase value, zero-purchase users included
    * (dropping them biases the denominator). Welch z-score from
    * DECIMAL-exact sums: sum(x) and sum(x^2) stay decimal through the
    * shuffle (order-independent), doubles appear only in the final scalar
    * arithmetic, stated identically in the oracle.
    */
  /** Per-user conditional purchase totals — ONE aggregation over the raw
    * stream (every user appears; non-purchasers sum all-NULL → NULL).
    * This frame is exactly the state a streaming Complete-mode agg keeps
    * (one running decimal row per user), which is how [[graft.streaming
    * .StreamQueries]] runs the same experiment incrementally.
    */
  def abUserTotals(ev: DataFrame): DataFrame = ev
    .groupBy(col("user_id"))
    .agg(sum(when(col("event_type") === "purchase",
      col("value").cast("decimal(18,4)"))).as("m"))

  /** Variant assembly over the per-user totals: deterministic hash
    * assignment, Welch moments, z + verdict.
    */
  def abFromUserTotals(um0: DataFrame): DataFrame = {
    val um = um0.select(
      (hexH(concat(lit("ab:"), col("user_id"))) % 2).cast("int").as("variant"),
      coalesce(col("m"), lit(0).cast("decimal(18,4)")).as("m"))
    // per-user totals fit (18,4); the (18,4)x(18,4) product is (37,8) —
    // exact in BOTH engines (a wider multiply would trip Spark's decimal
    // precision-loss truncation and diverge from DuckDB)
    val m4 = col("m").cast("decimal(18,4)")
    val agg = um.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("m")).as("sx"),
        sum((m4 * m4).cast("decimal(38,8)")).as("sxx"))
      .select(col("variant"), col("n_users"),
        col("sx").cast("double").as("sx"), col("sxx").cast("double").as("sxx"))
      .withColumn("mean_m", col("sx") / col("n_users"))
      .withColumn("var_m",
        (col("sxx") - col("sx") * col("sx") / col("n_users")) /
          (col("n_users") - lit(1)))
    val a = agg.filter(col("variant") === 0)
      .select(col("n_users").as("n0"), col("mean_m").as("m0"), col("var_m").as("v0"))
    val b = agg.filter(col("variant") === 1)
      .select(col("n_users").as("n1"), col("mean_m").as("m1"), col("var_m").as("v1"))
    // one row x one row: scalar assembly, no row multiplication
    a.crossJoin(b)
      .withColumn("z", (col("m1") - col("m0")) /
        sqrt(col("v1") / col("n1") + col("v0") / col("n0")))
      .select(col("n0"), col("n1"),
        (floor(col("m0") * 1e4) / 1e4).as("mean0"),
        (floor(col("m1") * 1e4) / 1e4).as("mean1"),
        (floor(col("z") * 1e4) / 1e4).as("z_score"),
        (abs(col("z")) > lit(AbZCrit)).as("significant"))
  }

  def eventsAbTest(s: SparkSession, d: String): DataFrame =
    abFromUserTotals(abUserTotals(Tables.events(s, d)))

  private[graft] val abOracleSql: String =
    s"""WITH ut AS (SELECT user_id,
       |    sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(value AS DECIMAL(18,4)) END) AS m
       |  FROM events GROUP BY 1),
       |um AS (SELECT CAST(${hexHSql("'ab:' || user_id")} % 2 AS INT) AS variant,
       |    coalesce(m, CAST(0 AS DECIMAL(18,4))) AS m
       |  FROM ut),
       |ag AS (SELECT variant, count(*) AS n_users,
       |    CAST(sum(m) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(CAST(m AS DECIMAL(18,4)) * CAST(m AS DECIMAL(18,4))
       |      AS DECIMAL(38,8))) AS DOUBLE) AS sxx
       |  FROM um GROUP BY 1),
       |st AS (SELECT variant, n_users, sx / n_users AS mean_m,
       |    (sxx - sx * sx / n_users) / (n_users - 1) AS var_m FROM ag)
       |SELECT a.n_users AS n0, b.n_users AS n1,
       |  floor(a.mean_m * 1e4) / 1e4 AS mean0,
       |  floor(b.mean_m * 1e4) / 1e4 AS mean1,
       |  floor(((b.mean_m - a.mean_m)
       |    / sqrt(b.var_m / b.n_users + a.var_m / a.n_users)) * 1e4) / 1e4 AS z_score,
       |  abs((b.mean_m - a.mean_m)
       |    / sqrt(b.var_m / b.n_users + a.var_m / a.n_users)) > ${AbZCrit}e0 AS significant
       |FROM (SELECT * FROM st WHERE variant = 0) a,
       |     (SELECT * FROM st WHERE variant = 1) b""".stripMargin

  /** Exact two-sample KS statistic: each source's document-length
    * distribution vs the REST of the corpus.
    *
    * The sup of |F_s - F_rest| over step CDFs is attained at some observed
    * length value, so evaluating on the global distinct-length grid is
    * exact. The comparison stays integer: D(x) ~ |c_s(x)*n_r - c_r(x)*n_s|
    * with the division by n_s*n_r deferred to the final projection —
    * engines can't disagree on 64-bit integer maxima. Grid = |sources| x
    * |distinct lengths| (corpus STATISTICS, bounded — a 100 TB corpus still
    * has ~1e3 sources x ~1e5 length values), built by broadcasting the
    * length-value frame; c_s fills via a per-source running sum over the
    * grid, never a range join.
    */
  def textLengthKs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
    val srcN = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val perVal = docs.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("delta"))
    val vals = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("delta_all"))
    val n = docs.count() // metadata-cheap scalar; total doc count
    // grid: every source x every global length value (bounded x bounded)
    val grid = srcN.crossJoin(broadcast(vals))
      .join(perVal, Seq("source", "n_chars"), "left_outer")
      .select(col("source"), col("n_s"), col("n_chars"),
        col("delta_all"), coalesce(col("delta"), lit(0L)).as("delta"))
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"))
    val cdf = grid
      .withColumn("c_s", sum(col("delta")).over(w))
      .withColumn("c_all", sum(col("delta_all")).over(w))
      .withColumn("n_r", lit(n) - col("n_s"))
      .withColumn("num",
        abs(col("c_s") * col("n_r") - (col("c_all") - col("c_s")) * col("n_s")))
    val wsrc = Window.partitionBy(col("source"))
    cdf.withColumn("maxnum", max(col("num")).over(wsrc))
      .filter(col("num") === col("maxnum"))
      .groupBy(col("source"), col("n_s"), col("n_r"), col("maxnum"))
      .agg(min(col("n_chars")).as("ks_at"))
      .select(col("source"), col("n_s").as("n_docs"),
        (floor(col("maxnum").cast("double") / (col("n_s") * col("n_r")).cast("double") * 1e6) / 1e6)
          .as("ks_stat"),
        col("ks_at"))
  }

  private val ksOracleSql: String =
    s"""WITH docs AS (SELECT source, n_chars FROM documents),
       |srcn AS (SELECT source, count(*) AS n_s FROM docs GROUP BY 1),
       |perval AS (SELECT source, n_chars, count(*) AS delta FROM docs GROUP BY 1, 2),
       |vals AS (SELECT n_chars, count(*) AS delta_all FROM docs GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM docs),
       |grid AS (SELECT s.source, s.n_s, v.n_chars, v.delta_all,
       |    coalesce(p.delta, 0) AS delta
       |  FROM srcn s CROSS JOIN vals v
       |  LEFT JOIN perval p ON p.source = s.source AND p.n_chars = v.n_chars),
       |cdf AS (SELECT source, n_s, n_chars,
       |    sum(delta) OVER (PARTITION BY source ORDER BY n_chars) AS c_s,
       |    sum(delta_all) OVER (PARTITION BY source ORDER BY n_chars) AS c_all
       |  FROM grid),
       |num AS (SELECT source, n_s, n_chars, (SELECT n FROM n) - n_s AS n_r,
       |    abs(c_s * ((SELECT n FROM n) - n_s) - (c_all - c_s) * n_s) AS num
       |  FROM cdf),
       |mx AS (SELECT source, n_s, n_r, max(num) AS maxnum FROM num GROUP BY 1, 2, 3)
       |SELECT mx.source, mx.n_s AS n_docs,
       |  floor(CAST(maxnum AS DOUBLE) / CAST(mx.n_s * mx.n_r AS DOUBLE) * 1e6) / 1e6 AS ks_stat,
       |  (SELECT min(n_chars) FROM num
       |    WHERE num.source = mx.source AND num.num = mx.maxnum) AS ks_at
       |FROM mx""".stripMargin

  /** The conversion event type and the attributable channel states for the
    * Markov attribution model (the corpus event alphabet minus the
    * conversion — a literal parametrization, the Bm25Queries pattern).
    */
  val MkConv = "purchase"
  val MkChannels = Seq("click", "error", "signup", "view")
  val MkScale = 1000000000L // 1e9 fixed-point probability/mass units
  val MkSteps = 16

  /** First-order Markov removal-effect attribution (Anderl et al. 2014 —
    * the data-driven alternative to last-touch): sessions become
    * START → touchpoints → CONV/NULL paths (truncated at the first
    * conversion), transition counts collapse to the ≤ (types+3)² alphabet,
    * and each channel's credit is its REMOVAL EFFECT — how much K-step
    * absorption mass CONV loses when the channel is made absorbing-to-NULL
    * (entering it never converts).
    *
    * Scale design: the only corpus-sized work is the sessionize window and
    * one alphabet-bounded count agg (map-side partial); everything after —
    * quantized probabilities, the 5 graph variants, [[MkSteps]] propagation
    * steps, removal shares — runs on ≤ |graphs|·(types+3)² rows,
    * re-materialized per step (the Graph.scala superstep discipline, flat
    * lineage, trivial jobs). Arithmetic is LONG FIXED-POINT end to end
    * (the Graph.scala PageRank discipline): probabilities `cnt·1e9 div
    * rowtotal` (HUGEINT/DECIMAL(38,0) intermediate so the multiply can't
    * overflow at any SF), per-term floored mass products summed exactly —
    * deterministic BY CONSTRUCTION, so the oracle restates the identical
    * unrolled steps and is hash-exact including the stated truncation.
    * Removal numerators are `greatest(·,0)`-clamped BEFORE the integer
    * division: Spark's `div` truncates toward zero while DuckDB's `//`
    * floors, so negatives must never reach the divide.
    */
  def eventsAttributionMarkov(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sess = Analytics.sessionAssigned(s, d)
      .select(col("user_id"), col("session_seq"), col("ts"), col("event_id"),
        col("event_type"))
    val win = Window.partitionBy(col("user_id"), col("session_seq"))
    val withFp = sess.withColumn("fp",
      min(when(col("event_type") === MkConv,
        struct(col("ts"), col("event_id")))).over(win))
    val wOrd = win.orderBy(col("ts"), col("event_id"))
    val kept = withFp
      .filter(col("event_type") =!= MkConv &&
        (col("fp").isNull || struct(col("ts"), col("event_id")) < col("fp")))
      .withColumn("nxt", lead(col("event_type"), 1).over(wOrd))
      .withColumn("rn", row_number().over(wOrd))
    val ss = sess.groupBy(col("user_id"), col("session_seq"))
      .agg(max(when(col("event_type") === MkConv, 1).otherwise(0)).as("has_p"))
    val term = when(col("has_p") === 1, lit("CONV")).otherwise(lit("NULL"))
    val tr1 = kept.join(ss, Seq("user_id", "session_seq"))
      .select(col("event_type").as("src"), coalesce(col("nxt"), term).as("dst"))
    val firstKept = kept.filter(col("rn") === 1)
      .select(col("user_id"), col("session_seq"), col("event_type").as("ft"))
    val tr2 = ss.join(firstKept, Seq("user_id", "session_seq"), "left_outer")
      .select(lit("START").as("src"), coalesce(col("ft"), term).as("dst"))
    // ≤ alphabet² rows — a bounded literal model (the IVF-centroid collect
    // discipline): everything downstream of this count is O(1) in the
    // corpus, so the [[MkSteps]]-step propagation runs as exact driver
    // Long/BigInt fixed-point arithmetic instead of 16 sequential Spark
    // supersteps of a ≤ 245-row frame (r15 — 16 materialize fences were
    // ~5 s of pure job latency at every SF; identical truncation semantics:
    // nonnegative `div` = floor in both engines, per-term floored products,
    // HUGEINT-wide quantization).
    val counts = tr1.union(tr2).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val tot: Map[String, Long] =
      counts.groupBy(_._1).map { case (k, v) => (k, v.map(_._3).sum) }
    val pq: Seq[(String, String, Long)] = counts.toSeq.map { case (src, dst, cnt) =>
      (src, dst, (BigInt(cnt) * MkScale / BigInt(tot(src))).toLong) }
    val graphNames = "_full" +: MkChannels
    val gp: Map[String, Seq[(String, String, Long)]] = graphNames.map { g =>
      val kept = if (g == "_full") pq else pq.filter(_._1 != g)
      val absorbChan = if (g == "_full") Seq.empty else Seq((g, "NULL", MkScale))
      g -> (kept ++ absorbChan ++
        Seq(("CONV", "CONV", MkScale), ("NULL", "NULL", MkScale)))
    }.toMap
    var m: Map[String, Map[String, Long]] =
      graphNames.map(g => g -> Map("START" -> MkScale)).toMap
    for (_ <- 1 to MkSteps) {
      m = m.map { case (g, st) =>
        g -> gp(g).flatMap { case (src, dst, p) =>
            st.get(src).map(mass => dst -> (mass * p / MkScale)) }
          .groupBy(_._1).map { case (dst, terms) => (dst, terms.map(_._2).sum) }
      }.filter(_._2.nonEmpty)
    }
    val convQ: Map[String, Long] =
      m.map { case (g, st) => (g, st.getOrElse("CONV", 0L)) }
    val out = convQ.get("_full").toSeq.flatMap { convFull =>
      val re = MkChannels.filter(convQ.contains).map { ch =>
        val convq = convQ(ch)
        val removal = if (convFull > 0)
          math.max(convFull - convq, 0L) * 1000000L / convFull else 0L
        (ch, convq, removal)
      }
      val sRe = re.map(_._3).sum
      re.map { case (ch, convq, removal) =>
        Row(ch, convFull / 1000L, convq / 1000L, removal,
          if (sRe > 0) removal * 1000000L / sRe else 0L)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("channel",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("conv_ppm",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("drop_conv_ppm",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("removal_ppm",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("attribution_ppm",
        org.apache.spark.sql.types.LongType)))
    s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
  }

  private val markovOracleSql: String = {
    val graphVals = ("_full" +: MkChannels).map(g => s"('$g')").mkString(", ")
    val steps = (1 to MkSteps).map { k =>
      s"""m$k AS MATERIALIZED (SELECT g2 AS g, dst AS st, CAST(sum(m * p // $MkScale) AS BIGINT) AS m
         |  FROM m${k - 1} JOIN gp ON gp.g2 = m${k - 1}.g AND gp.src = m${k - 1}.st
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS MATERIALIZED (
       |  SELECT user_id, ts, event_id, event_type,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
       |  FROM flagged),
       |fpr AS (SELECT user_id, session_seq, ts, event_id, row_number() OVER (
       |    PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS prn
       |  FROM sess WHERE event_type = '$MkConv'),
       |fp AS (SELECT user_id, session_seq, ts AS pts, event_id AS peid
       |  FROM fpr WHERE prn = 1),
       |kept AS (SELECT e.user_id, e.session_seq, e.ts, e.event_id, e.event_type
       |  FROM sess e LEFT JOIN fp f USING (user_id, session_seq)
       |  WHERE e.event_type <> '$MkConv'
       |    AND (f.peid IS NULL OR (e.ts, e.event_id) < (f.pts, f.peid))),
       |kt AS (SELECT user_id, session_seq, event_type,
       |    lead(event_type) OVER w2 AS nxt, row_number() OVER w2 AS rn
       |  FROM kept
       |  WINDOW w2 AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)),
       |ss AS (SELECT user_id, session_seq,
       |    max(CASE WHEN event_type = '$MkConv' THEN 1 ELSE 0 END) AS has_p
       |  FROM sess GROUP BY 1, 2),
       |tr AS (
       |  SELECT k.event_type AS src,
       |    coalesce(k.nxt, CASE WHEN s.has_p = 1 THEN 'CONV' ELSE 'NULL' END) AS dst
       |  FROM kt k JOIN ss s USING (user_id, session_seq)
       |  UNION ALL
       |  SELECT 'START' AS src,
       |    coalesce(f.ft, CASE WHEN s.has_p = 1 THEN 'CONV' ELSE 'NULL' END) AS dst
       |  FROM ss s LEFT JOIN (SELECT user_id, session_seq, event_type AS ft
       |    FROM kt WHERE rn = 1) f USING (user_id, session_seq)),
       |cnts AS (SELECT src, dst, count(*) AS cnt FROM tr GROUP BY 1, 2),
       |tot AS (SELECT src, sum(cnt) AS tot FROM cnts GROUP BY 1),
       |pq AS (SELECT src, dst,
       |    CAST((CAST(cnt AS HUGEINT) * $MkScale) // CAST(tot AS HUGEINT) AS BIGINT) AS p
       |  FROM cnts JOIN tot USING (src)),
       |graphs(g2) AS (VALUES $graphVals),
       |gp AS MATERIALIZED (
       |  SELECT g2, src, dst, p FROM graphs, pq WHERE g2 = '_full' OR src <> g2
       |  UNION ALL
       |  SELECT g2, g2 AS src, 'NULL' AS dst, CAST($MkScale AS BIGINT) AS p
       |    FROM graphs WHERE g2 <> '_full'
       |  UNION ALL
       |  SELECT g2, s AS src, s AS dst, CAST($MkScale AS BIGINT) AS p
       |    FROM graphs, (VALUES ('CONV'), ('NULL')) t(s)),
       |m0 AS (SELECT g2 AS g, 'START' AS st, CAST($MkScale AS BIGINT) AS m FROM graphs),
       |$steps,
       |conv AS (SELECT g, coalesce(max(CASE WHEN st = 'CONV' THEN m END), 0) AS conv_q
       |  FROM m$MkSteps GROUP BY 1),
       |base AS (SELECT conv_q AS conv_full FROM conv WHERE g = '_full'),
       |re AS (SELECT g AS channel, conv_q, conv_full,
       |    CASE WHEN conv_full > 0
       |      THEN greatest(conv_full - conv_q, 0) * 1000000 // conv_full
       |      ELSE CAST(0 AS BIGINT) END AS removal_ppm
       |  FROM conv, base WHERE g <> '_full'),
       |ret AS (SELECT CAST(sum(removal_ppm) AS BIGINT) AS s_re FROM re)
       |SELECT channel, conv_full // 1000 AS conv_ppm, conv_q // 1000 AS drop_conv_ppm,
       |  removal_ppm,
       |  CASE WHEN s_re > 0 THEN removal_ppm * 1000000 // s_re
       |    ELSE CAST(0 AS BIGINT) END AS attribution_ppm
       |FROM re, ret""".stripMargin
  }

  /** Cadence thresholds for the bot triage (seconds; calibrated to the
    * corpus's per-user median-gap spread — 5th..95th pct ≈ 20k..34k).
    */
  val BotMedGap = 24000L
  val BotMinGap = 60L
  val RegMedGap = 30000L

  /** Behavioral bot/automation triage — the abuse-filter stage a pipeline
    * runs before training on behavioral data: per-user inter-arrival
    * cadence (FLOOR-median gap = the k-th smallest with k = (n+1) div 2 —
    * an exact integer order statistic, no interpolation to diverge on),
    * burst floor (min gap), and error ratio, classed by literal thresholds
    * into bot_like / rapid / regular / sporadic and rolled up per verdict.
    *
    * Scale: gaps are one user-keyed lag window; the median is a
    * row_number over the same per-user partitions (k-th VALUE is
    * well-defined even though row identity among equal gaps isn't); all
    * joins are user-keyed (co-partitioned with the windows); the report is
    * bounded at 4 rows. Everything is 64-bit integer (epoch seconds,
    * `*1e6 div` ratios) ⇒ hash-exact. Users with no gaps (single event)
    * have NULL med/min, which falls through every threshold comparison to
    * 'sporadic' identically in both engines.
    */
  def eventsBotTriage(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val gaps = ev
      .withColumn("gap",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser)))
      .filter(col("gap").isNotNull)
    val wG = Window.partitionBy(col("user_id")).orderBy(col("gap"))
    val med = gaps
      .withColumn("rn", row_number().over(wG))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("user_id"), col("gap").as("med_gap"))
    val mins = gaps.groupBy(col("user_id")).agg(min(col("gap")).as("min_gap"))
    val stats = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
    val verdict =
      when(col("med_gap") <= BotMedGap && col("min_gap") <= BotMinGap, "bot_like")
        .when(col("med_gap") <= BotMedGap, "rapid")
        .when(col("med_gap") <= RegMedGap, "regular")
        .otherwise("sporadic")
    stats.join(med, Seq("user_id"), "left_outer")
      .join(mins, Seq("user_id"), "left_outer")
      .withColumn("verdict", verdict)
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        sum(col("med_gap")).as("sum_med"),
        sum(col("n_err")).as("sum_err"))
      .select(col("verdict"), col("n_users"), col("n_events"),
        expr("sum_med div n_users").as("avg_med_gap"),
        expr("sum_err * 1000000 div n_events").as("err_ppm"))
  }

  private val botOracleSql: String =
    s"""WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events),
       |g0 AS (SELECT user_id, date_diff('second', lag(ts) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap FROM ev),
       |gaps AS (SELECT user_id, gap FROM g0 WHERE gap IS NOT NULL),
       |med AS (SELECT user_id, gap AS med_gap FROM (
       |    SELECT user_id, gap,
       |      row_number() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
       |      count(*) OVER (PARTITION BY user_id) AS cnt
       |    FROM gaps) WHERE rn = (cnt + 1) // 2),
       |mins AS (SELECT user_id, min(gap) AS min_gap FROM gaps GROUP BY 1),
       |stats AS (SELECT user_id, count(*) AS n_events,
       |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
       |  FROM ev GROUP BY 1),
       |cls AS (SELECT s.user_id, s.n_events, s.n_err, m.med_gap,
       |    CASE WHEN m.med_gap <= $BotMedGap AND x.min_gap <= $BotMinGap THEN 'bot_like'
       |         WHEN m.med_gap <= $BotMedGap THEN 'rapid'
       |         WHEN m.med_gap <= $RegMedGap THEN 'regular'
       |         ELSE 'sporadic' END AS verdict
       |  FROM stats s LEFT JOIN med m USING (user_id)
       |  LEFT JOIN mins x USING (user_id))
       |SELECT verdict, count(*) AS n_users,
       |  CAST(sum(n_events) AS BIGINT) AS n_events,
       |  CAST(sum(med_gap) AS BIGINT) // count(*) AS avg_med_gap,
       |  (CAST(sum(n_err) AS BIGINT) * 1000000) // CAST(sum(n_events) AS BIGINT) AS err_ppm
       |FROM cls GROUP BY 1""".stripMargin

  /** χ² critical value at 5% for df = 167 (168 week-hour cells), in ppm. */
  val SeasonChi2CritPpm = 198154000L

  /** Day-of-week × hour-of-day seasonality profile per event type with a
    * chi-square uniformity test — "does this event type have a weekly
    * rhythm?" (the drift/seasonality dashboard next to text_length_ks's
    * KS). The χ² against the uniform 168-cell expectation collapses
    * algebraically to 168·Σo²/n − n (zero cells need no materialization —
    * they contribute only through n), computed in DECIMAL(38,0)/HUGEINT so
    * Σo²·168e6 can't overflow at any SF, floored to ppm — integer-exact
    * cross-engine. Counts collapse to ≤ types·168 cells map-side; the
    * peak cell comes from a row_number over that bounded frame with a
    * (cnt DESC, dow, hr) total order. dow is aligned to DuckDB's 0=Sunday
    * (Spark's dayofweek() is 1-based).
    */
  def eventsSeasonality(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"),
        hour(col("ts")).as("hr"))
      .groupBy(col("event_type"), col("dow"), col("hr"))
      .agg(count(lit(1)).as("cnt"))
    val stats = cells.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_events"),
        sum(col("cnt").cast("decimal(38,0)") * col("cnt")).as("sq"))
      .withColumn("chi2_ppm",
        expr("CAST((sq * 168000000) div n_events AS BIGINT) - n_events * 1000000"))
    val peak = cells
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("dow"), col("hr"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("dow").as("peak_dow"),
        col("hr").as("peak_hr"), col("cnt").as("peak_cnt"))
    stats.join(peak, "event_type")
      .select(col("event_type"), col("n_events"), col("chi2_ppm"),
        (col("chi2_ppm") > SeasonChi2CritPpm).as("nonuniform"),
        col("peak_dow"), col("peak_hr"), col("peak_cnt"))
  }

  private val seasonOracleSql: String =
    s"""WITH cells AS (SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
       |    CAST(hour(ts) AS INT) AS hr, count(*) AS cnt
       |  FROM events GROUP BY 1, 2, 3),
       |stats AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
       |    sum(CAST(cnt AS HUGEINT) * cnt) AS sq
       |  FROM cells GROUP BY 1),
       |chi AS (SELECT event_type, n_events,
       |    CAST((sq * 168000000) // n_events AS BIGINT) - n_events * 1000000 AS chi2_ppm
       |  FROM stats),
       |pk AS (SELECT event_type, dow AS peak_dow, hr AS peak_hr, cnt AS peak_cnt
       |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
       |      ORDER BY cnt DESC, dow, hr) AS rn FROM cells) WHERE rn = 1)
       |SELECT event_type, n_events, chi2_ppm,
       |  chi2_ppm > $SeasonChi2CritPpm AS nonuniform,
       |  peak_dow, peak_hr, peak_cnt
       |FROM chi JOIN pk USING (event_type)""".stripMargin

  /** Train fraction for the temporal split (in tenths: 8 = 80%). */
  val EvalTrainTenths = 8L

  /** Time-split next-event prediction eval — the train/test hygiene
    * pattern (split on TIME, never randomly: random splits leak future
    * behavior into training) applied to a first-order next-event model:
    * train = events strictly before the split day, model = majority next
    * type per previous type ((count DESC, type ASC) total order), eval =
    * top-1 accuracy over held-out consecutive pairs, against the majority-
    * class baseline. The split day is an exact order statistic computed on
    * the BOUNDED daily-count frame (first day whose cumulative count
    * reaches 80%, `cum·10 ≥ n·8` in integers — no corpus-sized sort).
    *
    * Scale: one per-user lag window over the stream; train counts collapse
    * to the ≤types² alphabet map-side; the model and split day re-enter as
    * 1-row/alphabet-sized broadcasts; accuracy is integer ppm. Unseen
    * prev-types predict NULL → counted wrong identically in both engines
    * (CASE/when null falls to the else-branch).
    */
  def eventsNextEventEval(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        to_date(col("ts")).as("day"))
    val n = ev.agg(count(lit(1)).as("n"))
    val daily = ev.groupBy(col("day")).agg(count(lit(1)).as("dc"))
    val cum = daily.withColumn("cum",
      sum(col("dc")).over(Window.orderBy(col("day")))) // bounded daily frame
    val split = cum.crossJoin(broadcast(n)) // bounded × 1 row
      .filter(col("cum") * 10 >= col("n") * EvalTrainTenths)
      .agg(min(col("day")).as("split_day"))
    val pairs = ev
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .select(col("prev"), col("event_type").as("cur"), col("day"))
      .crossJoin(broadcast(split)) // 1-row scalar
      .transform(Scale.materialize)
    val train = pairs.filter(col("day") < col("split_day"))
    val evalp = pairs.filter(col("day") >= col("split_day"))
    val model = train.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("prev"))
        .orderBy(col("c").desc, col("cur"))))
      .filter(col("rn") === 1)
      .select(col("prev"), col("cur").as("pred"))
    val majority = train.groupBy(col("cur")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("cur")).limit(1)
      .select(col("cur").as("maj"))
    val scored = evalp.join(broadcast(model), Seq("prev"), "left_outer")
      .crossJoin(broadcast(majority)) // 1-row scalar
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("cur") === col("pred"), 1L).otherwise(0L)).as("ok"),
        sum(when(col("cur") === col("maj"), 1L).otherwise(0L)).as("okb"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    scored.crossJoin(broadcast(nTrain)).crossJoin(broadcast(split)) // 1-row scalars
      .select(date_format(col("split_day"), "yyyy-MM-dd").as("split_day"),
        col("n_train"), col("n_eval"),
        expr("CASE WHEN n_eval > 0 THEN ok * 1000000 div n_eval " +
          "ELSE CAST(0 AS BIGINT) END").as("acc_ppm"),
        expr("CASE WHEN n_eval > 0 THEN okb * 1000000 div n_eval " +
          "ELSE CAST(0 AS BIGINT) END").as("baseline_ppm"))
  }

  private val nextEvalOracleSql: String =
    s"""WITH ev AS (SELECT user_id, ts, event_id, event_type,
       |    CAST(ts AS DATE) AS day FROM events),
       |n AS (SELECT count(*) AS n FROM ev),
       |daily AS (SELECT day, count(*) AS dc FROM ev GROUP BY 1),
       |cum AS (SELECT day, sum(dc) OVER (ORDER BY day) AS cum FROM daily),
       |split AS (SELECT min(day) AS split_day FROM cum, n
       |  WHERE cum * 10 >= n * $EvalTrainTenths),
       |pairs AS (SELECT prev, cur, day FROM (
       |  SELECT lag(event_type) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS prev,
       |    event_type AS cur, day
       |  FROM ev) WHERE prev IS NOT NULL),
       |train AS (SELECT p.* FROM pairs p, split WHERE day < split_day),
       |ev2 AS (SELECT p.* FROM pairs p, split WHERE day >= split_day),
       |model AS (SELECT prev, cur AS pred FROM (
       |  SELECT prev, cur, row_number() OVER (PARTITION BY prev
       |      ORDER BY count(*) DESC, cur) AS rn
       |  FROM train GROUP BY prev, cur) WHERE rn = 1),
       |maj AS (SELECT cur AS maj FROM (
       |  SELECT cur, count(*) AS c FROM train GROUP BY 1
       |  ORDER BY c DESC, cur LIMIT 1)),
       |sc AS (SELECT count(*) AS n_eval,
       |    CAST(sum(CASE WHEN cur = pred THEN 1 ELSE 0 END) AS BIGINT) AS ok,
       |    CAST(sum(CASE WHEN cur = maj THEN 1 ELSE 0 END) AS BIGINT) AS okb
       |  FROM ev2 LEFT JOIN model USING (prev), maj),
       |nt AS (SELECT count(*) AS n_train FROM train)
       |SELECT strftime(split_day, '%Y-%m-%d') AS split_day, n_train, n_eval,
       |  CASE WHEN n_eval > 0 THEN ok * 1000000 // n_eval
       |    ELSE CAST(0 AS BIGINT) END AS acc_ppm,
       |  CASE WHEN n_eval > 0 THEN okb * 1000000 // n_eval
       |    ELSE CAST(0 AS BIGINT) END AS baseline_ppm
       |FROM sc, nt, split""".stripMargin

  /** χ² critical value at 5% for df = 1, in ppm (3.841459). */
  val SrmChi2CritPpm = 3841459L

  /** Sample-ratio-mismatch guardrail for the A/B assignment — the check a
    * real experiment platform runs BEFORE reading any metric: if the
    * 50/50 hash split's observed counts are chi-square-incompatible with
    * the design ratio, the experiment is invalid (broken logging,
    * assignment drift) and `events_ab_test`'s z-score means nothing.
    * χ² for two cells against E = n/2 collapses algebraically to
    * (n0−n1)²/(n0+n1) — computed in DECIMAL(38,0)/HUGEINT so the square
    * can't overflow at any user cardinality, floored to ppm.
    *
    * Scale: one distinct on user_id (the same shuffle key the experiment
    * itself uses), a 2-row agg, then 1-row scalar assembly — nothing else.
    */
  def eventsAbSrm(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d).select(col("user_id")).distinct()
      .select((hexH(concat(lit("ab:"), col("user_id"))) % 2).cast("int").as("variant"))
    val agg = users.groupBy(col("variant")).agg(count(lit(1)).as("n"))
    val a = agg.filter(col("variant") === 0).select(col("n").as("n0"))
    val b = agg.filter(col("variant") === 1).select(col("n").as("n1"))
    a.crossJoin(b) // 1-row × 1-row scalar assembly
      .select(col("n0"), col("n1"),
        expr("abs(n0 - n1) * 1000000 div (n0 + n1)").as("delta_ppm"),
        expr("CAST(CAST(CAST(n0 - n1 AS DECIMAL(38,0)) * (n0 - n1) * 1000000 " +
          "AS DECIMAL(38,0)) div (n0 + n1) AS BIGINT)").as("chi2_ppm"))
      .withColumn("srm", col("chi2_ppm") > SrmChi2CritPpm)
  }

  private val srmOracleSql: String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |v AS (SELECT CAST(${hexHSql("'ab:' || user_id")} % 2 AS INT) AS variant FROM u),
       |ag AS (SELECT variant, count(*) AS n FROM v GROUP BY 1)
       |SELECT a.n AS n0, b.n AS n1,
       |  abs(a.n - b.n) * 1000000 // (a.n + b.n) AS delta_ppm,
       |  CAST((CAST(a.n - b.n AS HUGEINT) * (a.n - b.n) * 1000000)
       |    // (a.n + b.n) AS BIGINT) AS chi2_ppm,
       |  CAST((CAST(a.n - b.n AS HUGEINT) * (a.n - b.n) * 1000000)
       |    // (a.n + b.n) AS BIGINT) > $SrmChi2CritPpm AS srm
       |FROM (SELECT n FROM ag WHERE variant = 0) a,
       |     (SELECT n FROM ag WHERE variant = 1) b""".stripMargin

  /** CUSUM change-point sweep — per event type, where does activity shift
    * level? Daily counts are zero-filled onto the global day grid; the
    * cumulative deviation from the type's own mean stays INTEGER by
    * scaling with the grid size D: S_i·D = cum_i·D − i·total (the classic
    * CUSUM statistic times a positive constant, so its argmax is the
    * change point and its max is reported as a ppm of the total mass).
    * 64-bit throughout until the final DECIMAL-guarded ppm projection.
    *
    * Scale: the corpus collapses to a (type, day) count agg map-side;
    * every window after that runs on the bounded alphabet × calendar grid
    * (per-type partitions of |days| rows), never on raw events.
    */
  def eventsCusumShift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val days = ev.select(col("day")).distinct() // bounded calendar frame
    val types = ev.select(col("event_type")).distinct() // bounded alphabet
    val daily = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val grid = types.crossJoin(broadcast(days)) // alphabet × calendar, bounded
      .join(daily, Seq("event_type", "day"), "left_outer")
      .select(col("event_type"), col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wt = Window.partitionBy(col("event_type"))
    // total = the last cumulative value, n_days = the last index — derived
    // from the SAME window pass (a separate grid-wide agg would
    // re-instantiate the grid and rescan the corpus)
    val dev = grid
      .withColumn("i", row_number().over(w))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("total", max(col("cum")).over(wt))
      .withColumn("n_days", max(col("i")).over(wt).cast("long"))
      .withColumn("dev", abs(col("cum") * col("n_days") - col("i") * col("total")))
    dev.withColumn("mx", max(col("dev")).over(wt))
      .filter(col("dev") === col("mx"))
      .groupBy(col("event_type"), col("total"), col("n_days"), col("mx"))
      .agg(min(col("day")).as("sd"))
      .select(col("event_type"), col("total").as("n_events"), col("n_days"),
        date_format(col("sd"), "yyyy-MM-dd").as("shift_day"),
        col("mx").as("max_dev"),
        expr("CASE WHEN total > 0 THEN CAST(CAST(CAST(mx AS DECIMAL(38,0)) " +
          "* 1000000 AS DECIMAL(38,0)) div (total * n_days) AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END").as("dev_ppm"))
  }

  private val cusumOracleSql: String =
    """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |days AS (SELECT DISTINCT day FROM ev),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |daily AS (SELECT event_type, day, count(*) AS c FROM ev GROUP BY 1, 2),
      |grid AS (SELECT t.event_type, dy.day, coalesce(d.c, 0) AS c
      |  FROM types t CROSS JOIN days dy
      |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = dy.day),
      |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS total,
      |    count(*) AS n_days FROM grid GROUP BY 1),
      |cum AS (SELECT event_type, day,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
      |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS cum
      |  FROM grid),
      |dev AS (SELECT c.event_type, c.day, t.total, t.n_days,
      |    abs(c.cum * t.n_days - c.i * t.total) AS dev
      |  FROM cum c JOIN tot t USING (event_type)),
      |mx AS (SELECT event_type, total, n_days, max(dev) AS mx
      |  FROM dev GROUP BY 1, 2, 3)
      |SELECT m.event_type, m.total AS n_events, m.n_days,
      |  strftime((SELECT min(day) FROM dev
      |    WHERE dev.event_type = m.event_type AND dev.dev = m.mx),
      |    '%Y-%m-%d') AS shift_day,
      |  m.mx AS max_dev,
      |  CASE WHEN m.total > 0
      |    THEN CAST((CAST(m.mx AS HUGEINT) * 1000000)
      |      // (m.total * m.n_days) AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS dev_ppm
      |FROM mx m""".stripMargin

  /** Two-sided z critical value for the Mann-Whitney verdict (α = 0.05). */
  val MwZCrit = 1.96

  /** Exact Mann-Whitney U (Wilcoxon rank-sum) drift test per source vs the
    * rest of the corpus, over document lengths — the rank-based complement
    * of [[textLengthKs]] (KS sees shape anywhere; U sees stochastic
    * dominance — "does this source run systematically longer?").
    * Exactness: midranks over the bounded length-value frame are kept as
    * DOUBLED integers (2·midrank = 2·cum_before + t + 1, always integral),
    * so the rank sum, U statistic and tie-correction term ΣT = Σ(t³−t)
    * are all exact DECIMAL(38,0)/HUGEINT; z = (U2 − n_s·n_r) /
    * (2·σ) is assembled from correctly-rounded decimal→double casts,
    * one sqrt and one division, identically parenthesized in the oracle —
    * bit-identical cross-engine. Scale: one (source, length) partial agg +
    * one length-value partial agg (both bounded corpus statistics), a
    * cum-window over the value frame, a broadcast join — never a
    * corpus-sized rank window. DECIMAL(38,0) holds σ²'s numerator to
    * N ≈ 10^9 docs; beyond that the tie numerator needs a wider scale
    * (documented ceiling, not a silent overflow — decimal overflow is an
    * error, not truncation).
    */
  def statsMannWhitney(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
    val vals = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("t"))
    val wv = Window.orderBy(col("n_chars")) // bounded length-value frame
    val ranked = vals
      .withColumn("cum", sum(col("t")).over(wv))
      .select(col("n_chars"), col("t"),
        (lit(2) * (col("cum") - col("t")) + col("t") + lit(1)).as("mr2"))
    val perSv = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val tot = docs.agg(count(lit(1)).as("n"))
    val ties = vals.agg(sum((col("t").cast("decimal(38,0)") * col("t") * col("t"))
      - col("t").cast("decimal(38,0)")).as("sumt"))
    val bySrc = perSv.join(broadcast(ranked), "n_chars")
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_s"),
        sum(col("c").cast("decimal(38,0)") * col("mr2")).as("r2"))
    bySrc.crossJoin(broadcast(tot)) // 1-row corpus total
      .crossJoin(broadcast(ties)) // 1-row tie term
      .select(col("source"), col("n_s"), (col("n") - col("n_s")).as("n_r"),
        (col("r2") - (col("n_s").cast("decimal(38,0)") * (col("n_s") + lit(1))))
          .cast("long").as("u2"),
        col("r2"), col("n"), col("sumt"))
      .select(col("source"), col("n_s"), col("n_r"), col("u2"),
        // z = (U2 − n_s·n_r) / (2·sqrt(σ²)); σ² as exact-rational num/den
        ((col("u2") - col("n_s") * col("n_r")).cast("double") /
          (lit(2.0) * sqrt(
            (col("n_s").cast("decimal(38,0)") * col("n_r") *
              ((col("n").cast("decimal(38,0)") + lit(1)) * col("n") * (col("n") - lit(1))
                - col("sumt"))).cast("double") /
            (lit(12.0) * (col("n").cast("decimal(38,0)") * (col("n") - lit(1))).cast("double")))))
          .as("z"))
      .select(col("source"), col("n_s"), col("n_r"), col("u2"),
        (floor(col("z") * 1e4) / 1e4).as("z4"),
        (abs(col("z")) > lit(MwZCrit)).as("significant"))
  }

  private val mwOracleSql: String =
    s"""WITH docs AS (SELECT source, n_chars FROM documents),
       |vals AS (SELECT n_chars, count(*) AS t FROM docs GROUP BY 1),
       |ranked AS (SELECT n_chars, t,
       |    2 * (sum(t) OVER (ORDER BY n_chars) - t) + t + 1 AS mr2
       |  FROM vals),
       |persv AS (SELECT source, n_chars, count(*) AS c FROM docs GROUP BY 1, 2),
       |tot AS (SELECT count(*) AS n FROM docs),
       |ties AS (SELECT sum(CAST(t AS HUGEINT) * t * t - CAST(t AS HUGEINT)) AS sumt
       |  FROM vals),
       |bysrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s,
       |    sum(CAST(c AS HUGEINT) * mr2) AS r2
       |  FROM persv p JOIN ranked r USING (n_chars) GROUP BY 1),
       |st AS (SELECT source, n_s, n - n_s AS n_r,
       |    CAST(r2 - CAST(n_s AS HUGEINT) * (n_s + 1) AS BIGINT) AS u2,
       |    n, sumt
       |  FROM bysrc, tot, ties),
       |z AS (SELECT source, n_s, n_r, u2,
       |    CAST(u2 - n_s * n_r AS DOUBLE) /
       |      (2.0 * sqrt(
       |        CAST(CAST(n_s AS HUGEINT) * n_r *
       |          ((CAST(n AS HUGEINT) + 1) * n * (n - 1) - sumt) AS DOUBLE) /
       |        (12.0 * CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)))) AS z
       |  FROM st)
       |SELECT source, n_s, n_r, u2, floor(z * 1e4) / 1e4 AS z4,
       |  abs(z) > $MwZCrit AS significant
       |FROM z""".stripMargin

  /** CUPED (controlled-experiment-using-pre-experiment-data) variance
    * reduction: the industry-standard adjustment that regresses each
    * user's experiment-period metric on their pre-period metric and
    * reports arm means with the predictable component removed. Periods
    * split at the corpus midpoint day (broadcast scalar), arms by the
    * portable deterministic hash. ALL integer: per-user pre/post cents
    * totals, pooled moments in DECIMAL(38)/HUGEINT, θ_ppm =
    * (N·Σxy−ΣxΣy)·10⁶ / (N·Σx²−(Σx)²) as ONE trunc division (both
    * engines truncate toward zero — the adjustment term goes negative),
    * adjusted arm mean (in cents-ppm) = Σy_a·10⁶/n_a −
    * θ_ppm·(Σx_a·N−Σx·n_a)/(n_a·N), and the variance-reduction factor
    * ρ² reported as the product of two milli-quantized correlations
    * (A·10³/B)·(A·10³/C) — stated identically in both engines because
    * A²·10⁶ would overflow DECIMAL(38) at scale. One user agg, one 1-row
    * pooled-moment frame broadcast onto the bounded arm frame.
    */
  def eventsAbCuped(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    val ua = ev.crossJoin(broadcast(mid)) // 1-row corpus-bounds scalar
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") <= col("mid"), col("cents")).otherwise(0L)).as("x"),
        sum(when(col("day") > col("mid"), col("cents")).otherwise(0L)).as("y"))
      .select((hexH(concat(lit("cuped:"), col("user_id"))) % 2).cast("int")
        .as("arm"), col("x"), col("y"))
      .transform(Scale.materialize) // pooled + per-arm aggs both consume
    val pooled = ua.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
      .select(col("n"), col("sx"),
        expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy").as("a_num"),
        expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("b_den"),
        expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy").as("c_den"))
      .select(col("n"), col("sx"),
        // nullif guards the degenerate corpora (constant pre- or post-
        // period per user → zero variance): Spark's div returns NULL on a
        // NULL divisor where DuckDB's // on a raw 0 would error, so both
        // engines emit NULL and the parity gate compares instead of
        // crashing (same discipline as events_ab_power)
        expr("CAST(a_num * 1000000 div nullif(b_den, 0) AS BIGINT)").as("theta_ppm"),
        expr("CAST((a_num * 1000 div nullif(b_den, 0)) * " +
          "(a_num * 1000 div nullif(c_den, 0)) AS BIGINT)").as("rho2_ppm"))
    ua.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sum_pre_cents"),
        sum(col("y")).as("sum_post_cents"))
      .crossJoin(broadcast(pooled)) // 1-row pooled-moment scalar
      .select(col("arm"), col("n_users"), col("sum_pre_cents"),
        col("sum_post_cents"),
        expr("CAST(CAST(CAST(sum_post_cents AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div n_users AS BIGINT)").as("mean_post_ppm"),
        expr("CAST(CAST(CAST(sum_post_cents AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div n_users " +
          "- CAST(theta_ppm AS DECIMAL(38,0)) * " +
          "(CAST(sum_pre_cents AS DECIMAL(38,0)) * n " +
          "- CAST(sx AS DECIMAL(38,0)) * n_users) div " +
          "(CAST(n_users AS DECIMAL(38,0)) * n) AS BIGINT)").as("adj_mean_ppm"),
        col("theta_ppm"), col("rho2_ppm"))
  }

  private val cupedOracleSql: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
       |    CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |b AS (SELECT (min(day) + max(day)) // 2 AS mid FROM ev),
       |u AS (SELECT user_id,
       |    sum(CASE WHEN day <= mid THEN cents ELSE 0 END) AS x,
       |    sum(CASE WHEN day > mid THEN cents ELSE 0 END) AS y
       |  FROM ev, b GROUP BY 1),
       |ua AS (SELECT CAST(${hexHSql("'cuped:' || user_id")} % 2 AS INT) AS arm,
       |    x, y FROM u),
       |p AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(y AS HUGEINT) * y) AS syy FROM ua),
       |t AS (SELECT n, sx,
       |    (n * sxy - CAST(sx AS HUGEINT) * sy) AS a_num,
       |    (n * sxx - CAST(sx AS HUGEINT) * sx) AS b_den,
       |    (n * syy - CAST(sy AS HUGEINT) * sy) AS c_den FROM p),
       |th AS (SELECT n, sx,
       |    CAST(a_num * 1000000 // nullif(b_den, 0) AS BIGINT) AS theta_ppm,
       |    CAST((a_num * 1000 // nullif(b_den, 0))
       |      * (a_num * 1000 // nullif(c_den, 0)) AS BIGINT)
       |      AS rho2_ppm FROM t),
       |arm AS (SELECT arm, count(*) AS n_users, sum(x) AS sum_pre,
       |    sum(y) AS sum_post FROM ua GROUP BY 1)
       |SELECT arm, n_users, CAST(sum_pre AS BIGINT) AS sum_pre_cents,
       |  CAST(sum_post AS BIGINT) AS sum_post_cents,
       |  CAST(CAST(sum_post AS HUGEINT) * 1000000 // n_users AS BIGINT)
       |    AS mean_post_ppm,
       |  CAST(CAST(sum_post AS HUGEINT) * 1000000 // n_users
       |    - theta_ppm * (CAST(sum_pre AS HUGEINT) * n
       |      - CAST(sx AS HUGEINT) * n_users)
       |      // (CAST(n_users AS HUGEINT) * n) AS BIGINT) AS adj_mean_ppm,
       |  theta_ppm, rho2_ppm
       |FROM arm, th""".stripMargin

  /** Position-based (U-shaped) multi-touch attribution — the rules-based
    * complement to events_attribution_markov's model-based credit: user
    * journeys are segmented at purchase boundaries (journey index = count
    * of PRECEDING purchases, a per-user running window), and each
    * CONVERTED journey's non-purchase touches earn ppm credit by position
    * — 40/40/20 first/last/middles, with the degenerate forms pinned
    * (m=1 → 10⁶, m=2 → 500k each) and the middle share an integer floor
    * division (200000 div (m−2); the ≤(m−3)-ppm dust per journey is
    * dropped by contract, stated identically in both engines). All
    * windows are per-user (bounded partitions); one (user, journey)
    * semi-join against the converted-journey frame; the rollup is
    * map-side-partial by type.
    */
  def eventsAttributionPosition(s: SparkSession, d: String): DataFrame = {
    val byU = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val j = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("journey",
        count(when(col("event_type") === "purchase", 1)).over(byU))
    val conv = j.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("journey")).distinct()
    val byJ = Window.partitionBy(col("user_id"), col("journey"))
      .orderBy(col("us"), col("event_id"))
    val byJAll = Window.partitionBy(col("user_id"), col("journey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j.filter(col("event_type") =!= "purchase")
      .join(conv, Seq("user_id", "journey"), "left_semi")
      .withColumn("pos", row_number().over(byJ))
      .withColumn("m", count(lit(1)).over(byJAll))
      .select(col("event_type"),
        when(col("m") === 1, 1000000L)
          .when(col("m") === 2, 500000L)
          .when(col("pos") === 1 || col("pos") === col("m"), 400000L)
          .otherwise(expr("CAST(200000 div (m - 2) AS BIGINT)")).as("credit"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_ppm"))
  }

  private val positionOracleSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      |  FROM events),
      |j AS (SELECT user_id, event_type, us, event_id,
      |    count(*) FILTER (event_type = 'purchase') OVER (
      |      PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS journey
      |  FROM ev),
      |t AS (SELECT user_id, journey, event_type, us, event_id FROM j
      |  WHERE event_type <> 'purchase'),
      |conv AS (SELECT DISTINCT user_id, journey FROM j
      |  WHERE event_type = 'purchase'),
      |jt AS (SELECT t.user_id, t.journey, t.event_type,
      |    row_number() OVER (PARTITION BY t.user_id, t.journey
      |      ORDER BY t.us, t.event_id) AS pos,
      |    count(*) OVER (PARTITION BY t.user_id, t.journey) AS m
      |  FROM t JOIN conv USING (user_id, journey)),
      |cr AS (SELECT event_type,
      |    CASE WHEN m = 1 THEN 1000000
      |         WHEN m = 2 THEN 500000
      |         WHEN pos = 1 OR pos = m THEN 400000
      |         ELSE 200000 // (m - 2) END AS credit
      |  FROM jt)
      |SELECT event_type, count(*) AS n_touches,
      |  CAST(sum(credit) AS BIGINT) AS credit_ppm
      |FROM cr GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_ab_cuped" -> eventsAbCuped,
    "events_attribution_position" -> eventsAttributionPosition,
    "stats_mann_whitney" -> statsMannWhitney,
    "events_ab_test" -> eventsAbTest,
    "events_ab_srm" -> eventsAbSrm,
    "events_cusum_shift" -> eventsCusumShift,
    "text_length_ks" -> textLengthKs,
    "events_attribution_markov" -> eventsAttributionMarkov,
    "events_bot_triage" -> eventsBotTriage,
    "events_seasonality" -> eventsSeasonality,
    "events_next_event_eval" -> eventsNextEventEval,
  )

  val oracles: Map[String, String] = Map(
    "events_ab_cuped" -> cupedOracleSql,
    "events_attribution_position" -> positionOracleSql,
    "stats_mann_whitney" -> mwOracleSql,
    "events_ab_test" -> abOracleSql,
    "events_ab_srm" -> srmOracleSql,
    "events_cusum_shift" -> cusumOracleSql,
    "text_length_ks" -> ksOracleSql,
    "events_attribution_markov" -> markovOracleSql,
    "events_bot_triage" -> botOracleSql,
    "events_seasonality" -> seasonOracleSql,
    "events_next_event_eval" -> nextEvalOracleSql,
  )
}
