package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_ab_test" -> eventsAbTest,
    "text_length_ks" -> textLengthKs,
  )

  val oracles: Map[String, String] = Map(
    "events_ab_test" -> abOracleSql,
    "text_length_ks" -> ksOracleSql,
  )
}
