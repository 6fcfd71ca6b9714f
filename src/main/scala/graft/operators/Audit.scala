package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality / statistical-audit operators over the mart: Benford
  * first-digit conformance, a contingency-table independence test, the
  * rapid-repeat (client double-fire) dedup gate, audience-overlap
  * affinity between event types, and the Fano dispersion (burstiness)
  * index. The family shares one discipline: every statistic that crosses
  * the engine boundary is integer or DECIMAL-exact — shares and test
  * statistics are quantized to ppm with ONE integer division in the final
  * projection, so the DuckDB oracle hashes bit-identically. Every operator
  * collapses the corpus with a map-side-partial aggregate before any
  * window, and every window runs on a bounded frame (digits, contingency
  * cells, event types) — nothing corpus-sized is ever sorted or windowed.
  */
object Audit {

  /** Benford expected first-digit shares, floor-quantized to ppm. Driver-
    * computed once and embedded as LITERALS in both the Spark plan and the
    * oracle SQL (the generated-literal contract: no cross-engine log10).
    */
  val BenfordPpm: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)

  /** Benford first-digit audit over order totals (the classic
    * fraud/synthetic-data screen): observed leading-digit distribution of
    * the order amount in cents vs the Benford expectation, as exact ppm
    * shares. The leading digit is taken from the cents integer's decimal
    * string — shifting the decimal point never changes the leading digit,
    * and string truncation is exact in both engines where float log10
    * binning would not be. One map-side digit extraction + a 9-row agg;
    * the share division is the only division, on the bounded digit frame.
    * (This corpus's uniform synthetic prices should FAIL Benford — the
    * audit reporting that is the point of the audit.)
    */
  def ordersBenford(s: SparkSession, d: String): DataFrame = {
    val cents = Tables.orders(s, d)
      .select((col("o_totalprice").cast("decimal(18,4)") * 100)
        .cast("long").as("cents"))
      .filter(col("cents") > 0)
    val byD = cents
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    val bf = BenfordPpm.foldRight(lit(0L)) { case ((dg, p), acc) =>
      when(col("digit") === dg, lit(p)).otherwise(acc)
    }
    val wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byD
      .withColumn("total", sum(col("n_orders")).over(wt)) // bounded digit frame
      .withColumn("benford_ppm", bf)
      .select(col("digit"), col("n_orders"),
        expr("CAST(CAST(CAST(n_orders AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div total AS BIGINT)").as("share_ppm"),
        col("benford_ppm"))
      .withColumn("excess_ppm", col("share_ppm") - col("benford_ppm"))
  }

  private def benfordOracleSql: String = {
    val caseSql = BenfordPpm.map { case (dg, p) => s"WHEN $dg THEN $p" }
      .mkString("CASE digit ", " ", " ELSE 0 END")
    s"""WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
       |    AS cents FROM orders),
       |dg AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM c WHERE cents > 0),
       |b AS (SELECT digit, count(*) AS n_orders FROM dg GROUP BY 1),
       |t AS (SELECT sum(n_orders) AS total FROM b)
       |SELECT digit, n_orders,
       |  CAST((CAST(n_orders AS HUGEINT) * 1000000) // total AS BIGINT) AS share_ppm,
       |  CAST($caseSql AS BIGINT) AS benford_ppm,
       |  CAST((CAST(n_orders AS HUGEINT) * 1000000) // total
       |    - ($caseSql) AS BIGINT) AS excess_ppm
       |FROM b, t""".stripMargin
  }

  /** Chi-square independence test of order priority × order status (the
    * contingency-table drift check behind "is the priority mix shifting by
    * status?"): per cell, observed count, row/column marginals, and the
    * cell's chi-square contribution — computed as (N·O − R·C)²·10⁶ /
    * (N·R·C), the all-integer form of (O − E)²/E (multiply through by N²,
    * then ÷ N once) — plus a `_all` total row whose contrib_ppm is the
    * floor-summed statistic (floors applied per cell in BOTH engines, so
    * the sum is consistent). All marginals come from windows over the
    * bounded cell frame (|priorities| × |statuses| rows). DECIMAL(38,0)
    * headroom holds to ~10⁸ orders per cell; past that you run the test
    * on ppm shares — the statistic, not the plan, is what changes.
    */
  def ordersChisqPriorityStatus(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("o_cnt"))
    val wr = Window.partitionBy(col("o_orderpriority"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wc = Window.partitionBy(col("o_orderstatus"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val per = cells
      .withColumn("row_tot", sum(col("o_cnt")).over(wr)) // bounded cell frame
      .withColumn("col_tot", sum(col("o_cnt")).over(wc))
      .withColumn("n_total", sum(col("o_cnt")).over(wt))
      .withColumn("contrib_ppm", expr(
        "CAST(CAST((CAST(n_total AS DECIMAL(38,0)) * o_cnt - " +
          "CAST(row_tot AS DECIMAL(38,0)) * col_tot) * " +
          "(CAST(n_total AS DECIMAL(38,0)) * o_cnt - " +
          "CAST(row_tot AS DECIMAL(38,0)) * col_tot) * 1000000 " +
          "AS DECIMAL(38,0)) div (CAST(n_total AS DECIMAL(38,0)) * " +
          "row_tot * col_tot) AS BIGINT)"))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("o_cnt"),
        col("row_tot"), col("col_tot"), col("contrib_ppm"))
      // materialized: the `_all` rollup and the union both consume this
      // subtree — without it the orders agg + three windows execute twice
      .transform(Scale.materialize)
    val tot = per.agg(sum(col("o_cnt")).as("o_cnt"),
        sum(col("contrib_ppm")).as("contrib_ppm"))
      .select(lit("_all").as("o_orderpriority"), lit("_all").as("o_orderstatus"),
        col("o_cnt"), col("o_cnt").as("row_tot"), col("o_cnt").as("col_tot"),
        col("contrib_ppm"))
    per.unionByName(tot)
  }

  private def chisqOracleSql: String =
    """WITH cells AS (SELECT o_orderpriority, o_orderstatus, count(*) AS o_cnt
      |  FROM orders GROUP BY 1, 2),
      |m AS (SELECT *,
      |    sum(o_cnt) OVER (PARTITION BY o_orderpriority) AS row_tot,
      |    sum(o_cnt) OVER (PARTITION BY o_orderstatus) AS col_tot,
      |    sum(o_cnt) OVER () AS n_total
      |  FROM cells),
      |per AS (SELECT o_orderpriority, o_orderstatus,
      |    CAST(o_cnt AS BIGINT) AS o_cnt,
      |    CAST(row_tot AS BIGINT) AS row_tot,
      |    CAST(col_tot AS BIGINT) AS col_tot,
      |    CAST(((CAST(n_total AS HUGEINT) * o_cnt - CAST(row_tot AS HUGEINT) * col_tot)
      |      * (CAST(n_total AS HUGEINT) * o_cnt - CAST(row_tot AS HUGEINT) * col_tot)
      |      * 1000000)
      |      // (CAST(n_total AS HUGEINT) * row_tot * col_tot) AS BIGINT)
      |      AS contrib_ppm
      |  FROM m)
      |SELECT * FROM per
      |UNION ALL
      |SELECT '_all', '_all', CAST(sum(o_cnt) AS BIGINT),
      |  CAST(sum(o_cnt) AS BIGINT), CAST(sum(o_cnt) AS BIGINT),
      |  CAST(sum(contrib_ppm) AS BIGINT) FROM per""".stripMargin

  /** Rapid-repeat window (micros): an event is flagged when it follows the
    * previous event of the SAME (user, event_type) by at most this gap —
    * the windowed-dedup rule an at-least-once client-retry gate applies
    * (`dropDuplicatesWithinWatermark` semantics, keyed on user+type).
    * Calibrated to this corpus's sparse synthetic timeline (1h); the
    * operator's shape is threshold-independent.
    */
  val RapidRepeatUs: Long = 3600L * 1000000L

  /** Client double-fire / retry-storm audit: per event type, how many
    * events arrive within [[RapidRepeatUs]] of the previous same-key
    * event (gap to the IMMEDIATELY preceding event — the deterministic,
    * window-expressible form of a debounce gate; a keep-first recursive
    * debounce is not SQL-expressible and differs only on ≥3-event pileups
    * inside one window), the drop rate in ppm, the tightest observed gap,
    * and how many distinct users trip the gate. One per-(user,type) lag
    * window — partitions bounded by a user's events of one type — then a
    * map-side-partial per-type rollup; the exact distinct is over the
    * bounded type frame.
    */
  def eventsDedupWindow(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val gaps = ev
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .withColumn("rapid",
        col("gap").isNotNull && col("gap") <= RapidRepeatUs)
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("rapid"), 1L).otherwise(0L)).as("n_rapid"),
        min(when(col("rapid"), col("gap"))).as("min_gap_us"),
        countDistinct(when(col("rapid"), col("user_id"))).as("n_users_affected"))
      .select(col("event_type"), col("n_events"), col("n_rapid"),
        expr("CAST(CAST(CAST(n_rapid AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div n_events AS BIGINT)").as("rapid_ppm"),
        col("min_gap_us"), col("n_users_affected"))
  }

  private def dedupWindowOracleSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
       |  FROM events),
       |g AS (SELECT user_id, event_type,
       |    us - lag(us) OVER (PARTITION BY user_id, event_type
       |      ORDER BY us, event_id) AS gap
       |  FROM ev),
       |f AS (SELECT user_id, event_type, gap,
       |    gap IS NOT NULL AND gap <= $RapidRepeatUs AS rapid FROM g)
       |SELECT event_type, count(*) AS n_events,
       |  CAST(count(*) FILTER (rapid) AS BIGINT) AS n_rapid,
       |  CAST((CAST(count(*) FILTER (rapid) AS HUGEINT) * 1000000)
       |    // count(*) AS BIGINT) AS rapid_ppm,
       |  min(gap) FILTER (rapid) AS min_gap_us,
       |  CAST(count(DISTINCT user_id) FILTER (rapid) AS BIGINT)
       |    AS n_users_affected
       |FROM f GROUP BY 1""".stripMargin

  /** Audience affinity between event types (the "users who do X also do Y"
    * overlap matrix): for each unordered type pair, the exact co-audience
    * size, Jaccard overlap, and lift — all from ONE distinct (user, type)
    * frame self-joined on user. Scale: a user has at most |types| rows, so
    * the self-join emits ≤ C(|types|, 2) pairs per user — the quadratic is
    * in the BOUNDED type alphabet, never in users; per-type audience sizes
    * and the user total are map-side aggregates broadcast back onto the
    * bounded pair frame. Jaccard and lift are floor-ppm with one integer
    * division each: lift_ppm = |A∩B|·n_users·10⁶ / (|A|·|B|) — >1e6 means
    * the audiences attract, <1e6 they repel.
    */
  def eventsTypeAffinity(s: SparkSession, d: String): DataFrame = {
    val ut = Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_aud"))
    val total = ut.agg(countDistinct(col("user_id")).as("n_users"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n_aud").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n_aud").as("n_b"))), "type_b")
      .crossJoin(broadcast(total)) // 1-row corpus scalar
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_common"),
        expr("CAST(CAST(CAST(n_common AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div (n_a + n_b - n_common) AS BIGINT)")
          .as("jaccard_ppm"),
        expr("CAST(CAST(CAST(n_common AS DECIMAL(38,0)) * n_users * 1000000 " +
          "AS DECIMAL(38,0)) div (CAST(n_a AS DECIMAL(38,0)) * n_b) " +
          "AS BIGINT)").as("lift_ppm"))
  }

  private def affinityOracleSql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_common
      |  FROM ut a JOIN ut b
      |  ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |sizes AS (SELECT event_type, count(*) AS n_aud FROM ut GROUP BY 1),
      |t AS (SELECT count(DISTINCT user_id) AS n_users FROM ut)
      |SELECT type_a, type_b,
      |  sa.n_aud AS n_a, sb.n_aud AS n_b, n_common,
      |  CAST((CAST(n_common AS HUGEINT) * 1000000)
      |    // (sa.n_aud + sb.n_aud - n_common) AS BIGINT) AS jaccard_ppm,
      |  CAST((CAST(n_common AS HUGEINT) * n_users * 1000000)
      |    // (CAST(sa.n_aud AS HUGEINT) * sb.n_aud) AS BIGINT) AS lift_ppm
      |FROM pairs
      |JOIN sizes sa ON sa.event_type = type_a
      |JOIN sizes sb ON sb.event_type = type_b, t""".stripMargin

  /** Fano dispersion (variance-to-mean) of hourly event counts per type —
    * the burstiness index separating Poisson-like traffic (≈1e6 ppm) from
    * bursty (>1e6) or regularized (<1e6) streams, over the FULL calendar
    * hour grid between the corpus's first and last event (silent hours
    * count as zeros: they contribute nothing to Σc or Σc², and the grid
    * width T comes from the 1-row corpus bounds — so the zero-inclusive
    * moments cost nothing). Hour index is integer epoch-micros division;
    * Fano = (T·Σc² − (Σc)²) / (T·Σc) lands as one HUGEINT/DECIMAL ppm
    * division in the final projection. One (type, hour) map-side-partial
    * agg then a per-type rollup — the corpus never survives the first agg.
    */
  def eventsFanoDispersion(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
    val bounds = ev.agg(min(col("h")).as("hmn"), max(col("h")).as("hmx"))
    val ch = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
    ch.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_active_hours"),
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .crossJoin(broadcast(bounds)) // 1-row corpus-bounds scalar
      .select(col("event_type"),
        (col("hmx") - col("hmn") + 1).as("n_hours"),
        col("n_active_hours"), col("s").as("n_events"),
        expr("CAST(CAST(((hmx - hmn + 1) * CAST(ss AS DECIMAL(38,0)) - " +
          "CAST(s AS DECIMAL(38,0)) * s) * 1000000 AS DECIMAL(38,0)) div " +
          "((hmx - hmn + 1) * CAST(s AS DECIMAL(38,0))) AS BIGINT)")
          .as("fano_ppm"))
  }

  private def fanoOracleSql: String =
    """WITH ev AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h
      |  FROM events),
      |b AS (SELECT min(h) AS hmn, max(h) AS hmx FROM ev),
      |ch AS (SELECT event_type, h, count(*) AS c FROM ev GROUP BY 1, 2),
      |per AS (SELECT event_type, count(*) AS n_active_hours,
      |    sum(c) AS s, sum(c * c) AS ss
      |  FROM ch GROUP BY 1)
      |SELECT event_type,
      |  hmx - hmn + 1 AS n_hours,
      |  CAST(n_active_hours AS BIGINT) AS n_active_hours,
      |  CAST(s AS BIGINT) AS n_events,
      |  CAST(((hmx - hmn + 1) * CAST(ss AS HUGEINT) - CAST(s AS HUGEINT) * s)
      |    * 1000000 // ((hmx - hmn + 1) * CAST(s AS HUGEINT)) AS BIGINT)
      |    AS fano_ppm
      |FROM per, b""".stripMargin

  // --------------------------------------------------- behavioral diversity
  /** Per-user behavioral diversity — Gini–Simpson index over each user's
    * event-type mix (1 − Σc²/n², the probability two of the user's events
    * differ in type), rolled up into ppm-centile buckets (≤101-row frame): the audience
    * segmentation between single-action drones (bucket 0 — bots, scrapers,
    * one-trick integrations) and diverse organic users. Rational and
    * integer-exact by construction — gs_ppm = (10⁶·(n²−Σc²)) div n² rides
    * DECIMAL(38) because a 10⁷-event user at 100 TB puts n²·10⁶ at 10²⁰,
    * past BIGINT.
    *
    * Scale: (user, type) partial agg → per-user rollup (both map-side
    * combining on the natural keys) → a ≤101-row bucket frame. No windows,
    * no corpus-sized sort.
    */
  def eventsUserDiversity(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("ss"))
      .select(col("user_id"), col("n"),
        expr("CAST((CAST(n AS DECIMAL(38,0)) * n - ss) * 1000000 " +
          "div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("gs_ppm"))
      .select(expr("gs_ppm div 10000").as("bucket"), col("n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
        expr("sum(n) div count(1)").as("mean_events"))

  private def userDiversityOracleSql: String =
    """WITH ct AS (SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, sum(c) AS n,
      |    sum(CAST(c AS HUGEINT) * c) AS ss FROM ct GROUP BY 1),
      |g AS (SELECT user_id, n,
      |    (CAST(n AS HUGEINT) * n - ss) * 1000000
      |      // (CAST(n AS HUGEINT) * n) AS gs_ppm FROM u)
      |SELECT CAST(gs_ppm // 10000 AS BIGINT) AS bucket,
      |  count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_events,
      |  CAST(sum(n) // count(*) AS BIGINT) AS mean_events
      |FROM g GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_user_diversity" -> eventsUserDiversity,
    "orders_benford" -> ordersBenford,
    "orders_chisq_priority_status" -> ordersChisqPriorityStatus,
    "events_dedup_window" -> eventsDedupWindow,
    "events_type_affinity" -> eventsTypeAffinity,
    "events_fano_dispersion" -> eventsFanoDispersion,
  )

  val oracles: Map[String, String] = Map(
    "events_user_diversity" -> userDiversityOracleSql,
    "orders_benford" -> benfordOracleSql,
    "orders_chisq_priority_status" -> chisqOracleSql,
    "events_dedup_window" -> dedupWindowOracleSql,
    "events_type_affinity" -> affinityOracleSql,
    "events_fano_dispersion" -> fanoOracleSql,
  )
}
