package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-evolution analytics over the mart: exponential smoothing of the
  * daily revenue series, a customer-lifetime survival (hazard) table, and
  * period-over-period heavy-changer detection. All three collapse the
  * corpus to a bounded frame (calendar days, tenure buckets, per-user
  * counts) with ONE map-side-partial aggregate before any window, and all
  * arithmetic that crosses the engine boundary is integer/decimal-exact —
  * the fixed-point discipline the iterative operators (Graph, Experiments)
  * established, applied to smoothing and survival estimation.
  */
object Lifecycle {

  /** Truncated-EWMA horizon: weights 2^-(k+1) for the k-th most recent day,
    * cut at 30 terms (the omitted tail mass is 2^-30 of the level — below
    * cent resolution at any realistic revenue).
    */
  val EwmaTerms = 30

  /** EWMA of daily revenue with decay α = 1/2 (the ClickHouse
    * `exponentialMovingAverage` / monitoring-forecast role): for each order
    * day, the smoothed level Σ_{k<30} cents_{n-k}·2^-(k+1) over the
    * OBSERVED daily series. Exactness: weights are powers of two, so the
    * weighted sum is computed as Σ cents_{n-k}·2^(29-k) in DECIMAL(38,0)
    * (HUGEINT on the oracle side) and scaled down by ONE integer division
    * by 2^30 — there is no float anywhere, hence no summation-order hazard.
    * Scale: the corpus collapses to the daily frame map-side; the 30-lag
    * window runs on |days| rows (a corpus statistic, not corpus-sized).
    */
  def dailyRevenueEwma(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
        .cast("long").as("cents"))
    val w = Window.orderBy(col("day")) // bounded daily frame only
    val wsum = (0 until EwmaTerms).map { k =>
      coalesce(lag(col("cents"), k).over(w), lit(0L))
        .cast("decimal(38,0)") * lit(1L << (EwmaTerms - 1 - k))
    }.reduce(_ + _)
    daily.withColumn("_ws", wsum)
      .select(date_format(col("day"), "yyyy-MM-dd").as("order_day"),
        col("cents"),
        expr(s"CAST(_ws div ${1L << EwmaTerms} AS BIGINT)").as("ewma_cents"))
  }

  private def ewmaOracleSql: String = {
    val terms = (0 until EwmaTerms).map { k =>
      s"CAST(coalesce(lag(cents, $k) OVER (ORDER BY day), 0) AS HUGEINT)" +
        s" * ${1L << (EwmaTerms - 1 - k)}"
    }.mkString(" + ")
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |sm AS (SELECT day, cents, $terms AS ws FROM daily)
       |SELECT strftime(day, '%Y-%m-%d') AS order_day, cents,
       |  CAST(ws // ${1L << EwmaTerms} AS BIGINT) AS ewma_cents
       |FROM sm""".stripMargin
  }

  /** A customer is counted as churned when their last order is more than
    * this many days before the corpus's last order day (otherwise their
    * lifetime is censored — still alive at the observation edge). The
    * standard life-table censoring rule.
    */
  val ChurnHorizonDays = 90

  /** Tenure buckets of the life table, in days. */
  val HazardBucketDays = 30

  /** Customer-lifetime survival table (the Kaplan-Meier life-table shape):
    * tenure = days between a customer's first and last order, bucketed by
    * [[HazardBucketDays]]; a bucket row reports how many customers were
    * still at risk entering the bucket (tenure ≥ bucket start), how many
    * churned there, how many were censored there, and the discrete hazard
    * d/n in ppm. Survival itself is a product of (1 − hazard) terms — a
    * float-product whose cross-engine story is weak, so the gated output
    * is the integer life table the product derives from (the spec folds
    * the product driver-side). Scale: one customer-keyed map-side-partial
    * aggregate + a 1-row broadcast corpus-max scalar; every window runs on
    * the bounded bucket frame.
    */
  def customerChurnHazard(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
    val per = o.groupBy(col("o_custkey"))
      .agg(min(col("day")).as("f"), max(col("day")).as("l"))
    val mx = o.agg(max(col("day")).as("m"))
    val cust = per.crossJoin(broadcast(mx)) // 1-row corpus-max scalar
      .select(
        expr(s"CAST(datediff(l, f) div $HazardBucketDays AS INT)")
          .as("tenure_bucket"),
        (datediff(col("m"), col("l")) > lit(ChurnHorizonDays)).as("churned"))
    val byB = cust.groupBy(col("tenure_bucket"))
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("n_churned"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy(col("tenure_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byB
      .withColumn("n_at_risk",
        sum(col("n_churned") + col("n_censored")).over(w))
      .select(col("tenure_bucket"), col("n_at_risk"), col("n_churned"),
        col("n_censored"),
        expr("CAST(CAST(CAST(n_churned AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div n_at_risk AS BIGINT)").as("hazard_ppm"))
  }

  private def hazardOracleSql: String =
    s"""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders),
       |per AS (SELECT o_custkey, min(day) AS f, max(day) AS l FROM o GROUP BY 1),
       |mx AS (SELECT max(day) AS m FROM o),
       |cust AS (SELECT
       |    CAST(date_diff('day', f, l) // $HazardBucketDays AS INT) AS tenure_bucket,
       |    date_diff('day', l, m) > $ChurnHorizonDays AS churned
       |  FROM per, mx),
       |byb AS (SELECT tenure_bucket,
       |    CAST(count(*) FILTER (churned) AS BIGINT) AS n_churned,
       |    CAST(count(*) FILTER (NOT churned) AS BIGINT) AS n_censored
       |  FROM cust GROUP BY 1),
       |rk AS (SELECT *, sum(n_churned + n_censored) OVER (
       |    ORDER BY tenure_bucket DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
       |  FROM byb)
       |SELECT tenure_bucket, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       |  n_churned, n_censored,
       |  CAST((CAST(n_churned AS HUGEINT) * 1000000) // n_at_risk AS BIGINT)
       |    AS hazard_ppm
       |FROM rk""".stripMargin

  /** Kaplan–Meier survival CURVE over the churn-hazard life table — the
    * product-limit estimator itself as a gated query (round 12; the life
    * table's Scaladoc above deferred the survival product to a driver-side
    * spec because a float product has no cross-engine story). The product
    * is made engine-exact by DEFINING the statistic in integer fixed point:
    * S₀ = 10⁶ and S_k = (S_{k-1} · (n_k − d_k)) div n_k — one truncating
    * integer division PER STEP, so the fold is a sequence of exact BIGINT
    * operations with no float and no association hazard (each step's
    * truncation is part of the estimator, not error). The fold itself is
    * inherently sequential, but it runs over the BOUNDED bucket frame
    * (≤ maxTenure/30 rows at any corpus size — a corpus statistic, never
    * corpus-sized): the frame collapses to one sorted struct array and a
    * single `aggregate` lambda emits the running product per bucket (the
    * stats_bootstrap bounded-fold discipline). The oracle restates the
    * recursion as a recursive CTE over the same life table — both engines
    * execute the identical integer recurrence, hash-exact.
    * Overflow: S ≤ 10⁶ and n_at_risk ≤ |customers|, so each product is
    * ≤ 10⁶·n < 2⁶³ up to ~9·10¹² customers — comfortable at 100 TB.
    */
  def customerSurvivalCurve(s: SparkSession, d: String): DataFrame = {
    val lt = customerChurnHazard(s, d)
    lt.agg(sort_array(collect_list(struct(
        col("tenure_bucket"), col("n_at_risk"), col("n_churned"),
        col("n_censored"), col("hazard_ppm")))).as("rows"))
      .withColumn("sv", expr(
        """aggregate(rows,
          |  struct(CAST(1000000 AS BIGINT) AS s,
          |         CAST(array() AS ARRAY<BIGINT>) AS out),
          |  (acc, x) -> struct(
          |    (acc.s * (x.n_at_risk - x.n_churned)) div x.n_at_risk AS s,
          |    array_append(acc.out,
          |      (acc.s * (x.n_at_risk - x.n_churned)) div x.n_at_risk) AS out),
          |  acc -> acc.out)""".stripMargin))
      .select(explode(arrays_zip(col("rows"), col("sv"))).as("z"))
      .select(col("z.rows.tenure_bucket").as("tenure_bucket"),
        col("z.rows.n_at_risk").as("n_at_risk"),
        col("z.rows.n_churned").as("n_churned"),
        col("z.rows.n_censored").as("n_censored"),
        col("z.rows.hazard_ppm").as("hazard_ppm"),
        col("z.sv").as("surv_ppm"))
  }

  private def survivalOracleSql: String =
    s"""WITH RECURSIVE base AS ($hazardOracleSql),
       |lt AS (SELECT *, row_number() OVER (ORDER BY tenure_bucket) AS rn
       |  FROM base),
       |r AS (
       |  SELECT rn, tenure_bucket, n_at_risk, n_churned, n_censored,
       |    hazard_ppm,
       |    CAST((1000000 * (n_at_risk - n_churned)) // n_at_risk AS BIGINT)
       |      AS surv_ppm
       |  FROM lt WHERE rn = 1
       |  UNION ALL
       |  SELECT lt.rn, lt.tenure_bucket, lt.n_at_risk, lt.n_churned,
       |    lt.n_censored, lt.hazard_ppm,
       |    CAST((r.surv_ppm * (lt.n_at_risk - lt.n_churned)) // lt.n_at_risk
       |      AS BIGINT)
       |  FROM r JOIN lt ON lt.rn = r.rn + 1)
       |SELECT tenure_bucket, n_at_risk, n_churned, n_censored, hazard_ppm,
       |  surv_ppm
       |FROM r""".stripMargin

  /** Heavy-changer report size. */
  val HeavyChangeK = 50

  /** Period-over-period heavy changers (the "what moved" triage behind
    * every monitoring dashboard): the corpus midpoint (integer-mean of the
    * min/max event epoch-micros) splits the stream into two halves; per
    * user, event counts in each half and the signed change, ranked by
    * absolute change with the user id as tie-break. All integer; the
    * per-user counts are one map-side-partial aggregate and the top-k is
    * the bucketed two-phase operator — no corpus-sized sort.
    */
  def eventsHeavyChange(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    val per = ev.crossJoin(broadcast(bounds)) // 1-row corpus-bounds scalar
      .select(col("user_id"),
        (col("us") < expr("(mn + mx) div 2")).as("early"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("early"), 0L).otherwise(1L)).as("cnt_b"))
      .withColumn("delta", col("cnt_b") - col("cnt_a"))
    Scale.topKPerGroup(per, Seq.empty,
        Seq(abs(col("delta")).desc, col("user_id")),
        k = HeavyChangeK, saltSrc = col("user_id"))
      .select(col("rnk"), col("user_id"), col("cnt_a"), col("cnt_b"),
        col("delta"))
  }

  private def heavyChangeOracleSql: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
       |b AS (SELECT min(us) AS mn, max(us) AS mx FROM ev),
       |per AS (SELECT user_id,
       |    CAST(count(*) FILTER (us < (mn + mx) // 2) AS BIGINT) AS cnt_a,
       |    CAST(count(*) FILTER (us >= (mn + mx) // 2) AS BIGINT) AS cnt_b
       |  FROM ev, b GROUP BY 1),
       |rk AS (SELECT user_id, cnt_a, cnt_b, cnt_b - cnt_a AS delta,
       |    row_number() OVER (ORDER BY abs(cnt_b - cnt_a) DESC, user_id) AS rnk
       |  FROM per)
       |SELECT CAST(rnk AS INT) AS rnk, user_id, cnt_a, cnt_b, delta
       |FROM rk WHERE rnk <= $HeavyChangeK""".stripMargin

  /** Streak report size. */
  val StreakTopK = 50

  /** Longest consecutive-day activity streaks (the gaps-and-islands SQL
    * pattern, the "7-day streak" engagement statistic): per user, distinct
    * active days collapse to islands via the classic day − row_number
    * constant — consecutive days share one island id, a gap starts a new
    * one — then islands aggregate to (user, start, length) and the global
    * top-[[StreakTopK]] rides the bucketed two-phase top-k. All
    * date/integer arithmetic; the only windows are per-user (bounded by a
    * user's distinct active days), the island agg is map-side partial.
    * Ties: (length desc, user asc, start asc).
    */
  def eventsActiveStreaks(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val isl = days
      .withColumn("grp", expr("date_sub(day, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day))"))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("day")).as("start"), count(lit(1)).as("streak_days"))
    Scale.topKPerGroup(isl.select(col("user_id"), col("start"), col("streak_days")),
        Seq.empty, Seq(col("streak_days").desc, col("user_id"), col("start")),
        k = StreakTopK, saltSrc = col("user_id"))
      .select(col("rnk"), col("user_id"),
        date_format(col("start"), "yyyy-MM-dd").as("start_day"),
        col("streak_days"))
  }

  private def streaksOracleSql: String =
    s"""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
       |isl AS (SELECT user_id,
       |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp,
       |    day
       |  FROM days),
       |st AS (SELECT user_id, min(day) AS start, count(*) AS streak_days
       |  FROM isl GROUP BY user_id, grp),
       |rk AS (SELECT user_id, start, streak_days,
       |    row_number() OVER (ORDER BY streak_days DESC, user_id, start) AS rnk
       |  FROM st)
       |SELECT CAST(rnk AS INT) AS rnk, user_id,
       |  strftime(start, '%Y-%m-%d') AS start_day, streak_days
       |FROM rk WHERE rnk <= $StreakTopK""".stripMargin

  /** Inter-order gap histogram buckets (days): upper bounds of the fixed
    * cadence bands; the last band is open.
    */
  val GapBounds = Seq(0L, 7L, 30L, 90L)

  /** Purchase-cadence distribution: per customer, the day gaps between
    * consecutive orders (ordered by date then key — total order), bucketed
    * into fixed bands with counts and ppm shares. One per-customer lag
    * window (bounded partitions) + one map-side-partial band agg; the
    * share division is integer ppm against a 1-row total from a window
    * over the bounded band frame.
    */
  def ordersOrderGapDist(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
        col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = o.withColumn("prev", lag(col("day"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(datediff(col("day"), col("prev")).as("gap"))
    val band = GapBounds.foldRight(lit(s">${GapBounds.last}"): Column) {
      (b, acc) => when(col("gap") <= b, lit(s"<=$b")).otherwise(acc)
    }
    val byBand = gaps.select(band.as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_gaps"))
    val wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byBand
      .withColumn("total", sum(col("n_gaps")).over(wt)) // bounded band frame
      .select(col("band"), col("n_gaps"),
        expr("CAST(CAST(CAST(n_gaps AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div total AS BIGINT)").as("share_ppm"))
  }

  private def gapDistOracleSql: String = {
    val bandSql = GapBounds.reverse.foldLeft(s"'>${GapBounds.last}'") {
      (acc, b) => s"CASE WHEN gap <= $b THEN '<=$b' ELSE $acc END"
    }
    s"""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, o_orderkey
       |  FROM orders),
       |g AS (SELECT date_diff('day',
       |    lag(day) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey),
       |    day) AS gap FROM o),
       |b AS (SELECT $bandSql AS band FROM g WHERE gap IS NOT NULL),
       |bb AS (SELECT band, count(*) AS n_gaps FROM b GROUP BY 1),
       |t AS (SELECT sum(n_gaps) AS total FROM bb)
       |SELECT band, n_gaps,
       |  CAST((CAST(n_gaps AS HUGEINT) * 1000000) // total AS BIGINT) AS share_ppm
       |FROM bb, t""".stripMargin
  }

  /** Weekly growth accounting (the new/retained/resurrected/churned user
    * decomposition every growth dashboard leads with): per observed week,
    * active users classed by their own history — new (first active week),
    * retained (also active the immediately-preceding week), resurrected
    * (active before, but not last week); churn events are attributed to
    * the week AFTER the last consecutive active week (active in w−7, not
    * in w), so n_churned rows can extend one week past the last activity.
    * The identity new + retained + resurrected = active holds per week,
    * and Σnew = total users (every user is new exactly once) — both
    * spec-pinned. Scale: one (user, week) distinct + per-user lag/lead
    * windows (bounded by a user's distinct active weeks) + map-side-partial
    * weekly counts; the week-frame join is a broadcast of a bounded
    * calendar frame.
    */
  def eventsGrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val uw = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val t = uw
      .withColumn("prev", lag(col("wk"), 1).over(w))
      .withColumn("nxt", lead(col("wk"), 1).over(w))
    val cls = t.select(col("wk"),
      when(col("prev").isNull, lit("new"))
        .when(col("prev") === date_sub(col("wk"), 7), lit("retained"))
        .otherwise(lit("resurrected")).as("cls"))
    val act = cls.groupBy(col("wk"))
      .agg(sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val churn = t
      .filter(col("nxt").isNull || col("nxt") > date_add(col("wk"), 7))
      .groupBy(date_add(col("wk"), 7).as("wk"))
      .agg(count(lit(1)).as("n_churned"))
    val weeks = act.select(col("wk")).union(churn.select(col("wk"))).distinct()
    weeks
      .join(act, Seq("wk"), "left_outer")
      .join(churn, Seq("wk"), "left_outer")
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  private def growthOracleSql: String =
    """WITH uw AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |t AS (SELECT user_id, wk,
      |    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
      |    lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
      |  FROM uw),
      |act AS (SELECT wk,
      |    CAST(count(*) FILTER (prev IS NULL) AS BIGINT) AS n_new,
      |    CAST(count(*) FILTER (prev = wk - 7) AS BIGINT) AS n_retained,
      |    CAST(count(*) FILTER (prev IS NOT NULL AND prev <> wk - 7) AS BIGINT)
      |      AS n_resurrected
      |  FROM t GROUP BY 1),
      |churn AS (SELECT wk + 7 AS wk, CAST(count(*) AS BIGINT) AS n_churned
      |  FROM t WHERE nxt IS NULL OR nxt > wk + 7 GROUP BY 1),
      |weeks AS (SELECT wk FROM act UNION SELECT wk FROM churn)
      |SELECT strftime(w.wk, '%Y-%m-%d') AS week,
      |  coalesce(a.n_new, 0) AS n_new,
      |  coalesce(a.n_retained, 0) AS n_retained,
      |  coalesce(a.n_resurrected, 0) AS n_resurrected,
      |  coalesce(c.n_churned, 0) AS n_churned
      |FROM weeks w LEFT JOIN act a ON a.wk = w.wk
      |LEFT JOIN churn c ON c.wk = w.wk""".stripMargin

  /** Gini concentration of per-user activity ("do 1% of users produce 90%
    * of events?") — exact, via the same value-frame factoring customer_abc
    * uses for Pareto cums: users never sort globally; the count-value
    * frame (distinct per-user event counts, a bounded corpus statistic)
    * carries how many users share each count, so the rank-weighted sum
    * Σ i·x_i collapses to Σ_v v·(t_v·cum_before_v + t_v(t_v+1)/2) — all
    * integer in DECIMAL(38,0)/HUGEINT, and Gini = (2Σi·x − (n+1)S) /
    * (n·S) lands as ONE integer ppm division. Output is a single audit
    * row.
    */
  def eventsGini(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val vals = perUser.groupBy(col("c")).agg(count(lit(1)).as("t"))
    val wv = Window.orderBy(col("c")) // bounded count-value frame
    val ranked = vals
      .withColumn("cumu", sum(col("t")).over(wv))
      .select(col("c"), col("t"), (col("cumu") - col("t")).as("before"))
    // six2 = 2·Σ i·x_i kept DOUBLED so every intermediate stays integral:
    // ranks cum_before+1..cum_before+t contribute t·(2·cum_before + t + 1)
    ranked.agg(
        sum(col("t")).as("n_users"),
        sum(col("c").cast("decimal(38,0)") * col("t")).as("s"),
        sum(col("c").cast("decimal(38,0)") *
          (col("t") * (lit(2) * col("before") + col("t") + lit(1))))
          .as("six2"))
      .select(col("n_users"),
        col("s").cast("long").as("n_events"),
        expr("CAST(CAST((six2 - (n_users + 1) * s) * 1000000 " +
          "AS DECIMAL(38,0)) div (CAST(n_users AS DECIMAL(38,0)) * s) " +
          "AS BIGINT)").as("gini_ppm"))
  }

  private def giniOracleSql: String =
    """WITH pu AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
      |vals AS (SELECT c, count(*) AS t FROM pu GROUP BY 1),
      |ranked AS (SELECT c, t,
      |    sum(t) OVER (ORDER BY c) - t AS before FROM vals),
      |agg AS (SELECT CAST(sum(t) AS BIGINT) AS n_users,
      |    sum(CAST(c AS HUGEINT) * t) AS s,
      |    sum(CAST(c AS HUGEINT) *
      |      (t * (2 * before + t + 1))) AS six2
      |  FROM ranked)
      |SELECT n_users, CAST(s AS BIGINT) AS n_events,
      |  CAST(((six2 - (n_users + 1) * s) * 1000000) //
      |    (CAST(n_users AS HUGEINT) * s) AS BIGINT) AS gini_ppm
      |FROM agg""".stripMargin

  /** Forecast backtest over the daily revenue series — the eval the
    * smoothing family needs ("which forecaster would have been right?"):
    * three one-step-ahead models — naive (yesterday), seasonal-naive
    * (same weekday last week), and the integer EWMA level of
    * [[dailyRevenueEwma]] lagged one day — each scored on the SAME eval
    * days (every day where all three forecasts exist), reporting absolute
    * and signed error totals in exact LONG cents plus MAE. The signed
    * total is emitted UNDIVIDED: Spark's `div` truncates toward zero while
    * DuckDB's `//` floors, so a negative mean would diverge cross-engine —
    * the sum is the exact statistic, callers divide. Scale: the corpus
    * collapses to the daily frame map-side; everything else is windows on
    * |days| rows.
    */
  def dailyRevenueBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
        .cast("long").as("cents"))
    val w = Window.orderBy(col("day")) // bounded daily frame only
    val wsum = (0 until EwmaTerms).map { k =>
      coalesce(lag(col("cents"), k).over(w), lit(0L))
        .cast("decimal(38,0)") * lit(1L << (EwmaTerms - 1 - k))
    }.reduce(_ + _)
    val f = daily
      .withColumn("_bt_ws", wsum)
      .withColumn("ewma", expr(s"CAST(_bt_ws div ${1L << EwmaTerms} AS BIGINT)"))
      .drop("_bt_ws")
      .withColumn("naive", lag(col("cents"), 1).over(w))
      .withColumn("snaive", lag(col("cents"), 7).over(w))
      .withColumn("fewma", lag(col("ewma"), 1).over(w))
      .filter(col("naive").isNotNull && col("snaive").isNotNull &&
        col("fewma").isNotNull)
    f.select(col("cents"), explode(array(
        struct(lit("naive").as("model"), col("naive").as("fc")),
        struct(lit("seasonal_naive").as("model"), col("snaive").as("fc")),
        struct(lit("ewma").as("model"), col("fewma").as("fc")))).as("m"))
      .select(col("cents"), col("m.model").as("model"), col("m.fc").as("fc"))
      .groupBy(col("model"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cents") - col("fc"))).as("abs_err_cents"),
        sum(col("cents") - col("fc")).as("signed_err_cents"))
      .select(col("model"), col("n_days"), col("abs_err_cents"),
        col("signed_err_cents"),
        expr("abs_err_cents div n_days").as("mae_cents"))
  }

  private def backtestOracleSql: String = {
    val terms = (0 until EwmaTerms).map { k =>
      s"CAST(coalesce(lag(cents, $k) OVER (ORDER BY day), 0) AS HUGEINT)" +
        s" * ${1L << (EwmaTerms - 1 - k)}"
    }.mkString(" + ")
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |sm AS (SELECT day, cents,
       |    CAST(($terms) // ${1L << EwmaTerms} AS BIGINT) AS ewma
       |  FROM daily),
       |f AS (SELECT cents,
       |    lag(cents, 1) OVER (ORDER BY day) AS naive,
       |    lag(cents, 7) OVER (ORDER BY day) AS snaive,
       |    lag(ewma, 1) OVER (ORDER BY day) AS fewma
       |  FROM sm),
       |e AS (SELECT * FROM f
       |  WHERE naive IS NOT NULL AND snaive IS NOT NULL AND fewma IS NOT NULL),
       |u AS (SELECT cents, 'naive' AS model, naive AS fc FROM e
       |  UNION ALL SELECT cents, 'seasonal_naive', snaive FROM e
       |  UNION ALL SELECT cents, 'ewma', fewma FROM e),
       |g AS (SELECT model, count(*) AS n_days,
       |    CAST(sum(abs(cents - fc)) AS BIGINT) AS abs_err_cents,
       |    CAST(sum(cents - fc) AS BIGINT) AS signed_err_cents
       |  FROM u GROUP BY 1)
       |SELECT model, n_days, abs_err_cents, signed_err_cents,
       |  abs_err_cents // n_days AS mae_cents
       |FROM g""".stripMargin
  }

  /** Grouped least-squares: quantity-on-discount slope per part category
    * (the "does discounting move volume?" mart regression) — the
    * daily_revenue_trend DECIMAL-moment discipline applied per group:
    * x = discount in integer percent, y = quantity in integer units,
    * moments Σx/Σy/Σxy/Σx² per p_type in ONE map-side-partial
    * DECIMAL(38,0) aggregate after the part join (broadcastable dim),
    * slope/intercept from correctly-rounded decimal→double casts + one
    * division each — bit-identical cross-engine; output bounded at
    * |categories| rows.
    */
  def discountElasticity(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        (col("l_discount").cast("decimal(18,4)") * 100).cast("long").as("x"),
        col("l_quantity").cast("long").as("y"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
    val xy = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"))
    xy.select(col("p_type"),
        col("n").cast("long").as("n_lines"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"),
        col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
        col("n").cast("double").as("nd"))
      .select(col("p_type"), col("n_lines"), col("slope"),
        ((col("syd") - col("slope") * col("sxd")) / col("nd")).as("intercept"))
  }

  private def elasticityOracleSql: String =
    """WITH li AS (SELECT l_partkey,
      |    CAST(CAST(l_discount AS DECIMAL(18,4)) * 100 AS BIGINT) AS x,
      |    CAST(l_quantity AS BIGINT) AS y
      |  FROM lineitem),
      |xy AS (SELECT p_type, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x*y) AS HUGEINT) AS sxy, CAST(sum(x*x) AS HUGEINT) AS sxx
      |  FROM li JOIN part ON p_partkey = l_partkey GROUP BY 1),
      |s AS (SELECT p_type, CAST(n AS BIGINT) AS n_lines,
      |    CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |    CAST(n AS DOUBLE) AS nd
      |  FROM xy)
      |SELECT p_type, n_lines, slope, (syd - slope * sxd) / nd AS intercept
      |FROM s""".stripMargin

  /** Conversion-latency banding: per user, the gap between their FIRST
    * `view` and FIRST `purchase` (first-touch to first-conversion — the
    * deterministic, window-free definition: two conditional mins in ONE
    * map-side-partial user agg), banded into the operational buckets
    * (<1h, <1d, <7d, ≥7d) with the converter share in floor-ppm. Users
    * whose first purchase precedes their first view (paths that start
    * with a purchase) are excluded by contract — the latency of a
    * conversion that predates first touch is not defined. One user agg +
    * a 4-row band rollup; the division lives on the bounded band frame.
    */
  def eventsConversionLatency(s: SparkSession, d: String): DataFrame = {
    val f = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("us"))).as("t0"),
        min(when(col("event_type") === "purchase", col("us"))).as("t1"))
      .filter(col("t0").isNotNull && col("t1").isNotNull && col("t1") >= col("t0"))
      .select(expr("(t1 - t0) div 3600000000").as("hrs"))
    val bands = f.select(
        when(col("hrs") < 1, "0_lt1h").when(col("hrs") < 24, "1_lt1d")
          .when(col("hrs") < 168, "2_lt7d").otherwise(lit("3_ge7d")).as("band"),
        col("hrs"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"), min(col("hrs")).as("min_hours"),
        max(col("hrs")).as("max_hours"))
    val wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bands.withColumn("total", sum(col("n_users")).over(wt)) // bounded band frame
      .select(col("band"), col("n_users"),
        expr("CAST(CAST(CAST(n_users AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div total AS BIGINT)").as("share_ppm"),
        col("min_hours"), col("max_hours"))
  }

  private def convLatencyOracleSql: String =
    """WITH f AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t1
      |  FROM events GROUP BY 1),
      |lat AS (SELECT (t1 - t0) // 3600000000 AS hrs FROM f
      |  WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0),
      |b AS (SELECT CASE WHEN hrs < 1 THEN '0_lt1h' WHEN hrs < 24 THEN '1_lt1d'
      |    WHEN hrs < 168 THEN '2_lt7d' ELSE '3_ge7d' END AS band, hrs FROM lat),
      |g AS (SELECT band, count(*) AS n_users, min(hrs) AS min_hours,
      |    max(hrs) AS max_hours FROM b GROUP BY 1),
      |t AS (SELECT sum(n_users) AS total FROM g)
      |SELECT band, n_users,
      |  CAST(CAST(n_users AS HUGEINT) * 1000000 // total AS BIGINT)
      |    AS share_ppm,
      |  min_hours, max_hours
      |FROM g, t""".stripMargin

  // ------------------------------------------------- fulfillment latency
  /** Order→shipment latency SLA profile per order priority: exact type-1
    * (lower) percentiles of the day gap from o_orderdate to the order's
    * FIRST and LAST line shipment. Gaps clamp at 0 (ordersBacklog's
    * contract — this testdata's ship dates are uncorrelated with order
    * dates, and an order cannot ship before it exists).
    *
    * Scale: percentiles come from the counting method, never a value sort
    * — per-order min/max shipdate is one map-side-partial agg, then counts
    * collapse onto the bounded (priority × distinct day-gap) frame and the
    * cumulative window runs there (≤ priorities × ~120 rows at any SF).
    * Type-1 quantile (smallest gap with cum ≥ ⌈p·n⌉, i.e. the integer test
    * k·cum ≥ p·k·n) is integer-exact cross-engine — no interpolation, no
    * per-group value buffer the builtin `percentile` agg would hold.
    */
  def ordersFulfillmentLatency(s: SparkSession, d: String): DataFrame = {
    val perOrder = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("fs"),
        max(to_date(col("l_shipdate"))).as("ls"))
      .join(Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("priority"),
        greatest(datediff(col("fs"), col("od")), lit(0)).cast("long").as("gf"),
        greatest(datediff(col("ls"), col("od")), lit(0)).cast("long").as("gl"))
      // both counting pipelines consume this subtree — one scan, not two
      .transform(Scale.materialize)

    // one counting pipeline per gap family, joined on priority at the end
    def pcts(gap: Column, pfx: String): DataFrame = {
      val cnts = perOrder.groupBy(col("priority"), gap.as("gap"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("priority")).orderBy(col("gap"))
      val wp = Window.partitionBy(col("priority"))
      cnts
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(wp))
        .groupBy(col("priority"))
        .agg(max(col("n")).as(s"${pfx}_n"),
          min(when(col("cum") * 2 >= col("n"), col("gap"))).as(s"p50_$pfx"),
          min(when(col("cum") * 10 >= col("n") * 9, col("gap"))).as(s"p90_$pfx"),
          max(col("gap")).as(s"max_$pfx"))
    }
    pcts(col("gf"), "first")
      .join(pcts(col("gl"), "last"), Seq("priority"))
      .select(col("priority"), col("first_n").as("n_orders"),
        col("p50_first"), col("p90_first"), col("max_first"),
        col("p50_last"), col("p90_last"), col("max_last"))
  }

  private def fulfillmentOracleSql: String =
    """WITH po AS (SELECT l_orderkey,
      |    min(CAST(l_shipdate AS DATE)) AS fs,
      |    max(CAST(l_shipdate AS DATE)) AS ls
      |  FROM lineitem GROUP BY 1),
      |g AS (SELECT o.o_orderpriority AS priority,
      |    greatest(date_diff('day', CAST(o.o_orderdate AS DATE), po.fs), 0)
      |      AS gf,
      |    greatest(date_diff('day', CAST(o.o_orderdate AS DATE), po.ls), 0)
      |      AS gl
      |  FROM po JOIN orders o ON o.o_orderkey = po.l_orderkey),
      |cf AS (SELECT priority, gf AS gap, count(*) AS cnt FROM g GROUP BY 1, 2),
      |wf AS (SELECT priority, gap,
      |    sum(cnt) OVER (PARTITION BY priority ORDER BY gap) AS cum,
      |    sum(cnt) OVER (PARTITION BY priority) AS n FROM cf),
      |pf AS (SELECT priority, max(n) AS n_orders,
      |    min(CASE WHEN cum * 2 >= n THEN gap END) AS p50_first,
      |    min(CASE WHEN cum * 10 >= n * 9 THEN gap END) AS p90_first,
      |    max(gap) AS max_first FROM wf GROUP BY 1),
      |cl AS (SELECT priority, gl AS gap, count(*) AS cnt FROM g GROUP BY 1, 2),
      |wl AS (SELECT priority, gap,
      |    sum(cnt) OVER (PARTITION BY priority ORDER BY gap) AS cum,
      |    sum(cnt) OVER (PARTITION BY priority) AS n FROM cl),
      |pl AS (SELECT priority,
      |    min(CASE WHEN cum * 2 >= n THEN gap END) AS p50_last,
      |    min(CASE WHEN cum * 10 >= n * 9 THEN gap END) AS p90_last,
      |    max(gap) AS max_last FROM wl GROUP BY 1)
      |SELECT pf.priority, CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST(p50_first AS BIGINT) AS p50_first,
      |  CAST(p90_first AS BIGINT) AS p90_first,
      |  CAST(max_first AS BIGINT) AS max_first,
      |  CAST(p50_last AS BIGINT) AS p50_last,
      |  CAST(p90_last AS BIGINT) AS p90_last,
      |  CAST(max_last AS BIGINT) AS max_last
      |FROM pf JOIN pl ON pl.priority = pf.priority""".stripMargin

  // ----------------------------------------------------- cohort repeat rate
  /** Repeat-purchase rate by acquisition cohort — the mart's classic
    * cohort table (events_retention's role on ORDERS): customers grouped
    * by first-order month, per cohort the customer count, how many ever
    * ordered again (n_orders ≥ 2), the repeat rate in ppm, and the exact
    * type-1 median days from first order to the first LATER-DAY order
    * (same-day re-orders don't advance the clock; customers with none are
    * excluded from the gap stat, not from the rate).
    *
    * Scale: per-customer min-date + count is one map-side-partial agg; the
    * second-order date needs the first date back on the orders rows — one
    * key-aligned join — then a second per-customer agg; the median rides
    * the counting method on the bounded (cohort × gap) frame.
    */
  def ordersCohortRepeat(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .select(col("o_custkey").as("ck"), to_date(col("o_orderdate")).as("od"))
    val first = ord.groupBy(col("ck"))
      .agg(min(col("od")).as("d0"), count(lit(1)).as("n_orders"))
      .transform(Scale.materialize) // joined back AND rolled up
    val second = ord.join(first.select(col("ck"), col("d0")), Seq("ck"))
      .filter(col("od") > col("d0"))
      .groupBy(col("ck")).agg(min(col("od")).as("d1"))
    val per = first.join(second, Seq("ck"), "left_outer")
      .select(date_format(date_trunc("month", col("d0")), "yyyy-MM")
          .as("cohort"),
        col("n_orders"),
        datediff(col("d1"), col("d0")).cast("long").as("gap"))
      .transform(Scale.materialize) // feeds the rate rollup AND the median
    val rate = per.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"))
      .select(col("cohort"), col("n_customers"), col("n_repeat"),
        expr("n_repeat * 1000000 div n_customers").as("repeat_ppm"))
    val cnts = per.filter(col("gap").isNotNull)
      .groupBy(col("cohort"), col("gap")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("gap"))
    val wc = Window.partitionBy(col("cohort"))
    val med = cnts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wc))
      .groupBy(col("cohort"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("gap")))
        .as("p50_gap_days"))
    rate.join(med, Seq("cohort"), "left_outer")
  }

  private def cohortRepeatOracleSql: String =
    """WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od
      |  FROM orders),
      |f AS (SELECT ck, min(od) AS d0, count(*) AS n_orders FROM o
      |  GROUP BY 1),
      |s2 AS (SELECT o.ck, min(o.od) AS d1 FROM o JOIN f ON f.ck = o.ck
      |  WHERE o.od > f.d0 GROUP BY 1),
      |per AS (SELECT strftime(date_trunc('month', f.d0), '%Y-%m') AS cohort,
      |    f.n_orders, date_diff('day', f.d0, s2.d1) AS gap
      |  FROM f LEFT JOIN s2 ON s2.ck = f.ck),
      |rate AS (SELECT cohort, count(*) AS n_customers,
      |    sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS n_repeat
      |  FROM per GROUP BY 1),
      |ct AS (SELECT cohort, gap, count(*) AS cnt FROM per
      |  WHERE gap IS NOT NULL GROUP BY 1, 2),
      |cw AS (SELECT cohort, gap,
      |    sum(cnt) OVER (PARTITION BY cohort ORDER BY gap) AS cum,
      |    sum(cnt) OVER (PARTITION BY cohort) AS n FROM ct),
      |med AS (SELECT cohort,
      |    min(CASE WHEN cum * 2 >= n THEN gap END) AS p50_gap_days
      |  FROM cw GROUP BY 1)
      |SELECT rate.cohort, CAST(n_customers AS BIGINT) AS n_customers,
      |  CAST(n_repeat AS BIGINT) AS n_repeat,
      |  CAST(CAST(n_repeat AS HUGEINT) * 1000000 // n_customers AS BIGINT)
      |    AS repeat_ppm,
      |  CAST(p50_gap_days AS BIGINT) AS p50_gap_days
      |FROM rate LEFT JOIN med ON med.cohort = rate.cohort""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_cohort_repeat" -> ordersCohortRepeat,
    "orders_fulfillment_latency" -> ordersFulfillmentLatency,
    "events_conversion_latency" -> eventsConversionLatency,
    "daily_revenue_backtest" -> dailyRevenueBacktest,
    "discount_elasticity" -> discountElasticity,
    "events_growth_accounting" -> eventsGrowthAccounting,
    "events_gini" -> eventsGini,
    "daily_revenue_ewma" -> dailyRevenueEwma,
    "customer_churn_hazard" -> customerChurnHazard,
    "customer_survival_curve" -> customerSurvivalCurve,
    "events_heavy_change" -> eventsHeavyChange,
    "events_active_streaks" -> eventsActiveStreaks,
    "orders_order_gap_dist" -> ordersOrderGapDist,
  )

  val oracles: Map[String, String] = Map(
    "orders_cohort_repeat" -> cohortRepeatOracleSql,
    "orders_fulfillment_latency" -> fulfillmentOracleSql,
    "events_conversion_latency" -> convLatencyOracleSql,
    "daily_revenue_backtest" -> backtestOracleSql,
    "discount_elasticity" -> elasticityOracleSql,
    "events_growth_accounting" -> growthOracleSql,
    "events_gini" -> giniOracleSql,
    "daily_revenue_ewma" -> ewmaOracleSql,
    "customer_churn_hazard" -> hazardOracleSql,
    "customer_survival_curve" -> survivalOracleSql,
    "events_heavy_change" -> heavyChangeOracleSql,
    "events_active_streaks" -> streaksOracleSql,
    "orders_order_gap_dist" -> gapDistOracleSql,
  )
}
