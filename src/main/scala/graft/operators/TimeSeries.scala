package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series diagnostics over the daily-revenue series (the mart's
  * headline KPI): autocorrelation, robust Theil–Sen trend, and day-of-week
  * seasonal indices. The family discipline everywhere: the data-scale work
  * is ONE map-side-partial `orders` aggregate down to the daily frame;
  * every statistic after that runs on a CALENDAR-bounded frame (≤ a few
  * thousand rows at any corpus size — 100 TB of orders still spans the
  * same days), so windows/self-joins here are bounded-model work, not
  * data-scale work. Money is exact cents (DECIMAL(18,4)·100 → BIGINT);
  * cross-products widen to DECIMAL(38,0) BEFORE multiplying (daily cents
  * reach ~2.3e11 at 100× the gate SF; a BIGINT square would wrap), and
  * divisions are integer `div` in the final projection only.
  *
  * Division semantics, verified in BOTH engines this round: Spark's `div`
  * and DuckDB's `//` BOTH truncate toward zero on negatives (-7 div 2 =
  * -7 // 2 = -3, including DECIMAL(38,0)/HUGEINT operands), so signed
  * numerators (ACF covariances, downtrend slopes) are cross-engine exact
  * with no clamp or shift. (An older in-repo note claims DuckDB floors —
  * measured otherwise; the clamps it motivated are semantic choices and
  * stay.)
  *
  * Reference role: realtime-cdc-pipeline-docker's daily_report.py publishes
  * the daily revenue rollup; these are the diagnostics a mart layered on
  * that rollup runs (is revenue autocorrelated? trending? weekly-seasonal?).
  */
object TimeSeries {

  /** ACF lags published by daily_revenue_acf. */
  val MaxLag = 14

  /** Fixed epoch Sunday for engine-portable day-of-week (Spark's
    * dayofweek() is 1-based Sunday, DuckDB's 0-based — a datediff mod 7
    * from a known Sunday is identical in both).
    */
  val EpochSunday = "1970-01-04"

  /** The shared daily frame: exact cents per order day — materialized,
    * because every operator here consumes it from 2–3 branches and the
    * branch recompute would be 2–3 full orders scans at data scale.
    */
  private def daily(s: SparkSession, d: String): DataFrame =
    Scale.materialize(Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
        .cast("long").as("cents")))

  // ------------------------------------------------------------------ acf
  /** Sample autocorrelation of daily revenue at lags 1..[[MaxLag]] —
    * r_k = Σ_t (x_t−μ)(x_{t+k}−μ) / Σ_t (x_t−μ)², the standard
    * full-series-mean, lag-0-denominator estimator, in exact integers:
    * μ = Σx div n (the floored mean is part of the statistic's contract so
    * both engines center identically), deviations stay BIGINT, products
    * widen to DECIMAL(38,0), and the single ppm division truncates in the
    * final projection (|num| ≤ denom by Cauchy–Schwarz, so ppm ∈ [−1e6,
    * 1e6]). Lag joins are on CALENDAR day index (datediff from the series
    * start) — a gap day simply contributes no pair at the lags it breaks.
    * Scale: one orders aggregate; the lag self-join explodes the bounded
    * daily frame ×[[MaxLag]] and equi-joins it back to itself — bounded
    * model work.
    */
  def dailyRevenueAcf(s: SparkSession, d: String): DataFrame = {
    val dy = daily(s, d)
    val st = dy.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
      min(col("day")).as("day0"))
    val dv = Scale.materialize(dy.crossJoin(broadcast(st)) // 1-row stats
      .select(datediff(col("day"), col("day0")).as("idx"),
        (col("cents") - expr("s div n")).as("dev"))) // 3 consumers below
    val den = dv.agg(
      sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("den")) // 1 row
    val rhs = dv.select(col("idx").as("idx2"), col("dev").as("dev2"))
    dv.withColumn("lag", explode(sequence(lit(1), lit(MaxLag))))
      .withColumn("idx2", col("idx") + col("lag"))
      .join(rhs, "idx2")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(dev AS DECIMAL(38,0)) * dev2")).as("num"))
      .crossJoin(broadcast(den)) // 1-row denominator
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        expr("CAST(num * 1000000 div nullif(den, 0) AS BIGINT)")
          .as("acf_ppm"))
  }

  private val dailySql =
    """SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1""".stripMargin

  private def acfOracleSql: String =
    s"""WITH daily AS ($dailySql),
       |st AS (SELECT count(*) AS n, sum(cents) AS s, min(day) AS day0
       |  FROM daily),
       |dv AS (SELECT datediff('day', st.day0, day) AS idx,
       |    cents - (st.s // st.n) AS dev FROM daily, st),
       |den AS (SELECT sum(CAST(dev AS HUGEINT) * dev) AS den FROM dv),
       |pairs AS (SELECT l.lag, a.dev AS dev, b.dev AS dev2
       |  FROM dv a JOIN (SELECT unnest(range(1, ${MaxLag + 1})) AS lag) l
       |    ON true
       |  JOIN dv b ON b.idx = a.idx + l.lag),
       |ag AS (SELECT lag, count(*) AS n_pairs,
       |    sum(CAST(dev AS HUGEINT) * dev2) AS num FROM pairs GROUP BY 1)
       |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       |  CAST(num * 1000000 // nullif(den, 0) AS BIGINT) AS acf_ppm
       |FROM ag, den""".stripMargin

  // ------------------------------------------------------------ theil–sen
  /** Theil–Sen robust trend of daily revenue: the median over all day
    * pairs i<j of slope (cents_j−cents_i)/(day_j−day_i), in exact
    * micro-cents/day (each slope one truncated integer division — both
    * engines truncate identically on downtrends). The median is the LOWER
    * median (element at rank (m+1) div 2 in slope order) so even pair
    * counts need no cross-engine float average — and the rank is found by
    * a TWO-LEVEL counting method: (1) slopes bucket map-side into
    * ≤[[TheilsenBuckets]] coarse value ranges (a partial agg whose shuffle
    * moves buckets-per-mapper rows, never the pair frame — the first
    * counting attempt grouped by raw slope value, whose ~every-value-
    * distinct frame shuffled all 3M pairs and read 2.2× the old global
    * sort), (2) a bounded window over the coarse frame finds the bucket
    * containing the rank and its preceding-count offset, (3) only that
    * ONE bucket's values get exact per-value counts + [[Scale.prefixSum]]
    * (which keeps even a pathologically concentrated bucket distributed).
    * The multiset of slopes alone determines the rank-r value, so this is
    * exactly the oracle's row_number()-over-(slope,i,j) element without
    * its single-reducer global sort — a 30-year calendar (~60M pairs)
    * medians across the cluster instead of through one task.
    * Scale: pair generation is `explode(sequence(0, idx−1))` + an
    * EQUI-join on the earlier day index (no cartesian); the pair count is
    * days²/2 — calendar-bounded (~3M pairs for a 7-year series at ANY
    * data volume). No pair-frame-sized window or shuffle anywhere (pinned
    * in PlanSpec: every window is the _tb coarse frame or prefixSum's _pb).
    */
  val TheilsenBuckets = 4096L

  def dailyRevenueTheilsen(s: SparkSession, d: String): DataFrame = {
    val dy = daily(s, d)
    val st = dy.agg(min(col("day")).as("day0"))
    val ix = dy.crossJoin(broadcast(st))
      .select(datediff(col("day"), col("day0")).as("idx"), col("cents"))
    // earlier is calendar-bounded (one row per day) but reads from a
    // checkpointed frame with no size stats — without the explicit hint the
    // planner sort-merges, shuffling the exploded pair frame on i_idx;
    // broadcasting keeps pair generation one map-side codegen stage (r15)
    val earlier = broadcast(
      ix.select(col("idx").as("i_idx"), col("cents").as("i_cents")))
    // Exact Long decomposition of trunc(Δc·10⁶ / Δi) — the straight
    // DECIMAL(38,0) multiply ran every one of the days²/2 pair rows through
    // BigDecimal (measured 2.3 s vs 0.55 s for the Long form on the same
    // pane, r15). With q = Δc div Δi and r = Δc % Δi (both carrying Δc's
    // sign, Δi > 0), trunc decomposes over the integer shift q·10⁶ because
    // q·10⁶ and r·10⁶/Δi never differ in sign; |r| < Δi keeps r·10⁶
    // Long-safe, and q·10⁶ overflows only where the final BIGINT cast of
    // the decimal form already could not represent the slope.
    val slopes = Scale.materialize(ix.filter(col("idx") >= 1)
      .withColumn("i_idx", explode(sequence(lit(0), col("idx") - 1)))
      .join(earlier, "i_idx")
      .select(expr("(cents - i_cents) div (idx - i_idx) * 1000000 + " +
        "((cents - i_cents) % (idx - i_idx)) * 1000000 div (idx - i_idx)")
        .as("slope_micro"))) // 3 consumers
    // The range stats (1 row) and coarse bucket table (≤ TheilsenBuckets+1
    // rows) are bounded by literal constants — collect them and run the
    // rank-bucket search as driver arithmetic (the bounded-literal-model
    // discipline): the broadcast-subquery form re-traversed the pair frame
    // once per embedded subtree and chained ~4 extra stages of latency
    // (measured 6.2 s warm → the passes below, r15). The pair frame itself
    // is scanned exactly three times (stats, coarse, fine) and only the
    // selected bucket's values reach prefixSum — distributed, as before.
    val strow = slopes.agg(min(col("slope_micro")), max(col("slope_micro")),
      count(lit(1))).head()
    if (strow.isNullAt(0)) {
      // no pairs (single-day calendar): same empty frame the bucketed
      // chain produced
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_days",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_pairs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("slope_micro",
          org.apache.spark.sql.types.LongType)))
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val (mn, mx, m) = (strow.getLong(0), strow.getLong(1), strow.getLong(2))
    // coarse bucket width ≥ 1, ≤ TheilsenBuckets+1 buckets over the range
    val w = math.max((mx - mn) / TheilsenBuckets + 1L, 1L)
    val rank = (m + 1) / 2
    val coarse = slopes
      .groupBy(expr(s"(slope_micro - $mn) div $w").as("_tb"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // first bucket whose cumulative count reaches the rank, and the count
    // preceding it — the same (tb, off) the window form selected
    val (tb, off) = {
      var cum = 0L
      coarse.collectFirst {
        case (b, cnt) if { cum += cnt; cum >= rank } => (b, cum - cnt)
      }.get
    }
    val fine = slopes.filter(expr(s"(slope_micro - $mn) div $w") === tb)
      .groupBy(col("slope_micro")).agg(count(lit(1)).as("cnt"))
    Scale.prefixSum(fine, "slope_micro", "cnt")
      .filter(col("cum") + off >= rank)
      .groupBy(lit(m).as("m")) // 1 group — bounded (empty stays empty)
      .agg(min(col("slope_micro")).as("slope_micro"))
      .crossJoin(broadcast(dy.agg(count(lit(1)).as("n_days")))) // 1 row
      .select(col("n_days"), col("m").as("n_pairs"), col("slope_micro"))
  }

  private def theilsenOracleSql: String =
    s"""WITH daily AS ($dailySql),
       |st AS (SELECT min(day) AS day0 FROM daily),
       |ix AS (SELECT datediff('day', st.day0, day) AS idx, cents
       |  FROM daily, st),
       |slopes AS (SELECT e.idx AS i_idx, j.idx AS j_idx,
       |    CAST((CAST(j.cents AS HUGEINT) - e.cents) * 1000000
       |      // (j.idx - e.idx) AS BIGINT) AS slope_micro
       |  FROM (SELECT idx, cents,
       |          unnest(range(0, idx)) AS i_idx
       |        FROM ix WHERE idx >= 1) j
       |  JOIN ix e ON e.idx = j.i_idx),
       |rk AS (SELECT slope_micro,
       |    row_number() OVER (ORDER BY slope_micro, i_idx, j_idx) AS rn,
       |    count(*) OVER () AS m FROM slopes)
       |SELECT (SELECT count(*) FROM daily) AS n_days, m AS n_pairs,
       |  slope_micro
       |FROM rk WHERE rn = (m + 1) // 2""".stripMargin

  // ------------------------------------------------------------ dow index
  /** Day-of-week seasonal indices of daily revenue: per weekday (0 =
    * Sunday, via datediff-mod-7 from [[EpochSunday]] so both engines
    * agree), the day count, total and floored-mean cents, and the
    * seasonal index in ppm — dow_mean/overall_mean as one exact integer
    * cross-multiplication (sum_dow·n_total·1e6) div (total·n_dow). The
    * multiplicative weekly profile a forecaster deseasonalizes with.
    * Scale: one orders aggregate, then a ≤7-row rollup crossed with the
    * 1-row total.
    */
  def dailyRevenueDowIndex(s: SparkSession, d: String): DataFrame = {
    val dy = daily(s, d)
    val tot = dy.agg(count(lit(1)).as("n_total"), sum(col("cents")).as("tot"))
    dy.select(
        pmod(datediff(col("day"), to_date(lit(EpochSunday))), lit(7))
          .cast("long").as("dow"),
        col("cents"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("rev_cents"))
      .crossJoin(broadcast(tot)) // 1-row total
      .select(col("dow"), col("n_days"), col("rev_cents"),
        expr("rev_cents div n_days").as("mean_cents"),
        expr("CAST(CAST(rev_cents AS DECIMAL(38,0)) * n_total * 1000000 " +
          "div (CAST(tot AS DECIMAL(38,0)) * n_days) AS BIGINT)")
          .as("index_ppm"))
  }

  private def dowOracleSql: String =
    s"""WITH daily AS ($dailySql),
       |tot AS (SELECT count(*) AS n_total, sum(cents) AS tot FROM daily),
       |per AS (SELECT CAST(datediff('day', DATE '$EpochSunday', day) % 7
       |      AS BIGINT) AS dow,
       |    count(*) AS n_days, sum(cents) AS rev_cents
       |  FROM daily GROUP BY 1)
       |SELECT dow, n_days, CAST(rev_cents AS BIGINT) AS rev_cents,
       |  CAST(rev_cents // n_days AS BIGINT) AS mean_cents,
       |  CAST(CAST(rev_cents AS HUGEINT) * n_total * 1000000
       |    // (CAST(tot AS HUGEINT) * n_days) AS BIGINT) AS index_ppm
       |FROM per, tot""".stripMargin

  // ------------------------------------------------------------------ stl
  /** Additive seasonal decomposition of daily revenue (STL-lite — the
    * trend/seasonal/residual split every KPI dashboard plots): trend =
    * centered 7-ROW moving average over the observed days (partial frames
    * at the series edges, the standard convention, restated in the
    * oracle), seasonal = per-day-of-week floored mean deviation from
    * trend (the [[EpochSunday]] dow so both engines agree), residual =
    * the remainder — rev = trend + seasonal + residual EXACTLY, because
    * everything is integer cents with `div` means (truncation is part of
    * the stated statistic; both engines truncate toward zero, see the
    * family header). Scale: one orders aggregate to the calendar-bounded
    * daily frame; the global-order window and the ≤7-row seasonal rollup
    * are bounded model work like every operator in this family.
    */
  def dailyRevenueStl(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val t = daily(s, d)
      .withColumn("win_sum", sum(col("cents")).over(w))
      .withColumn("win_n", count(lit(1)).over(w))
      .select(col("day"), col("cents"),
        expr("win_sum div win_n").as("trend_c"),
        pmod(datediff(col("day"), to_date(lit(EpochSunday))), lit(7))
          .cast("long").as("dow"))
    val seas = t.groupBy(col("dow"))
      .agg(expr("sum(cents - trend_c) div count(1)").as("seas_c"))
    t.join(broadcast(seas), "dow") // ≤7 rows
      .select(col("day"), col("cents"), col("trend_c"), col("seas_c"),
        (col("cents") - col("trend_c") - col("seas_c")).as("resid_c"))
  }

  private def stlOracleSql: String =
    s"""WITH daily AS ($dailySql),
       |t AS (SELECT day, cents,
       |    CAST(sum(cents) OVER w // count(*) OVER w AS BIGINT) AS trend_c,
       |    CAST(datediff('day', DATE '$EpochSunday', day) % 7 AS BIGINT) AS dow
       |  FROM daily
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |se AS (SELECT dow, CAST(sum(cents - trend_c) // count(*) AS BIGINT)
       |    AS seas_c
       |  FROM t GROUP BY 1)
       |SELECT t.day, t.cents, t.trend_c, se.seas_c,
       |  t.cents - t.trend_c - se.seas_c AS resid_c
       |FROM t JOIN se USING (dow)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "daily_revenue_acf" -> dailyRevenueAcf,
    "daily_revenue_theilsen" -> dailyRevenueTheilsen,
    "daily_revenue_dow_index" -> dailyRevenueDowIndex,
    "daily_revenue_stl" -> dailyRevenueStl,
  )

  val oracles: Map[String, String] = Map(
    "daily_revenue_acf" -> acfOracleSql,
    "daily_revenue_theilsen" -> theilsenOracleSql,
    "daily_revenue_dow_index" -> dowOracleSql,
    "daily_revenue_stl" -> stlOracleSql,
  )
}
