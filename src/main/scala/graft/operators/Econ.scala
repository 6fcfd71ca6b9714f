package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Mart-economics operators: experiment power sizing, cohort LTV curves,
  * market-concentration (HHI), and the Laspeyres/Paasche price index.
  * Family discipline: money in exact cents (DECIMAL(18,4)·100 → BIGINT),
  * statistics as integer/DECIMAL cross-multiplications with floor-ppm
  * divisions in the final (or per-part, where both engines state the same
  * floor) projection, map-side-partial aggregates before every shuffle,
  * and windows only over bounded frames (cohort ages, brands).
  */
object Econ {

  /** (z_{0.975} + z_{0.8})² in ppm — the 95%-confidence / 80%-power
    * constant of the two-sample size formula, driver-computed once and
    * embedded as a LITERAL in both engines (the generated-literal
    * contract: no cross-engine erf).
    */
  val Z2Ppm: Long = math.floor(math.pow(1.959964 + 0.841621, 2) * 1e6).toLong

  /** Relative minimum detectable effect the sizing targets: 5% of the
    * metric mean (δ = mean/20).
    */
  val MdeInvRel = 20L

  /** A/B experiment power sizing per event type: the required per-arm
    * sample size to detect a 5% relative lift in the value metric at 95%
    * confidence / 80% power — n = (z_α/2+z_β)²·2σ²/δ² — computed entirely
    * in integers from exact cents moments: with N, S=Σcents, Q=Σcents²,
    * sample variance = (N·Q−S²)/(N(N−1)) and δ = S/(20N), so
    * n = Z2·800·(N·Q−S²)·N / ((N−1)·S²), one floor division with the Z
    * constant in ppm ([[Z2Ppm]]). One map-side-partial agg per type; the
    * division runs on the bounded type frame. DECIMAL(38,0) headroom holds
    * to ~10⁷ events/type at this value scale (≈10³⁴ peak); past that the
    * same formula runs on down-shifted cents — the statistic, not the
    * plan, changes.
    */
  def eventsAbPower(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        sum(expr("cents * cents")).as("sumsq"))
      .select(col("event_type"), col("n_events"), col("sum_cents"),
        col("sumsq").as("sumsq_cents"),
        // nullif guards the degenerate corpora (single event or all-zero
        // values per type): Spark's div returns NULL on a NULL divisor
        // where a raw 0 divisor would differ from DuckDB (NULL vs error),
        // so BOTH engines emit NULL n_per_arm and the parity gate compares
        // instead of crashing — the dq_expectations/retention discipline
        expr(s"CAST(CAST($Z2Ppm AS DECIMAL(38,0)) * 800 * " +
          "(CAST(n_events AS DECIMAL(38,0)) * sumsq - " +
          "CAST(sum_cents AS DECIMAL(38,0)) * sum_cents) " +
          "* n_events div nullif((n_events - 1) * CAST(sum_cents AS DECIMAL(38,0)) " +
          "* sum_cents * 1000000, 0) AS BIGINT)").as("n_per_arm"))
  }

  private def abPowerOracleSql: String =
    s"""WITH e AS (SELECT event_type,
       |    CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |m AS (SELECT event_type, count(*) AS n_events,
       |    sum(cents) AS sum_cents,
       |    sum(cents * cents) AS sumsq FROM e GROUP BY 1)
       |SELECT event_type, n_events, CAST(sum_cents AS BIGINT) AS sum_cents,
       |  CAST(sumsq AS BIGINT) AS sumsq_cents,
       |  CAST(CAST($Z2Ppm AS HUGEINT) * 800
       |    * (n_events * sumsq - CAST(sum_cents AS HUGEINT) * sum_cents)
       |    * n_events
       |    // nullif((n_events - 1) * CAST(sum_cents AS HUGEINT) * sum_cents
       |      * 1000000, 0) AS BIGINT) AS n_per_arm
       |FROM m""".stripMargin

  /** Cohort LTV curve over the order history: customers cohorted by
    * first-order year, revenue accumulated by account age (order year −
    * cohort year) — the (cohort, age) triangle a growth mart publishes,
    * with cumulative revenue and LTV-per-cohort-member in exact cents.
    * One per-customer min-year agg (map-side partial), one key-shuffle
    * join back, one (cohort, age) rollup; the cumulative window runs on
    * the bounded triangle (years × ages), and the LTV division is the
    * final projection.
    */
  def cohortLtvCurve(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey").as("custkey"),
      year(col("o_orderdate")).as("yr"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)")
        .as("cents"))
    val first = o.groupBy(col("custkey")).agg(min(col("yr")).as("cohort_year"))
    val sizes = first.groupBy(col("cohort_year"))
      .agg(count(lit(1)).as("n_cohort"))
    val cells = o.join(first, "custkey")
      .groupBy(col("cohort_year"), (col("yr") - col("cohort_year")).as("age"))
      .agg(countDistinct(col("custkey")).as("n_active"),
        sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_year")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .join(broadcast(sizes), "cohort_year")
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w)) // bounded triangle
      .select(col("cohort_year"), col("age"), col("n_cohort"), col("n_active"),
        col("rev_cents"), col("cum_rev_cents"),
        expr("CAST(cum_rev_cents div n_cohort AS BIGINT)").as("ltv_cents"))
  }

  private def cohortLtvOracleSql: String =
    """WITH o AS (SELECT o_custkey AS custkey, year(o_orderdate) AS yr,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |f AS (SELECT custkey, min(yr) AS cohort_year FROM o GROUP BY 1),
      |sz AS (SELECT cohort_year, count(*) AS n_cohort FROM f GROUP BY 1),
      |cells AS (SELECT f.cohort_year, o.yr - f.cohort_year AS age,
      |    count(DISTINCT o.custkey) AS n_active, sum(cents) AS rev_cents
      |  FROM o JOIN f USING (custkey) GROUP BY 1, 2),
      |c AS (SELECT cohort_year, age, n_active, rev_cents,
      |    sum(rev_cents) OVER (PARTITION BY cohort_year ORDER BY age
      |      ROWS UNBOUNDED PRECEDING) AS cum_rev_cents FROM cells)
      |SELECT c.cohort_year, CAST(age AS INT) AS age,
      |  CAST(n_cohort AS BIGINT) AS n_cohort,
      |  CAST(n_active AS BIGINT) AS n_active,
      |  CAST(rev_cents AS BIGINT) AS rev_cents,
      |  CAST(cum_rev_cents AS BIGINT) AS cum_rev_cents,
      |  CAST(cum_rev_cents // n_cohort AS BIGINT) AS ltv_cents
      |FROM c JOIN sz USING (cohort_year)""".stripMargin

  /** Supplier market concentration per part brand — the Herfindahl–
    * Hirschman index in ppm (Σ shareᵢ², 10⁶ = monopoly) plus the top
    * supplier's share: HHI = Σ revᵢ²·10⁶ / (Σrev)², all integer cents so
    * the index is exact. One dim join (partkey → brand), one
    * (brand, supplier) map-side-partial agg, then a brand rollup; both
    * divisions land on the bounded brand frame.
    */
  def supplierHhi(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)")
          .as("cents"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(sum(col("cents")).as("rev"))
    rev.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).as("rev_cents"),
        sum(expr("CAST(rev AS DECIMAL(38,0)) * rev")).cast("decimal(38,0)")
          .as("sq"),
        max(col("rev")).as("top_rev"))
      .select(col("p_brand"), col("n_suppliers"), col("rev_cents"),
        expr("CAST(CAST(sq * 1000000 AS DECIMAL(38,0)) div " +
          "(CAST(rev_cents AS DECIMAL(38,0)) * rev_cents) AS BIGINT)")
          .as("hhi_ppm"),
        expr("CAST(CAST(CAST(top_rev AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div rev_cents AS BIGINT)").as("top_share_ppm"))
  }

  private def hhiOracleSql: String =
    """WITH r AS (SELECT p_brand, l_suppkey,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT))
      |      AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
      |b AS (SELECT p_brand, count(*) AS n_suppliers, sum(rev) AS rev_cents,
      |    sum(CAST(rev AS HUGEINT) * rev) AS sq, max(rev) AS top_rev
      |  FROM r GROUP BY 1)
      |SELECT p_brand, CAST(n_suppliers AS BIGINT) AS n_suppliers,
      |  CAST(rev_cents AS BIGINT) AS rev_cents,
      |  CAST(sq * 1000000 // (CAST(rev_cents AS HUGEINT) * rev_cents)
      |    AS BIGINT) AS hhi_ppm,
      |  CAST(CAST(top_rev AS HUGEINT) * 1000000 // rev_cents AS BIGINT)
      |    AS top_share_ppm
      |FROM b""".stripMargin

  /** Laspeyres and Paasche price indices per brand between the first and
    * second half of the ship history (split at the integer midpoint ship
    * day, a broadcast 1-row scalar): per part, unit values come from the
    * exact cents/quantity totals of each half, and the cross terms
    * (current price × base quantity, base price × current quantity) are
    * per-part FLOOR divisions — stated identically in both engines, so the
    * brand totals agree bit-for-bit. Laspeyres_ppm = Σ⌊ep1·q0/q1⌋·10⁶/Σep0,
    * Paasche_ppm = Σep1·10⁶/Σ⌊ep0·q1/q0⌋, over parts traded in BOTH
    * halves. One lineitem scan with conditional sums (shuffle on partkey),
    * one dim join for the brand, a bounded brand rollup.
    */
  def partPriceIndex(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_partkey"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)")
        .as("cents"),
      unix_date(to_date(col("l_shipdate"))).as("dy"))
    val mid = li.agg(expr("(min(dy) + max(dy)) div 2").as("mid"))
    val pp = li.crossJoin(broadcast(mid)) // 1-row corpus-bounds scalar
      .groupBy(col("l_partkey"))
      .agg(sum(when(col("dy") <= col("mid"), col("cents")).otherwise(0L)).as("ep0"),
        sum(when(col("dy") <= col("mid"), col("qty")).otherwise(0L)).as("q0"),
        sum(when(col("dy") > col("mid"), col("cents")).otherwise(0L)).as("ep1"),
        sum(when(col("dy") > col("mid"), col("qty")).otherwise(0L)).as("q1"))
      .filter(col("q0") > 0 && col("q1") > 0)
      .select(col("l_partkey"), col("ep0"), col("ep1"),
        expr("CAST(CAST(ep1 AS DECIMAL(38,0)) * q0 div q1 AS BIGINT)")
          .as("las_num"),
        expr("CAST(CAST(ep0 AS DECIMAL(38,0)) * q1 div q0 AS BIGINT)")
          .as("pas_den"))
    pp.join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("ep0")).as("base_cents"), sum(col("ep1")).as("cur_cents"),
        sum(col("las_num")).as("ln"), sum(col("pas_den")).as("pd"))
      .select(col("p_brand"), col("n_parts"), col("base_cents"), col("cur_cents"),
        expr("CAST(CAST(CAST(ln AS DECIMAL(38,0)) * 1000000 AS DECIMAL(38,0)) " +
          "div base_cents AS BIGINT)").as("laspeyres_ppm"),
        expr("CAST(CAST(CAST(cur_cents AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div pd AS BIGINT)").as("paasche_ppm"))
  }

  private def priceIndexOracleSql: String =
    """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents,
      |    CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS dy FROM lineitem),
      |b AS (SELECT (min(dy) + max(dy)) // 2 AS mid FROM li),
      |pp AS (SELECT l_partkey,
      |    sum(CASE WHEN dy <= mid THEN cents ELSE 0 END) AS ep0,
      |    sum(CASE WHEN dy <= mid THEN qty ELSE 0 END) AS q0,
      |    sum(CASE WHEN dy > mid THEN cents ELSE 0 END) AS ep1,
      |    sum(CASE WHEN dy > mid THEN qty ELSE 0 END) AS q1
      |  FROM li, b GROUP BY 1),
      |m AS (SELECT l_partkey, ep0, ep1,
      |    CAST(CAST(ep1 AS HUGEINT) * q0 // q1 AS BIGINT) AS las_num,
      |    CAST(CAST(ep0 AS HUGEINT) * q1 // q0 AS BIGINT) AS pas_den
      |  FROM pp WHERE q0 > 0 AND q1 > 0),
      |g AS (SELECT p_brand, count(*) AS n_parts, sum(ep0) AS base_cents,
      |    sum(ep1) AS cur_cents, sum(las_num) AS ln, sum(pas_den) AS pd
      |  FROM m JOIN part ON l_partkey = p_partkey GROUP BY 1)
      |SELECT p_brand, CAST(n_parts AS BIGINT) AS n_parts,
      |  CAST(base_cents AS BIGINT) AS base_cents,
      |  CAST(cur_cents AS BIGINT) AS cur_cents,
      |  CAST(CAST(ln AS HUGEINT) * 1000000 // base_cents AS BIGINT)
      |    AS laspeyres_ppm,
      |  CAST(CAST(cur_cents AS HUGEINT) * 1000000 // pd AS BIGINT)
      |    AS paasche_ppm
      |FROM g""".stripMargin

  /** XYZ demand-variability thresholds on CV² in ppm: X ≤ 0.25 (CV ≤ 0.5),
    * Y ≤ 1.0 (CV ≤ 1.0), Z above — the standard bands.
    */
  val XyzXMaxPpm = 250000L
  val XyzYMaxPpm = 1000000L

  /** XYZ demand-variability classification per part (the companion to ABC
    * revenue classes): CV² of weekly shipped quantity over the part's
    * ACTIVE weeks — CV²·10⁶ = (n·Σq²−(Σq)²)·10⁶/(Σq)², all integer, one
    * floor division per part. Active weeks, not the zero-inclusive
    * calendar grid: sparse synthetic demand makes the grid form assign Z
    * to everything (measured), while given-active variability separates
    * X from Y — and this corpus's uniform quantities never reach Z, which
    * the audit duly reports. One (part, week) map-side-partial agg, one
    * part rollup; parts with a single active week carry no variability
    * signal and are excluded by contract.
    */
  def partXyzClass(s: SparkSession, d: String): DataFrame = {
    val pw = Tables.lineitem(s, d)
      .select(col("l_partkey"), expr("CAST(l_quantity AS BIGINT)").as("qty"),
        expr("CAST(unix_date(to_date(l_shipdate)) AS BIGINT) div 7").as("wk"))
      .groupBy(col("l_partkey"), col("wk")).agg(sum(col("qty")).as("q"))
    pw.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_weeks_active"), sum(col("q")).as("qty_total"),
        sum(col("q") * col("q")).as("qq"))
      .filter(col("n_weeks_active") > 1)
      .select(col("l_partkey"), col("n_weeks_active"), col("qty_total"),
        expr("CAST(CAST((n_weeks_active * qq - CAST(qty_total AS DECIMAL(38,0)) " +
          "* qty_total) * 1000000 AS DECIMAL(38,0)) div " +
          "(CAST(qty_total AS DECIMAL(38,0)) * qty_total) AS BIGINT)")
          .as("cv2_ppm"))
      .withColumn("xyz_class",
        when(col("cv2_ppm") <= XyzXMaxPpm, lit("X"))
          .when(col("cv2_ppm") <= XyzYMaxPpm, lit("Y"))
          .otherwise(lit("Z")))
  }

  private def xyzOracleSql: String =
    s"""WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
       |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS wk
       |  FROM lineitem),
       |pw AS (SELECT l_partkey, wk, sum(qty) AS q FROM li GROUP BY 1, 2),
       |m AS (SELECT l_partkey, count(*) AS n, sum(q) AS qt,
       |    sum(q * q) AS qq FROM pw GROUP BY 1),
       |cv AS (SELECT l_partkey, n, qt,
       |    CAST((n * CAST(qq AS HUGEINT) - CAST(qt AS HUGEINT) * qt) * 1000000
       |      // (CAST(qt AS HUGEINT) * qt) AS BIGINT) AS cv2_ppm
       |  FROM m WHERE n > 1)
       |SELECT l_partkey, CAST(n AS BIGINT) AS n_weeks_active,
       |  CAST(qt AS BIGINT) AS qty_total, cv2_ppm,
       |  CASE WHEN cv2_ppm <= $XyzXMaxPpm THEN 'X'
       |       WHEN cv2_ppm <= $XyzYMaxPpm THEN 'Y' ELSE 'Z' END AS xyz_class
       |FROM cv""".stripMargin

  /** Bullwhip indicator: the variance-amplification ratio between the
    * demand signal (daily order revenue) and the fulfilment signal (daily
    * shipped revenue) — >10⁶ ppm means order-side variance exceeds
    * ship-side, the classic supply-chain whip. Both variances via the
    * zero-inclusive day-grid moment identity (T·Σv²−(Σv)², grid widths
    * from 1-row bounds — silent days are free), each side FLOORED to an
    * integer cents² variance first (vₒ = (To·Σo²−(Σo)²) div To², vₛ
    * likewise — the single cross-multiplied ratio was measured to
    * overflow DECIMAL(38) at sf1 daily-cents scale, and the per-side
    * floor loses ≲10⁻¹⁴ relative at any corpus where the ratio is
    * meaningful), then ONE ppm division vₒ·10⁶/vₛ. Two scans, two
    * map-side-partial day aggs, two 1-row moment frames.
    */
  def ordersBullwhip(s: SparkSession, d: String): DataFrame = {
    def dayMoments(df: DataFrame): DataFrame =
      df.groupBy(col("dy")).agg(sum(col("cents")).as("v"))
        .agg((max(col("dy")) - min(col("dy")) + 1).as("t"),
          sum(col("v")).as("sv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("svv"))
    val om = dayMoments(Tables.orders(s, d).select(
      unix_date(to_date(col("o_orderdate"))).cast("long").as("dy"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)").as("cents")))
    val sm = dayMoments(Tables.lineitem(s, d).select(
      unix_date(to_date(col("l_shipdate"))).cast("long").as("dy"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)").as("cents")))
    om.select(col("t").as("tor"), col("sv").as("so"), col("svv").as("soo"))
      .crossJoin(broadcast(
        sm.select(col("t").as("tsh"), col("sv").as("ss"), col("svv").as("sss"))))
      .select(col("tor").as("t_orders"), col("tsh").as("t_ships"),
        expr("CAST(CAST(CAST((tor * soo - CAST(so AS DECIMAL(38,0)) * so) " +
          "div (tor * tor) AS DECIMAL(38,0)) * 1000000 AS DECIMAL(38,0)) div " +
          "CAST((tsh * sss - CAST(ss AS DECIMAL(38,0)) * ss) div (tsh * tsh) " +
          "AS DECIMAL(38,0)) AS BIGINT)").as("bullwhip_ppm"))
  }

  private def bullwhipOracleSql: String =
    """WITH o AS (SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dy,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |s AS (SELECT CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS dy,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |od AS (SELECT dy, sum(cents) AS v FROM o GROUP BY 1),
      |sd AS (SELECT dy, sum(cents) AS v FROM s GROUP BY 1),
      |om AS (SELECT max(dy) - min(dy) + 1 AS t, sum(v) AS sv,
      |    sum(CAST(v AS HUGEINT) * v) AS svv FROM od),
      |sm AS (SELECT max(dy) - min(dy) + 1 AS t, sum(v) AS sv,
      |    sum(CAST(v AS HUGEINT) * v) AS svv FROM sd)
      |SELECT CAST(om.t AS BIGINT) AS t_orders, CAST(sm.t AS BIGINT) AS t_ships,
      |  CAST(((om.t * om.svv - CAST(om.sv AS HUGEINT) * om.sv)
      |      // (CAST(om.t AS HUGEINT) * om.t)) * 1000000
      |    // ((sm.t * sm.svv - CAST(sm.sv AS HUGEINT) * sm.sv)
      |      // (CAST(sm.t AS HUGEINT) * sm.t))
      |    AS BIGINT) AS bullwhip_ppm
      |FROM om, sm""".stripMargin

  /** Empirical-Bayes shrinkage of per-part return rates (beta-binomial,
    * method-of-moments prior): shrunk = (x + κ·m)/(n + κ) with the prior
    * strength κ = m(1−m)/v_true − 1 and v_true the observed between-part
    * rate variance minus the binomial sampling floor m(1−m)/n̄ — all in
    * exact ppm integers (per-part raw rates floor-quantized to ppm, the
    * moment algebra on the quantized values so both engines state the
    * same numbers; v_true floored at 1, κ at 0). On this corpus κ ≫ n̄:
    * the audit correctly discovers that the per-part spread is almost
    * entirely binomial noise around the uniform 1/3 truth and shrinks
    * hard — that finding IS the output. One part agg + one 1-row moment
    * frame broadcast back; no collect.
    */
  def partReturnShrinkage(s: SparkSession, d: String): DataFrame = {
    val p = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
    val r = p.withColumn("raw_ppm",
      expr("CAST(CAST(CAST(x AS DECIMAL(38,0)) * 1000000 AS DECIMAL(38,0)) " +
        "div n AS BIGINT)"))
      .transform(Scale.materialize) // moments + projection both consume
    val g = r.agg(count(lit(1)).as("np"), sum(col("n")).as("tn"),
        sum(col("x")).as("tx"), sum(col("raw_ppm")).as("sr"),
        sum(expr("CAST(raw_ppm AS DECIMAL(38,0)) * raw_ppm"))
          .cast("decimal(38,0)").as("srr"))
      .select(col("np"), col("tn"),
        expr("CAST(CAST(CAST(tx AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div tn AS BIGINT)").as("m_ppm"),
        expr("CAST(CAST(np * srr - CAST(sr AS DECIMAL(38,0)) * sr " +
          "AS DECIMAL(38,0)) div (np * (np - 1)) AS BIGINT)").as("v_obs"),
        expr("CAST(tn div np AS BIGINT)").as("nbar"))
      .select(
        expr("greatest(v_obs - m_ppm * (1000000 - m_ppm) div nbar, 1)")
          .as("v_true"),
        expr("greatest(m_ppm * (1000000 - m_ppm) div " +
          "greatest(v_obs - m_ppm * (1000000 - m_ppm) div nbar, 1) - 1, 0)")
          .as("kappa"),
        col("m_ppm"))
    r.crossJoin(broadcast(g)) // 1-row prior scalar
      .select(col("l_partkey"), col("n").as("n_items"), col("x").as("n_returns"),
        col("raw_ppm"),
        expr("CAST((CAST(x AS DECIMAL(38,0)) * 1000000 + " +
          "CAST(kappa AS DECIMAL(38,0)) * m_ppm) div (n + kappa) AS BIGINT)")
          .as("shrunk_ppm"),
        col("kappa"), col("m_ppm"))
  }

  private def shrinkageOracleSql: String =
    """WITH p AS (SELECT l_partkey, count(*) AS n,
      |    count(*) FILTER (l_returnflag = 'R') AS x FROM lineitem GROUP BY 1),
      |r AS (SELECT l_partkey, n, x,
      |    CAST(CAST(x AS HUGEINT) * 1000000 // n AS BIGINT) AS raw_ppm FROM p),
      |g0 AS (SELECT count(*) AS np, sum(n) AS tn, sum(x) AS tx,
      |    sum(raw_ppm) AS sr, sum(CAST(raw_ppm AS HUGEINT) * raw_ppm) AS srr
      |  FROM r),
      |mo AS (SELECT np,
      |    CAST(CAST(tx AS HUGEINT) * 1000000 // tn AS BIGINT) AS m_ppm,
      |    CAST((np * srr - CAST(sr AS HUGEINT) * sr) // (np * (np - 1))
      |      AS BIGINT) AS v_obs,
      |    CAST(tn // np AS BIGINT) AS nbar FROM g0),
      |ka AS (SELECT m_ppm,
      |    greatest(m_ppm * (1000000 - m_ppm)
      |      // greatest(v_obs - m_ppm * (1000000 - m_ppm) // nbar, 1) - 1, 0)
      |      AS kappa FROM mo)
      |SELECT l_partkey, CAST(n AS BIGINT) AS n_items,
      |  CAST(x AS BIGINT) AS n_returns, raw_ppm,
      |  CAST((CAST(x AS HUGEINT) * 1000000 + CAST(kappa AS HUGEINT) * m_ppm)
      |    // (n + kappa) AS BIGINT) AS shrunk_ppm,
      |  CAST(kappa AS BIGINT) AS kappa, m_ppm
      |FROM r, ka""".stripMargin

  /** The ABC × XYZ planning matrix (the classic inventory-policy grid:
    * value class × demand-variability class): part revenue classes by the
    * customer_abc cum-share algebra (value-frame prefix sum = RANGE-window
    * tie semantics, integer cross-multiplied 80/95% thresholds) joined to
    * [[partXyzClass]]'s CV² classes, rolled up to the ≤9-cell grid with
    * part counts and exact revenue cents. Parts without a variability
    * signal (a single active week) are excluded by the XYZ contract, so
    * the matrix covers exactly the classifiable population. One revenue
    * agg + the XYZ pass + a key join + a bounded rollup.
    */
  def partAbcXyz(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg((round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2) * 100)
        .cast("long").as("rc"))
      .transform(Scale.materialize)
    val byVal = rev.groupBy(col("rc")).agg(sum(col("rc")).as("vsum"))
    val cumAsc = Scale.prefixSum(byVal, "rc", "vsum")
    val total = rev.agg(sum(col("rc")).as("total"))
    val abc = rev.join(cumAsc, "rc").join(broadcast(total))
      .withColumn("cumge", col("total") - col("cum") + col("vsum"))
      .select(col("l_partkey"), col("rc"),
        when(col("cumge") * 5 <= col("total") * 4, lit("A"))
          .when(col("cumge") * 20 <= col("total") * 19, lit("B"))
          .otherwise(lit("C")).as("abc_class"))
    abc.join(partXyzClass(s, d).select(col("l_partkey"), col("xyz_class")),
        "l_partkey")
      .groupBy(col("abc_class"), col("xyz_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rc")).as("rev_cents"))
  }

  private def abcXyzOracleSql: String =
    s"""WITH rev AS (SELECT l_partkey,
       |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) * 100
       |      AS BIGINT) AS rc
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT sum(rc) AS total FROM rev),
       |w AS (SELECT l_partkey, rc,
       |    sum(rc) OVER (ORDER BY rc DESC) AS cumge FROM rev),
       |abc AS (SELECT l_partkey, rc,
       |    CASE WHEN cumge * 5 <= total * 4 THEN 'A'
       |         WHEN cumge * 20 <= total * 19 THEN 'B' ELSE 'C' END
       |      AS abc_class
       |  FROM w, t),
       |li2 AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
       |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS wk
       |  FROM lineitem),
       |pw AS (SELECT l_partkey, wk, sum(qty) AS q FROM li2 GROUP BY 1, 2),
       |m AS (SELECT l_partkey, count(*) AS n, sum(q) AS qt,
       |    sum(q * q) AS qq FROM pw GROUP BY 1),
       |xyz AS (SELECT l_partkey,
       |    CASE WHEN cv2 <= $XyzXMaxPpm THEN 'X'
       |         WHEN cv2 <= $XyzYMaxPpm THEN 'Y' ELSE 'Z' END AS xyz_class
       |  FROM (SELECT l_partkey,
       |      CAST((n * CAST(qq AS HUGEINT) - CAST(qt AS HUGEINT) * qt)
       |        * 1000000 // (CAST(qt AS HUGEINT) * qt) AS BIGINT) AS cv2
       |    FROM m WHERE n > 1))
       |SELECT abc_class, xyz_class, count(*) AS n_parts,
       |  CAST(sum(rc) AS BIGINT) AS rev_cents
       |FROM abc JOIN xyz USING (l_partkey) GROUP BY 1, 2""".stripMargin

  /** Supplier scorecard: the per-supplier operating summary a sourcing
    * mart publishes — exact revenue cents, line count, return rate in
    * floor-ppm, and the supplier's revenue share within its nation
    * (nation totals are a bounded ≤|nations|-row broadcast, so the share
    * needs no supplier-keyed window). One lineitem agg keyed on suppkey
    * (map-side partial), one supplier-dim join, one broadcast join of the
    * nation rollup; divisions in the final projection only.
    */
  def supplierScorecard(s: SparkSession, d: String): DataFrame = {
    val per = Tables.lineitem(s, d).groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)"))
          .as("rev_cents"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returns"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      // materialized: the nation rollup AND the final join both consume
      // this subtree — without it the lineitem agg + supplier join execute
      // twice (the family's discipline for multiply-consumed frames)
      .transform(Scale.materialize)
    val nat = per.groupBy(col("s_nationkey"))
      .agg(sum(col("rev_cents")).as("nat_cents"))
    per.join(broadcast(nat), "s_nationkey") // bounded nation rollup
      .select(col("s_suppkey"), col("s_nationkey"), col("n_items"),
        col("rev_cents"), col("n_returns"),
        expr("CAST(CAST(CAST(n_returns AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div n_items AS BIGINT)").as("return_ppm"),
        expr("CAST(CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div nat_cents AS BIGINT)").as("nation_share_ppm"))
  }

  private def scorecardOracleSql: String =
    """WITH per AS (SELECT l_suppkey, count(*) AS n_items,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT))
      |      AS rev_cents,
      |    count(*) FILTER (l_returnflag = 'R') AS n_returns
      |  FROM lineitem GROUP BY 1),
      |j AS (SELECT per.*, s_nationkey FROM per
      |  JOIN supplier ON l_suppkey = s_suppkey),
      |nat AS (SELECT s_nationkey, sum(rev_cents) AS nat_cents
      |  FROM j GROUP BY 1)
      |SELECT l_suppkey AS s_suppkey, j.s_nationkey,
      |  CAST(n_items AS BIGINT) AS n_items,
      |  CAST(rev_cents AS BIGINT) AS rev_cents,
      |  CAST(n_returns AS BIGINT) AS n_returns,
      |  CAST(CAST(n_returns AS HUGEINT) * 1000000 // n_items AS BIGINT)
      |    AS return_ppm,
      |  CAST(CAST(rev_cents AS HUGEINT) * 1000000 // nat_cents AS BIGINT)
      |    AS nation_share_ppm
      |FROM j JOIN nat ON j.s_nationkey = nat.s_nationkey""".stripMargin

  /** Per-part unit-price dispersion across the order history: realized
    * unit price per line in exact cents (extended price ÷ quantity, one
    * truncated positive division — both engines floor identically), then
    * per part the line count, min/max/floored-mean unit cents, and the
    * relative spread (max−min)/min in ppm. The procurement-audit view:
    * a wide spread means inconsistent pricing (discount leakage or data
    * error) and feeds the same review queue as part_price_index's index
    * drift. Scale: one map-side projection + one partkey-keyed aggregate
    * with partial combine; output is the part dimension.
    */
  def partPriceDispersion(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_partkey").as("partkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT) " +
          "div CAST(l_quantity AS BIGINT)").as("unit_cents"))
      .groupBy(col("partkey"))
      .agg(count(lit(1)).as("n_lines"),
        min(col("unit_cents")).as("min_cents"),
        max(col("unit_cents")).as("max_cents"),
        expr("sum(unit_cents) div count(1)").as("mean_cents"))
      .withColumn("spread_ppm",
        expr("CAST((max_cents - min_cents) * 1000000 " +
          "div nullif(min_cents, 0) AS BIGINT)"))

  private def priceDispersionOracleSql: String =
    """WITH u AS (SELECT l_partkey AS partkey,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)
      |      // CAST(l_quantity AS BIGINT) AS unit_cents
      |  FROM lineitem)
      |SELECT partkey, count(*) AS n_lines,
      |  min(unit_cents) AS min_cents, max(unit_cents) AS max_cents,
      |  CAST(sum(unit_cents) // count(*) AS BIGINT) AS mean_cents,
      |  CAST((max(unit_cents) - min(unit_cents)) * 1000000
      |    // nullif(min(unit_cents), 0) AS BIGINT) AS spread_ppm
      |FROM u GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "part_price_dispersion" -> partPriceDispersion,
    "supplier_scorecard" -> supplierScorecard,
    "part_abc_xyz" -> partAbcXyz,
    "events_ab_power" -> eventsAbPower,
    "cohort_ltv_curve" -> cohortLtvCurve,
    "supplier_hhi" -> supplierHhi,
    "part_price_index" -> partPriceIndex,
    "part_xyz_class" -> partXyzClass,
    "orders_bullwhip" -> ordersBullwhip,
    "part_return_shrinkage" -> partReturnShrinkage,
  )

  val oracles: Map[String, String] = Map(
    "part_price_dispersion" -> priceDispersionOracleSql,
    "supplier_scorecard" -> scorecardOracleSql,
    "part_abc_xyz" -> abcXyzOracleSql,
    "events_ab_power" -> abPowerOracleSql,
    "cohort_ltv_curve" -> cohortLtvOracleSql,
    "supplier_hhi" -> hhiOracleSql,
    "part_price_index" -> priceIndexOracleSql,
    "part_xyz_class" -> xyzOracleSql,
    "orders_bullwhip" -> bullwhipOracleSql,
    "part_return_shrinkage" -> shrinkageOracleSql,
  )
}
