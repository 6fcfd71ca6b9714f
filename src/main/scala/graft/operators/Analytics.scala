package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The analytics mart: the role ClickHouse + `daily_report.py` play in the
  * reference (revenue rollups, funnels, time-bucketed reports over the
  * CDC-materialized star schema), re-expressed as declarative Spark plans.
  *
  * Scale notes (100 TB):
  *   - dimension joins (region/nation/supplier/part/customer) are broadcast —
  *     TPC-H ratios keep them tiny relative to the facts;
  *   - fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  *     coalesces/splits the post-shuffle partitions;
  *   - every aggregate is partial (map-side combine) before the shuffle;
  *   - windows partition by fine-grained keys (customer, user) so no single
  *     partition collects unbounded data.
  *
  * Ref: spark-jobs/daily_report.py:13-20 (revenue total) and
  * init-clickhouse.sql (the mart tables these reports run on).
  */
object Analytics {

  /** Money sums rounded to cents, averages to 4dp: keeps the DuckDB oracle
    * hash-stable against float summation order.
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        (floor(round(sum(col("l_quantity")), 2) / count(lit(1)) * 1e4) / 1e4).as("avg_qty"),
        (floor(round(sum(col("l_extendedprice")), 2) / count(lit(1)) * 1e4) / 1e4).as("avg_price"),
        (floor(round(sum(col("l_discount")), 4) / count(lit(1)) * 1e6) / 1e6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  def q3ShippingPriority(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-03-15"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        round(col("revenue"), 2).as("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
    // Dims flow broadcast; only orders⋈lineitem shuffles.
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** The reference's daily report (`daily_report.py`) done for real: revenue
    * by day over the orders fact.
    */
  def dailyRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Order-status funnel — the e-commerce `status` lifecycle the reference's
    * generator drives (data-generator/main.py:139-168).
    */
  def statusFunnel(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        (floor(round(sum(col("o_totalprice")), 2) / count(lit(1)) * 1e4) / 1e4).as("avg_order_value"))

  def categoryRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        round(sum(col("l_quantity")), 2).as("qty"))

  def topCustomers(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("spend").desc, col("c_custkey"))
    spend.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"), col("spend"), col("rnk"))
  }

  def customerLtv(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("ltv"),
        count(lit(1)).as("n_orders"),
        (floor(round(sum(col("o_totalprice")), 2) / count(lit(1)) * 1e4) / 1e4).as("avg_basket"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_order_day"))

  /** Tumbling-window aggregation — the batch twin of the streaming windowed
    * agg (`stream_windowed_agg`); identical grouping semantics.
    */
  def hourlyAgg(ev: DataFrame): DataFrame =
    ev.groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))

  def eventsHourly(s: SparkSession, d: String): DataFrame =
    hourlyAgg(Tables.events(s, d))

  def eventsJsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (floor(sum(col("k")).cast("double") / count(lit(1)) * 1e4) / 1e4).as("avg_k"),
        max(col("k")).as("max_k"))

  /** Gap-based sessionization (30-min inactivity): lag → new-session flag →
    * running sum = session id. One shuffle by user; window partitions are
    * per-user so they stay small at any scale.
    */
  def eventsSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, lit(1))
          .otherwise(lit(0)))
      .withColumn("session_seq", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
  }

  /** Cohort retention: day-0 cohort per user → distinct active users per
    * (cohort_day, day_offset).
    */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(first, "user_id")
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_local_supplier" -> q5LocalSupplier,
    "daily_revenue" -> dailyRevenue,
    "status_funnel" -> statusFunnel,
    "category_revenue" -> categoryRevenue,
    "top_customers" -> topCustomers,
    "customer_ltv" -> customerLtv,
    "events_hourly" -> eventsHourly,
    "events_json_props" -> eventsJsonProps,
    "events_sessionize" -> eventsSessionize,
    "events_retention" -> eventsRetention,
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | floor(round(sum(l_quantity),2)/count(*)*1e4)/1e4 AS avg_qty,
        | floor(round(sum(l_extendedprice),2)/count(*)*1e4)/1e4 AS avg_price,
        | floor(round(sum(l_discount),4)/count(*)*1e6)/1e6 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | strftime(o_orderdate,'%Y-%m-%d') AS o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "daily_revenue" ->
      """SELECT strftime(o_orderdate,'%Y-%m-%d') AS order_day,
        | round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,
    "status_funnel" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS revenue,
        | floor(round(sum(o_totalprice),2)/count(*)*1e4)/1e4 AS avg_order_value
        |FROM orders GROUP BY 1""".stripMargin,
    "category_revenue" ->
      """SELECT p_type, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | round(sum(l_quantity),2) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1""".stripMargin,
    "top_customers" ->
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice),2) AS spend
        |  FROM orders GROUP BY 1)
        |SELECT c_nationkey, c_custkey, c_name, spend, rnk FROM (
        |  SELECT c_nationkey, c_custkey, c_name, spend,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY spend DESC, c_custkey) AS rnk
        |  FROM spend JOIN customer ON o_custkey = c_custkey) t
        |WHERE rnk <= 3""".stripMargin,
    "customer_ltv" ->
      """SELECT o_custkey, round(sum(o_totalprice),2) AS ltv, count(*) AS n_orders,
        | floor(round(sum(o_totalprice),2)/count(*)*1e4)/1e4 AS avg_basket,
        | strftime(max(o_orderdate),'%Y-%m-%d') AS last_order_day
        |FROM orders GROUP BY 1""".stripMargin,
    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        | floor(CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS DOUBLE)/count(*)*1e4)/1e4 AS avg_k,
        | max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        | round(sum(value),2) AS session_value,
        | strftime(min(ts),'%Y-%m-%d %H:%M:%S') AS session_start
        |FROM sess GROUP BY user_id, session_seq""".stripMargin,
    "events_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT strftime(cohort_day,'%Y-%m-%d') AS cohort_day,
        | date_diff('day', cohort_day, day) AS day_offset,
        | count(DISTINCT ev.user_id) AS active_users
        |FROM ev JOIN first ON ev.user_id = first.user_id
        |GROUP BY first.cohort_day, day_offset""".stripMargin,
  )
}
