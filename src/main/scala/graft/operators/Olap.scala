package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** OLAP shapes the ClickHouse mart serves in the reference: pivots, rollup
  * hierarchies, exact quantiles. All single-shuffle aggregations with
  * map-side partials; pivot uses an explicit value list so the output
  * schema is static (a pivot over unknown values needs a pre-pass at any
  * scale — avoided by contract here).
  */
object Olap {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private def pcol(p: String) = p.take(1) match {
    case "1" => "urgent"; case "2" => "high"; case "3" => "medium"
    case "4" => "unspecified"; case _ => "low"
  }

  /** Order counts pivoted to one column per priority. */
  def ordersPivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot(col("o_orderpriority"), priorities)
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +:
        priorities.map(p => coalesce(col(s"`$p`"), lit(0L)).as(pcol(p))): _*)

  /** Status × priority rollup with subtotals; null grouping levels coalesce
    * to 'ALL' so the hierarchy is explicit and hash-stable.
    */
  def ordersRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))

  /** Full CUBE over status × priority — all four grouping combinations,
    * 'ALL'-coalesced like the rollup. One shuffle; the Expand multiplies
    * rows ×4 before the partial agg, the standard cube plan.
    */
  def ordersCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))

  /** Explicit GROUPING SETS — the two one-dimension margins plus the grand
    * total, WITHOUT the cross cells a cube would add; `grouping_id`
    * disambiguates a genuine NULL group value from an aggregated-out level
    * (same bitmask convention in both engines: first column = MSB). Same
    * single-shuffle Expand plan as rollup/cube.
    */
  def ordersGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n_orders"), col("revenue"))

  /** Exact interpolated quantiles of order value per status (the engines
    * share the (1−d)·a + d·b rule; floor-rounded to absorb last-ulp drift).
    */
  def orderValueQuantiles(s: SparkSession, d: String): DataFrame = {
    def q(p: Double, name: String): Column =
      (floor(expr(s"percentile(o_totalprice, $p)") * 1e4) / 1e4).as(name)
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(q(0.5, "p50"), q(0.9, "p90"), q(0.99, "p99"))
  }

  /** Open-order backlog over time — the interval-overlap OLAP pattern
    * (how many orders are in flight on each day?) solved the only way
    * that scales: ±1 DELTAS on a bounded calendar, never a per-day
    * point-in-interval join. An order opens at o_orderdate and closes at
    * its last line's l_shipdate; daily opened/closed counts collapse
    * map-side, and the backlog is one running sum over the calendar frame
    * (|days| rows — a corpus statistic, not corpus-sized; the global
    * single-partition window is on that bounded frame only). The close day
    * clamps to the open day (this testdata's ship dates are uncorrelated
    * with order dates — an order cannot close before it opens).
    */
  def ordersBacklog(s: SparkSession, d: String): DataFrame = {
    val opened = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day")).agg(count(lit(1)).as("opened"))
    val closed = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(max(to_date(col("l_shipdate"))).as("sd"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(greatest(col("sd"), col("od")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("closed"))
    val days = opened.select(col("day")).union(closed.select(col("day"))).distinct()
    val g = days
      .join(opened, Seq("day"), "left_outer")
      .join(closed, Seq("day"), "left_outer")
      .select(col("day"), coalesce(col("opened"), lit(0L)).as("opened"),
        coalesce(col("closed"), lit(0L)).as("closed"))
    g.withColumn("backlog",
        sum(col("opened") - col("closed")).over(Window.orderBy(col("day"))))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("opened"), col("closed"), col("backlog"))
  }

  /** Skyline (Pareto-frontier) query over part — minimize p_retailprice,
    * maximize p_size: a part survives iff no other part is at least as
    * good on both axes and strictly better on one. The classic dominance
    * operator, solved WITHOUT the quadratic NOT-EXISTS self-join: because
    * one axis (p_size) is a bounded alphabet, dominance factors through
    * the per-size price minima — p is dominated ⟺ some strictly-larger
    * size has min-price ≤ p's price, OR p's own size has a strictly
    * cheaper part. Both tests come from ONE map-side-partial agg to the
    * |sizes|-row frame plus a running min over it (ordered size-desc),
    * broadcast-joined back to part. Equal (size, price) ties all survive
    * (no strict axis). OlapSpec pins this decomposition ≡ the brute
    * pairwise-dominance definition.
    */
  def partSkyline(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    val mn = p.groupBy(col("p_size")).agg(min(col("p_retailprice")).as("mn"))
    val w = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sz = mn.withColumn("mgt", min(col("mn")).over(w)) // bounded |sizes| frame
    p.join(broadcast(sz), "p_size")
      .filter(col("p_retailprice") === col("mn") &&
        (col("mgt").isNull || col("mgt") > col("p_retailprice")))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
  }

  private val skylineOracle: String =
    """WITH mn AS (SELECT p_size, min(p_retailprice) AS mn FROM part GROUP BY 1),
      |sz AS (SELECT p_size, mn, min(mn) OVER (ORDER BY p_size DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mgt FROM mn)
      |SELECT p.p_partkey, p.p_size, p.p_retailprice
      |FROM part p JOIN sz USING (p_size)
      |WHERE p.p_retailprice = sz.mn
      |  AND (sz.mgt IS NULL OR sz.mgt > p.p_retailprice)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "part_skyline" -> partSkyline,
    "orders_backlog" -> ordersBacklog,
    "orders_pivot" -> ordersPivot,
    "orders_rollup" -> ordersRollup,
    "orders_cube" -> ordersCube,
    "orders_grouping_sets" -> ordersGroupingSets,
    "order_value_quantiles" -> orderValueQuantiles,
  )

  val oracles: Map[String, String] = Map(
    "part_skyline" -> skylineOracle,
    "orders_backlog" ->
      """WITH op AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS opened
        |  FROM orders GROUP BY 1),
        |cl AS (SELECT day, count(*) AS closed FROM (
        |  SELECT greatest(s.sd, CAST(o.o_orderdate AS DATE)) AS day
        |  FROM (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS sd
        |    FROM lineitem GROUP BY 1) s
        |  JOIN orders o ON o.o_orderkey = s.l_orderkey) GROUP BY 1),
        |days AS (SELECT day FROM op UNION SELECT day FROM cl),
        |g AS (SELECT d.day, coalesce(op.opened, 0) AS opened,
        |    coalesce(cl.closed, 0) AS closed
        |  FROM days d LEFT JOIN op USING (day) LEFT JOIN cl USING (day))
        |SELECT strftime(day, '%Y-%m-%d') AS day, opened, closed,
        |  CAST(sum(opened - closed) OVER (ORDER BY day) AS BIGINT) AS backlog
        |FROM g""".stripMargin,
    "orders_pivot" ->
      """SELECT o_orderstatus,
        | count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        | count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
        | count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        | count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
        | count(*) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY 1""".stripMargin,
    "orders_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "orders_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "orders_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "order_value_quantiles" ->
      """SELECT o_orderstatus,
        | floor(quantile_cont(o_totalprice, 0.5)*1e4)/1e4 AS p50,
        | floor(quantile_cont(o_totalprice, 0.9)*1e4)/1e4 AS p90,
        | floor(quantile_cont(o_totalprice, 0.99)*1e4)/1e4 AS p99
        |FROM orders GROUP BY 1""".stripMargin,
  )
}
