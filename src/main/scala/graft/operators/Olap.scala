package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_pivot" -> ordersPivot,
    "orders_rollup" -> ordersRollup,
    "orders_cube" -> ordersCube,
    "orders_grouping_sets" -> ordersGroupingSets,
    "order_value_quantiles" -> orderValueQuantiles,
  )

  val oracles: Map[String, String] = Map(
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
