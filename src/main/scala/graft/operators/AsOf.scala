package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (backward) join — for each left row, the latest right row with
  * right_ts ≤ left_ts on the same key. Spark has no native operator; rung
  * (a) of the custom-op ladder composes it from union + a per-key
  * carry-forward window:
  *
  *   tag rows (right=0, left=1) → union → window per key ordered by
  *   (ts, tag) → last(payload, ignoreNulls) carries the most recent right
  *   payload into each left row (tag order makes ties resolve as ≤).
  *
  * Scale: one hash shuffle by key + per-key sort — the same cost as the
  * sort-merge join an engine with a native as-of operator would run; no
  * range cross-product is ever materialized. Skewed keys split under AQE.
  *
  * The DuckDB oracle uses its native ASOF JOIN, so the two implementations
  * are structurally independent — a real cross-check of semantics.
  */
object AsOf {

  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l2 = left.withColumn("_ts", col(leftTs).cast("timestamp")).withColumn("_tag", lit(1))
    val r2 = right.select((col(key) +: col(rightTs).cast("timestamp").as("_ts") +:
      payloadCols.map(col)): _*).withColumn("_tag", lit(0))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payloadCols.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
      .filter(col("_tag") === 1)
      .select((leftCols ++ payloadCols).map(col): _*)
  }

  /** Each event joined to the customer's latest order state as of the event
    * time (right side pre-aggregated to one row per (key, ts) so the as-of
    * pick is unique).
    */
  def eventsAsofOrders(s: SparkSession, d: String): DataFrame = {
    val right = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("rts"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_orderkey")).as("last_orderkey"))
    val left = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    asofBackward(left, right, "user_id", "ts", "rts", Seq("n_orders", "last_orderkey"))
      .select("event_id", "user_id", "n_orders", "last_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_orders" -> eventsAsofOrders,
  )

  val oracles: Map[String, String] = Map(
    "events_asof_orders" ->
      """WITH r AS (
        |  SELECT o_custkey AS user_id, o_orderdate AS rts,
        |         count(*) AS n_orders, max(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY 1, 2),
        |e AS (SELECT event_id, user_id, ts FROM events)
        |SELECT event_id, e.user_id, n_orders, last_orderkey
        |FROM e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.rts""".stripMargin,
  )
}
