package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Deterministic Debezium-style changelog synthesized from the `orders`
  * table, standing in for the reference's Postgres→Debezium→Kafka feed
  * (data-generator/main.py drives inserts/updates; register-postgres.json
  * captures them). Rules (pure functions of the row, so the DuckDB oracle can
  * state the expected output exactly):
  *
  *   - every order       → op 'c' at ts0 = epoch_ms(o_orderdate), status NEW
  *   - o_orderstatus≠'O' → op 'u' at ts0 + 1 day, status = o_orderstatus
  *   - o_orderkey%10==0  → op 'd' at ts0 + 2 days, before = last known row
  *
  * The events are emitted as real envelope JSON text (`value` column) and
  * must round-trip through Envelope.parse.
  */
object CdcSim {

  /** Payload schema of the simulated `orders` CDC topic. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("custkey", LongType),
    StructField("price", DoubleType),
    StructField("status", StringType)))

  val DAY_MS = 86400000L

  /** One `value: String` column of envelope JSON, plus a stable `event_id`
    * for redelivery simulation.
    */
  def ordersChangelog(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey").as("id"),
      col("o_custkey").as("custkey"),
      col("o_totalprice").as("price"),
      col("o_orderstatus").as("st"),
      // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so this cast matches
      // DuckDB's epoch_ms on the same naive value.
      unix_millis(col("o_orderdate").cast("timestamp")).as("ts0"))

    def payload(status: org.apache.spark.sql.Column) =
      struct(col("id"), col("custkey"), col("price"), status.as("status"))

    val creates = base.select(
      to_json(struct(
        payload(lit("NEW")).as("after"),
        lit("c").as("op"), col("ts0").as("ts_ms"))).as("value"),
      col("id").as("key"), col("ts0").as("ts_ms"))

    val updates = base.filter(col("st") =!= "O").select(
      to_json(struct(
        payload(col("st")).as("after"),
        lit("u").as("op"), (col("ts0") + DAY_MS).as("ts_ms"))).as("value"),
      col("id").as("key"), (col("ts0") + DAY_MS).as("ts_ms"))

    val lastStatus = when(col("st") =!= "O", col("st")).otherwise(lit("NEW"))
    val deletes = base.filter(col("id") % 10 === 0).select(
      to_json(struct(
        payload(lastStatus).as("before"),
        lit("d").as("op"), (col("ts0") + 2 * DAY_MS).as("ts_ms"))).as("value"),
      col("id").as("key"), (col("ts0") + 2 * DAY_MS).as("ts_ms"))

    creates.unionByName(updates).unionByName(deletes)
  }

  /** The changelog parsed through the real envelope path. */
  def parsedChangelog(s: SparkSession, d: String): DataFrame =
    Envelope.parse(ordersChangelog(s, d), payloadSchema)

  /** Shared DuckDB CTE prelude defining the same three event sets. */
  val oracleCtes: String =
    """WITH base AS (
      |  SELECT o_orderkey AS id, o_custkey AS custkey, o_totalprice AS price,
      |         o_orderstatus AS st, epoch_ms(o_orderdate) AS ts0
      |  FROM orders),
      |c AS (SELECT 'c' AS op, id, custkey, price, 'NEW' AS status, ts0 AS ts_ms, 1 AS sign FROM base),
      |u AS (SELECT 'u', id, custkey, price, st, ts0 + 86400000, 1 FROM base WHERE st <> 'O'),
      |d AS (SELECT 'd', id, custkey, price,
      |        CASE WHEN st <> 'O' THEN st ELSE 'NEW' END, ts0 + 172800000, -1
      |      FROM base WHERE id % 10 = 0),
      |ev AS (SELECT * FROM c UNION ALL SELECT * FROM u UNION ALL SELECT * FROM d)""".stripMargin
}
