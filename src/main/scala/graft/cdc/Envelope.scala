package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium change-event envelope: `{before, after, op, ts_ms}`.
  *
  * `before`/`after` arrive as nested JSON objects; like the reference
  * (spark-jobs/cdc_processor.py:50-55) we first parse the outer envelope with
  * string-typed `before`/`after` (Spark hands back the raw JSON text for a
  * StringType field), route by `op`, then parse the chosen payload with the
  * table schema — two codegen'd `from_json` calls, no UDFs.
  */
object Envelope {

  /** Outer envelope schema (cdc_processor.py:50-55). */
  val schema: StructType = StructType(Seq(
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** op='d' → payload from `before`, else `after` (cdc_processor.py:84-88). */
  def routedPayload: Column =
    when(col("op") === "d", col("before")).otherwise(col("after"))

  /** sign: −1 delete, +1 otherwise (cdc_processor.py:90-93). */
  def sign: Column = when(col("op") === "d", lit(-1)).otherwise(lit(1))

  /** Parse a DataFrame with a JSON envelope column into flattened change
    * rows: payload columns + `op`, `ts_ms`, `sign`.
    */
  def parse(df: DataFrame, payloadSchema: StructType, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol).cast("string"), schema).alias("data"))
      .select(col("data.*"))
      .withColumn("payload", from_json(routedPayload, payloadSchema))
      .withColumn("sign", sign)
      .select((payloadSchema.fieldNames.map(f => col(s"payload.$f")) ++
        Seq(col("op"), col("ts_ms"), col("sign"))): _*)
}
