package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * Plain parquet reads: Catalyst prunes columns and pushes filters into the
  * scan, so loaders deliberately do NOT pre-select columns — each query's
  * projection reaches the reader on its own (verified in PlanSpec).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `ts` is parquet TIMESTAMP(NANOS) — read as Long nanos (see
    * GraftSession's nanosAsLong) and floor-converted to micros, matching
    * DuckDB's nanosecond semantics at every whole-second/micro boundary.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      // integer `div`, not floor(ts/1000.0): a double's ulp at 2026-epoch
      // nanos is 256 ns, so float division can floor to the wrong microsecond
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // NTZ sources (e.g. the ScaleUp'd dirs) normalize to session-UTC
      // TimestampType so unix_micros()/epoch arithmetic downstream resolves
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw.withColumn("ts", col("ts"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
