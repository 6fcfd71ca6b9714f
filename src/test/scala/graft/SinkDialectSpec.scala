package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.streaming.{AnsiDialect, ClickHouseDialect, SinkDialect}

/** Pins the sink DDL dialects: the ClickHouse dialect must reproduce the
  * reference's hand-written provisioning (init-clickhouse.sql) from the
  * Spark-side payload schemas, and the ANSI dialect stays the executable
  * Derby path (JdbcSinkSpec actually runs it).
  */
class SinkDialectSpec extends AnyFunSuite {

  // the reference's customers payload (init-clickhouse.sql:11-19)
  val customers = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("address", StringType, nullable = true)))

  test("url routing picks the engine dialect") {
    assert(SinkDialect.forUrl("jdbc:clickhouse://ch:8123/cdc_data") === ClickHouseDialect)
    assert(SinkDialect.forUrl("jdbc:ch://ch:8123/cdc_data") === ClickHouseDialect)
    assert(SinkDialect.forUrl("jdbc:derby:/tmp/db;create=true") === AnsiDialect)
    assert(SinkDialect.forUrl("jdbc:postgresql://pg/warehouse") === AnsiDialect)
  }

  test("ClickHouse DDL reproduces the reference's ReplacingMergeTree tables") {
    val ddl = ClickHouseDialect.cdcTableDdl("cdc_data.customers", customers, Seq("id"))
    // init-clickhouse.sql:12-19, field for field
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS cdc_data.customers"))
    assert(ddl.contains("`id` Int64"), ddl)      // key: NOT Nullable-wrapped
    assert(!ddl.contains("Nullable(Int64)"), "ORDER BY key must not be Nullable")
    assert(ddl.contains("`name` Nullable(String)"), ddl)
    assert(ddl.contains("`ts_ms` UInt64"), ddl)  // init-clickhouse.sql:16
    assert(ddl.contains("`sign` Int8"), ddl)     // init-clickhouse.sql:17
    assert(ddl.contains("ENGINE = ReplacingMergeTree(`ts_ms`, `sign`)"), ddl)
    assert(ddl.contains("ORDER BY (`id`)"), ddl)
  }

  test("ClickHouse type map covers the reference's products/orders columns") {
    // price Nullable(Decimal(10, 2)) — init-clickhouse.sql:26
    assert(ClickHouseDialect.columnDdl(
      StructField("price", DecimalType(10, 2))) === "`price` Nullable(Decimal(10, 2))")
    // order_date DateTime — init-clickhouse.sql:36 (DateTime64(3) carries
    // the envelope's millisecond precision)
    assert(ClickHouseDialect.typeName(TimestampType) === "DateTime64(3)")
    // quantity Int32 — init-clickhouse.sql:49
    assert(ClickHouseDialect.typeName(IntegerType) === "Int32")
  }

  test("writer createTableOptions carries the engine clause only for ClickHouse") {
    assert(ClickHouseDialect.createTableOptions(Seq("id")) ===
      "ENGINE = ReplacingMergeTree(`ts_ms`, `sign`) ORDER BY (`id`)")
    assert(ClickHouseDialect.createTableOptions(Seq("order_id", "product_id")) ===
      "ENGINE = ReplacingMergeTree(`ts_ms`, `sign`) ORDER BY (`order_id`, `product_id`)")
    assert(AnsiDialect.createTableOptions(Seq("id")) === "")
  }

  test("ledger DDL is engine-appropriate") {
    assert(AnsiDialect.ledgerDdl("t_batches") ===
      "CREATE TABLE t_batches (batch_id BIGINT PRIMARY KEY)")
    val ch = ClickHouseDialect.ledgerDdl("t_batches")
    assert(ch.contains("ENGINE = MergeTree ORDER BY batch_id"), ch)
  }

  test("identifier quoting is engine-appropriate and escape-safe") {
    assert(ClickHouseDialect.quote("week`ird") === "`week``ird`")
    assert(AnsiDialect.quote("week\"ird") === "\"week\"\"ird\"")
  }

  test("ANSI DDL declares the signed-changelog shape Derby can execute") {
    val ddl = AnsiDialect.cdcTableDdl("customers", customers, Seq("id"))
    assert(ddl === "CREATE TABLE customers (\"id\" BIGINT, \"name\" VARCHAR(4000), " +
      "\"email\" VARCHAR(4000), \"address\" VARCHAR(4000), " +
      "\"ts_ms\" BIGINT NOT NULL, \"sign\" SMALLINT NOT NULL)")
  }
}
