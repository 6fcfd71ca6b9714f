package graft.streaming

import org.apache.spark.sql.types._

/** Warehouse-engine SQL dialect for the CDC sink: identifier quoting, type
  * names, and the DDL for a signed-versioned CDC table and its batch
  * ledger.
  *
  * Two members cover the repo's surfaces: [[AnsiDialect]] is the executable
  * path (embedded Derby in JdbcSinkSpec; any ANSI warehouse), and
  * [[ClickHouseDialect]] emits the reference's ACTUAL sink family —
  * `ReplacingMergeTree(ts_ms, sign) ORDER BY key` per init-clickhouse.sql:
  * 11-19 — so a user pointing the pipeline at ClickHouse gets the same
  * tables the reference provisions by hand. The ClickHouse server itself is
  * not in this environment; its dialect is pinned by unit test against the
  * reference DDL (SinkDialectSpec), the Derby path stays the executable
  * parity check.
  */
sealed trait SinkDialect {

  /** Engine identifier quote (backticks for ClickHouse, ANSI double quotes
    * otherwise) — DDL built before any connection exists quotes with this;
    * at runtime JdbcSink re-derives the quote from connection metadata.
    */
  def quote(id: String): String

  /** Engine type name for a Spark column type. */
  def typeName(dt: DataType): String

  /** A column declaration; engines with explicit nullability wrappers
    * (ClickHouse `Nullable(T)`) encode it here.
    */
  def columnDdl(f: StructField): String

  /** CREATE TABLE for a flattened signed changelog (payload columns +
    * version + sign) keyed by `keyCols` — the Envelope.parse output shape.
    */
  def cdcTableDdl(table: String, payload: StructType, keyCols: Seq[String],
      versionCol: String = "ts_ms", signCol: String = "sign"): String

  /** CREATE TABLE for the batch-id ledger. */
  def ledgerDdl(ledger: String): String

  /** Fragment for Spark's JDBC writer `createTableOptions` so a
    * writer-created table lands on the right engine; empty when the
    * engine needs none.
    */
  def createTableOptions(keyCols: Seq[String],
      versionCol: String = "ts_ms", signCol: String = "sign"): String
}

object SinkDialect {
  /** Dialect by JDBC url scheme. */
  def forUrl(url: String): SinkDialect =
    if (url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:"))
      ClickHouseDialect
    else AnsiDialect
}

/** ANSI / Derby / Postgres-family: plain typed columns, double-quoted
  * identifiers, a PRIMARY KEY on the ledger.
  */
object AnsiDialect extends SinkDialect {
  def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  def typeName(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(4000)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(s"no ANSI sink mapping for $other")
  }

  def columnDdl(f: StructField): String =
    s"${quote(f.name)} ${typeName(f.dataType)}${if (f.nullable) "" else " NOT NULL"}"

  def cdcTableDdl(table: String, payload: StructType, keyCols: Seq[String],
      versionCol: String, signCol: String): String = {
    val cols = payload.fields.map(columnDdl) ++ Seq(
      s"${quote(versionCol)} BIGINT NOT NULL",
      s"${quote(signCol)} SMALLINT NOT NULL")
    s"CREATE TABLE $table (${cols.mkString(", ")})"
  }

  def ledgerDdl(ledger: String): String =
    s"CREATE TABLE $ledger (batch_id BIGINT PRIMARY KEY)"

  def createTableOptions(keyCols: Seq[String],
      versionCol: String, signCol: String): String = ""
}

/** ClickHouse: backquoted identifiers, `Nullable(T)` wrappers, and the
  * reference's exact engine clause — `ReplacingMergeTree(ts_ms, sign)
  * ORDER BY key` (init-clickhouse.sql:18-19), version column as UInt64
  * (init-clickhouse.sql:16). Key columns are never Nullable: they are the
  * ORDER BY / dedup key.
  */
object ClickHouseDialect extends SinkDialect {
  def quote(id: String): String = "`" + id.replace("`", "``") + "`"

  def typeName(dt: DataType): String = dt match {
    case LongType => "Int64"
    case IntegerType => "Int32"
    case ShortType => "Int16"
    case ByteType => "Int8"
    case DoubleType => "Float64"
    case FloatType => "Float32"
    case BooleanType => "Bool"
    case StringType => "String"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case TimestampType | TimestampNTZType => "DateTime64(3)"
    case DateType => "Date32"
    case BinaryType => "String"
    case other => throw new IllegalArgumentException(s"no ClickHouse sink mapping for $other")
  }

  def columnDdl(f: StructField): String = {
    val t = typeName(f.dataType)
    s"${quote(f.name)} ${if (f.nullable) s"Nullable($t)" else t}"
  }

  def cdcTableDdl(table: String, payload: StructType, keyCols: Seq[String],
      versionCol: String, signCol: String): String = {
    // keys must not be Nullable (ORDER BY / ReplacingMergeTree dedup key)
    val cols = payload.fields.map { f =>
      if (keyCols.contains(f.name)) columnDdl(f.copy(nullable = false))
      else columnDdl(f)
    } ++ Seq(
      s"${quote(versionCol)} UInt64",
      s"${quote(signCol)} Int8")
    s"""CREATE TABLE IF NOT EXISTS $table (${cols.mkString(", ")})
       |${createTableOptions(keyCols, versionCol, signCol)}""".stripMargin
  }

  def ledgerDdl(ledger: String): String =
    s"CREATE TABLE IF NOT EXISTS $ledger (batch_id Int64) ENGINE = MergeTree ORDER BY batch_id"

  def createTableOptions(keyCols: Seq[String],
      versionCol: String, signCol: String): String =
    s"ENGINE = ReplacingMergeTree(${quote(versionCol)}, ${quote(signCol)}) " +
      s"ORDER BY (${keyCols.map(quote).mkString(", ")})"
}
