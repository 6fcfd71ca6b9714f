package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns as higher-order functions —
  * codegen'd, no UDFs, and sequential left-to-right folds so the DuckDB
  * oracle (list_reduce) produces bit-identical doubles.
  */
object VectorFunctions {

  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** SQL twins (DuckDB): explicit sequential fold to match `aggregate`. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (acc, x) -> acc + x)"
  def norm2Sql(a: String): String =
    s"list_reduce(list_prepend(0.0, list_transform($a, x -> x*x)), (acc, x) -> acc + x)"
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${norm2Sql(a)} * ${norm2Sql(b)}))"
}
