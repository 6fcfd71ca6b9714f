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

  /** Unrolled fixed-dim variants: the HOF `aggregate` lambda falls out of
    * whole-stage codegen, so on hot pairwise paths we unroll the fold into
    * plain arithmetic (same left-to-right order → bit-identical result;
    * the 0.0 seed only affects a ±0.0 sign, which compares equal).
    */
  def dotU(a: Column, b: Column, dim: Int = 64): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduceLeft(_ + _)

  def norm2U(a: Column, dim: Int = 64): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(a, i)).reduceLeft(_ + _)

  def cosineU(a: Column, b: Column, dim: Int = 64): Column =
    dotU(a, b, dim) / sqrt(norm2U(a, dim) * norm2U(b, dim))

  /** SQL twins (DuckDB): explicit sequential fold to match `aggregate`. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (acc, x) -> acc + x)"
  def norm2Sql(a: String): String =
    s"list_reduce(list_prepend(0.0, list_transform($a, x -> x*x)), (acc, x) -> acc + x)"
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${norm2Sql(a)} * ${norm2Sql(b)}))"
}
