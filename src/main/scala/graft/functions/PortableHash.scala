package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit string hash + affine hash family computable bit-identically in
  * Spark and DuckDB (the correctness oracle), built on md5 — both engines
  * produce the same hex digest, and 15 hex chars fit a signed 64-bit int.
  *
  * MinHash coefficients are drawn from a fixed-seed LCG at object init; the
  * SQL oracle embeds the same literals (see Dedup.oracles), so the two
  * engines share the exact hash family.
  */
object PortableHash {

  /** Modulus for the affine family: < 2^30 so (a*h + b) stays < 2^63. */
  val P = 1000000007L

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4

  /** 60-bit base hash: first 15 hex chars of md5. */
  def hexH(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Base hash reduced into the family's field. */
  def hmod(c: Column): Column = hexH(c) % P

  /** Fixed-seed LCG → (a, b) pairs, a ∈ [1, P), b ∈ [0, P). Pool sized for
    * the largest auto-tuned signature; the first NumHashes draws are the
    * default family (same stream prefix, so the fixed-config oracles are
    * byte-stable against pool growth).
    */
  val MaxHashes = 256
  val coefs: IndexedSeq[(Long, Long)] = {
    var x = 88172645463325252L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; math.floorMod(x, P) }
    (0 until MaxHashes).map(_ => (math.floorMod(next(), P - 1) + 1, next()))
  }

  /** h_i over an already-reduced hash column. */
  def affine(i: Int, h: Column): Column = {
    val (a, b) = coefs(i)
    (lit(a) * h + lit(b)) % lit(P)
  }

  /** SQL twin of hexH. */
  def hexHSql(e: String): String = s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** SQL twin of affine(i) over expression e (already mod P). */
  def affineSql(i: Int, e: String): String = {
    val (a, b) = coefs(i)
    s"(${a}*($e) + ${b}) % $P"
  }
}
