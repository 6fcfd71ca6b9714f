package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native 60-bit payload pHash fingerprint over a `binary` column — the
  * whole per-document half of `mm_phash_neardup` in ONE pass per payload.
  *
  * Semantics are EXACTLY the declarative pipeline it replaces (r15, the
  * sf10 `weak` fix — the pipeline survives verbatim in the oracle SQL and
  * the MultimodalSpec parity pin): distinct rolling 8-byte grams
  * (payloads shorter than 8 bytes contribute themselves as the one gram),
  * h(gram) = first 15 hex chars of md5 (= top 60 bits of the digest, the
  * PortableHash.hexH convention), bit i of the fingerprint set iff the
  * majority of distinct grams have bit i of h set (Σ±1 > 0, i.e.
  * 2·ones > n).
  *
  * Why native: the declarative form materializes one ~8-byte substring
  * row per PAYLOAD BYTE (an ~8× byte amplification through array_distinct
  * + explode) and then updates 60 aggregate columns per gram row — the
  * same explode-amplification ByteHistogram killed for mm_payload_entropy.
  * Here the gram set is deduped by SORTING the packed-long grams (8-byte
  * grams pack into one long, so byte-equality IS long-equality — no
  * hashing, no boxing), md5 runs once per UNIQUE gram on a thread-local
  * digest, and the 60 majority counters live in one stack array. No array
  * materialization, no explode, no wide aggregate, no shuffle: the
  * fingerprint frame goes from (Σ|payload| exploded rows → 61-column agg)
  * to a map-side scalar inside whole-stage codegen. The md5-per-unique-
  * gram work is the floor — it is the fingerprint's definition.
  */
case class PhashSimhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash_simhash"

  override protected def nullSafeEval(input: Any): Any =
    PhashSimhash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.PhashSimhash.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): PhashSimhash =
    copy(child = newChild)
}

object PhashSimhash {
  def apply(c: Column): Column =
    GraftSqlBridge.column(PhashSimhash(GraftSqlBridge.expression(c)))

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(gram) — bit-identical to
    * `conv(substring(md5(gram), 1, 15), 16, 10)`: hex chars 1..14 are
    * digest bytes 0..6, char 15 is the high nibble of byte 7.
    */
  private def h60(md: MessageDigest, gram: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(gram, off, len)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(bytes: Array[Byte]): Long = {
    val md = digest.get()
    val ones = new Array[Int](60)
    var n = 0L
    if (bytes.length <= 8) {
      // the whole payload is the single gram (the substr(i, 8) clamp of
      // the declarative form) — nothing to dedupe
      val h = h60(md, bytes, 0, bytes.length)
      var i = 0
      while (i < 60) { ones(i) += ((h >>> i) & 1L).toInt; i += 1 }
      n = 1L
    } else {
      // pack each 8-byte gram into one big-endian long: byte-equality of
      // grams IS equality of the packed longs, so sort + skip-adjacent is
      // an exact distinct with zero allocation beyond the gram array
      val m = bytes.length - 7
      val packed = new Array[Long](m)
      var acc = 0L
      var i = 0
      while (i < 8) { acc = (acc << 8) | (bytes(i) & 0xffL); i += 1 }
      packed(0) = acc
      i = 8
      while (i < bytes.length) {
        acc = (acc << 8) | (bytes(i) & 0xffL)
        packed(i - 7) = acc
        i += 1
      }
      java.util.Arrays.sort(packed)
      val gram = new Array[Byte](8)
      var j = 0
      while (j < m) {
        if (j == 0 || packed(j) != packed(j - 1)) {
          val p = packed(j)
          var k = 0
          while (k < 8) { gram(k) = (p >>> (56 - 8 * k)).toByte; k += 1 }
          val h = h60(md, gram, 0, 8)
          var b = 0
          while (b < 60) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
          n += 1L
        }
        j += 1
      }
    }
    // majority vote: Σ±1 > 0  ⟺  2·ones > n
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (2L * ones(b) > n) sim |= (1L << b)
      b += 1
    }
    sim
  }
}
