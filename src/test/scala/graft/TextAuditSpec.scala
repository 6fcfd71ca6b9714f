package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAudit

/** Driver-side brute recomputation of the corpus-hygiene audits at
  * sf0.001 (exact integer statistics — BigInt truncated division matches
  * both engines' semantics).
  */
class TextAuditSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val docs: Array[(Long, String, String)] =
    Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
  private def toks(t: String) = norm(t).split(" ", -1).toVector

  test("text_utf8_audit equals brute char-class counting") {
    val got = TextAudit.textUtf8Audit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val bySource = docs.groupBy(_._2)
    assert(got.keySet == bySource.keySet)
    for ((src, rows) <- bySource) {
      val texts = rows.map(_._3)
      val chars = texts.map(_.length.toLong).sum
      val ascii = texts.map(_.count(c => c >= 0x20 && c <= 0x7e).toLong).sum
      val ctrl = texts.map(_.count(c => c <= 0x1f || c == 0x7f).toLong).sum
      val repl = texts.map(_.count(_ == '�').toLong).sum
      val nonAscii = texts.count(t => t.exists(c => c < 0x20 || c > 0x7e)).toLong
      val ppm = (BigInt(ascii) * 1000000 / chars).toLong
      assert(got(src) == ((rows.length.toLong, chars, ppm, ctrl, repl,
        nonAscii)), src)
    }
    // this corpus is clean ASCII — the flatline IS the expected audit
    assert(got.values.forall(v => v._3 == 1000000L && v._4 == 0L))
  }

  test("text_token_diversity equals brute TTR/Simpson means") {
    val got = TextAudit.textTokenDiversity(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val bySource = docs.groupBy(_._2)
    assert(got.keySet == bySource.keySet)
    for ((src, rows) <- bySource) {
      val per = rows.map { case (_, _, t) =>
        val cs = toks(t).groupBy(identity).map(_._2.size)
        val n = BigInt(cs.sum); val types = BigInt(cs.size)
        val sumc2 = cs.map(c => BigInt(c) * c).sum
        ((types * 1000000 / n), ((n * n - sumc2) * 1000000 / (n * n)))
      }
      val nd = per.length
      val ttr = (per.map(_._1).sum / nd).toLong
      val simp = (per.map(_._2).sum / nd).toLong
      assert(got(src) == ((nd.toLong, ttr, simp)), src)
    }
  }

  test("text_ngram_coverage equals brute top-K mass") {
    val n = TextAudit.CoverageGram
    val counts = docs.toVector.flatMap { case (_, _, t) =>
      val tk = toks(t)
      if (tk.length < n) Vector.empty
      else (0 to tk.length - n).map(i => tk.slice(i, i + n).mkString(" "))
    }.groupBy(identity).view.mapValues(_.size.toLong).toVector
    val total = counts.map(_._2).sum
    val ranked = counts.sortBy { case (g, c) => (-c, g) }
    val got = TextAudit.textNgramCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.keySet == TextAudit.CoverageKs.map(_.toLong).toSet)
    for (k <- TextAudit.CoverageKs) {
      val top = ranked.take(k)
      val mass = top.map(_._2).sum
      val ppm = (BigInt(mass) * 1000000 / total).toLong
      assert(got(k.toLong) == ((top.length.toLong, mass, total, ppm)), s"k=$k")
    }
    // coverage is monotone in k
    val cov = TextAudit.CoverageKs.map(k => got(k.toLong)._4)
    assert(cov == cov.sorted)
  }
}
