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

  test("corpus_chunk equals brute window manifest") {
    import graft.operators.Sampling.{ChunkW, ChunkS}
    val want = docs.flatMap { case (id, _, text) =>
      val n = toks(text).size.toLong
      (0L until n by ChunkS.toLong).map { lo =>
        val hi = math.min(lo + ChunkW, n)
        (id, lo / ChunkS, lo, hi, hi - lo)
      }
    }.toSet
    val got = graft.operators.Sampling.corpusChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // overlap is live: some doc has >1 chunk and some tail chunk is short
    assert(got.exists(_._2 > 0) && got.exists(_._5 < ChunkW))
  }

  test("text_source_drift equals brute ppm chi-square over top vocab") {
    val allToks = docs.flatMap { case (_, src, text) => toks(text).map(src -> _) }
    val corpus = allToks.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val t = BigInt(allToks.size)
    val vocab = corpus.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextAudit.DriftVocab)
      .map { case (w, c) => w -> (BigInt(c) * 1000000 / t).toLong }
      .filter(_._2 > 0)
    val bySource = allToks.groupBy(_._1)
    val want = bySource.map { case (src, xs) =>
      val ns = BigInt(xs.size)
      val oc = xs.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
      val contribs = vocab.map { case (w, pExp) =>
        val pObs = (BigInt(oc.getOrElse(w, 0L)) * 1000000 / ns).toLong
        val dd = pObs - pExp
        dd * dd / pExp
      }
      (src, xs.size.toLong, vocab.size.toLong, contribs.sum)
    }.toSet
    val got = TextAudit.textSourceDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // drift scores must discriminate between sources on this corpus
    assert(want.map(_._4).size > 1, "all sources share one chi2 - vacuous")
  }
}
