package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

/** text_bm25 / text_bpe_pairs vs independent driver-side brute force: the
  * spec re-derives the full ranking (tokenize → tf/df → idf → quantized
  * per-term contributions → integer doc scores) in plain Scala collections
  * and demands the distributed result row-for-row — structural
  * independence from both the Spark plan and the SQL oracle.
  */
class SearchSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val docs: Seq[(Long, Array[String])] = {
    import org.apache.spark.sql.functions.col
    Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+"))
      .toSeq
  }

  test("text_bm25 matches a driver-side brute-force BM25 on every query") {
    val out = Search.textBm25(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    val n = docs.size
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = Search.Bm25Terms.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    val idf = Search.Bm25Terms.map(t =>
      t -> math.log((n.toDouble - df(t) + 0.5) / (df(t) + 0.5) + 1.0)).toMap
    for ((qid, terms) <- Search.Bm25Queries) {
      val scores = docs.flatMap { case (id, toks) =>
        val dl = toks.length.toDouble
        val s = terms.map { t =>
          val tf = toks.count(_ == t).toDouble
          if (tf == 0) 0L
          else math.floor(idf(t) * ((tf * 2.2) /
            (tf + Search.Bm25K1 * (0.25 + Search.Bm25B * (dl / avgdl)))) * 1e6).toLong
        }.sum
        if (s == 0 && !terms.exists(toks.contains)) None else Some((id, s))
      }
      val expect = scores.sortBy { case (id, s) => (-s, id) }
        .take(Search.Bm25TopK).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, s) }
      assert(out(qid) == expect, s"query $qid")
    }
  }

  test("text_bpe_pairs matches driver-side pair counting") {
    val out = Search.textBpePairs(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    for ((_, toks) <- docs; w <- toks; if w.length >= 2;
         i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      counts(p) = counts.getOrElse(p, 0L) + 1L
    }
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(Search.BpeTopPairs).zipWithIndex
      .map { case ((p, c), i) => (i + 1, p, c) }
    assert(out.sortBy(_._1) == expect)
  }

  test("bm25 query terms all resolve to positive idf (terms exist in corpus)") {
    // guards the benchmark-query choice: a zero-df term would make the
    // literal-idf stats degenerate (ln(2N+1)-ish) and the query vacuous
    for (t <- Search.Bm25Terms)
      assert(docs.exists(_._2.contains(t)), s"term '$t' absent from corpus")
  }
}
