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

  test("text_ndcg_eval matches a driver-side NDCG over the verified ranking") {
    val out = Search.textNdcgEval(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ranked = Search.textBm25(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val w = (1 to Search.Bm25TopK).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    for ((qid, terms) <- Search.Bm25Queries) {
      def rel(id: Long): Long = {
        val toks = docs.find(_._1 == id).get._2.toSet
        terms.count(toks.contains).toLong
      }
      val dcg = ranked(qid).zipWithIndex
        .map { case (id, i) => rel(id) * w(i) }.sum
      // ideal: every doc's graded relevance, best-first with id tiebreak
      val rels = docs.map { case (id, toks) =>
        (id, terms.count(toks.toSet.contains).toLong) }
        .filter(_._2 > 0)
      val idcg = rels.sortBy { case (id, r) => (-r, id) }
        .take(Search.Bm25TopK).zipWithIndex
        .map { case ((_, r), i) => r * w(i) }.sum
      val ndcg = if (idcg > 0) dcg * 1000000L / idcg else 0L
      assert(out(qid) == ((dcg, idcg, ndcg)), s"query $qid")
      // a top-k of a graded list can never beat the ideal ordering
      assert(dcg <= idcg && ndcg <= 1000000L)
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

  /** One consuming-replace pass at token level: LTR scan; a match at j
    * merges (j, j+1) and resumes at j+3 — the occurrence at j+2 lost its
    * leading boundary space to the match, exactly what a string
    * `replace(" a b ", " ab ")` does. Two passes = the operator's stated
    * merge semantics (pinned ≡ the real string replace in the property
    * test below).
    */
  private def mergePass(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var j = 0
    while (j < syms.size) {
      if (j + 1 < syms.size && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 3
        if (j - 1 < syms.size) out += syms(j - 1)
      } else { out += syms(j); j += 1 }
    }
    out.toList
  }

  /** Reference BPE trainer: weighted adjacent-pair counts over token
    * lists, (cnt desc, pair asc) argmax, two-pass consuming merge.
    */
  private def bruteBpe(vocab0: Map[List[String], Long], k: Int): Seq[(Int, String, Long)] = {
    var vocab = vocab0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (r <- 1 to k) {
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      for ((syms, wc) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.size >= 2) {
        val p = s"$a $b"
        counts(p) = counts.getOrElse(p, 0L) + wc
      }
      if (counts.nonEmpty) {
        val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        val Array(a, b) = pair.split(" ")
        out += ((r, pair, cnt))
        vocab = vocab.toSeq
          .map { case (syms, wc) => mergePass(mergePass(syms, a, b), a, b) -> wc }
          .groupBy(_._1).map { case (s2, g) => s2 -> g.map(_._2).sum }
      }
    }
    out.toSeq
  }

  test("token-level two-pass merge ≡ the string two-pass replace (incl. identical-symbol runs)") {
    val rnd = new scala.util.Random(7)
    val alpha = Seq("a", "b", "ab", "x")
    for (_ <- 1 to 500) {
      val syms = List.fill(1 + rnd.nextInt(9))(alpha(rnd.nextInt(alpha.size)))
      val (a, b) = (alpha(rnd.nextInt(2)), alpha(rnd.nextInt(2)))
      val seq = syms.mkString(" ", " ", " ")
      val (from, to) = (s" $a $b ", s" ${a + b} ")
      val viaString = seq.replace(from, to).replace(from, to)
      val viaTokens = mergePass(mergePass(syms, a, b), a, b).mkString(" ", " ", " ")
      assert(viaString == viaTokens, s"syms=$syms pair=($a,$b)")
    }
  }

  test("text_bpe_train matches driver-side brute-force BPE merge training") {
    val out = Search.textBpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)
    val vocab = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, c) => w.toList.map(_.toString) -> c }
    assert(out == bruteBpe(vocab, Search.BpeMerges))
  }

  test("text_bpe_tokenize matches brute-force trained segmentation per source") {
    val out = Search.textBpeTokenize(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val vocab = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, c) => w.toList.map(_.toString) -> c }
    val merges = bruteBpe(vocab, Search.BpeMerges)
    val nTok = vocab.keys.map { syms0 =>
      var syms = syms0
      for ((_, pair, _) <- merges) {
        val Array(a, b) = pair.split(" ")
        syms = mergePass(mergePass(syms, a, b), a, b)
      }
      syms0.mkString -> syms.size.toLong
    }.toMap
    val srcOf = {
      import org.apache.spark.sql.functions.col
      Tables.documents(spark, sf).select(col("doc_id"), col("source")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val expect = docs.flatMap { case (id, toks) => toks.map(w => (srcOf(id), w)) }
      .groupBy(_._1).map { case (src, ws) =>
        val nw = ws.size.toLong
        val nt = ws.map(w => nTok(w._2)).sum
        val nc = ws.map(_._2.length.toLong).sum
        src -> ((nw, nt, nc, nt * 1000000L / nw, nc * 1000000L / nt))
      }
    for ((src, e) <- expect) assert(out(src) == e, s"source $src")
  }

  test("text_ngram_novelty matches driver-side first-occurrence counting") {
    val out = Search.textNgramNovelty(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val srcOf = {
      import org.apache.spark.sql.functions.col
      Tables.documents(spark, sf).select(col("doc_id"), col("source")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val perDoc = docs.filter(_._2.length >= Search.NovN).map { case (id, toks) =>
      id -> toks.sliding(Search.NovN).map(_.mkString(" ")).toSet
    }
    val firstDoc = new scala.collection.mutable.HashMap[String, Long]()
    for ((id, gs) <- perDoc; g <- gs)
      firstDoc(g) = math.min(firstDoc.getOrElse(g, Long.MaxValue), id)
    val expect = perDoc.flatMap { case (id, gs) => gs.map(g => (srcOf(id), id, g)) }
      .groupBy(_._1).map { case (src, rows) =>
        val n = rows.size.toLong
        val nov = rows.count { case (_, id, g) => firstDoc(g) == id }.toLong
        (src, n, nov, nov * 1000000L / n)
      }.toSeq
    assert(out.sortBy(_._1) == expect.sortBy(_._1))
  }

  test("bm25 query terms all resolve to positive idf (terms exist in corpus)") {
    // guards the benchmark-query choice: a zero-df term would make the
    // literal-idf stats degenerate (ln(2N+1)-ish) and the query vacuous
    for (t <- Search.Bm25Terms)
      assert(docs.exists(_._2.contains(t)), s"term '$t' absent from corpus")
  }

  test("text_keywords equals brute tf-idf top-3 with bit-length idf") {
    def bitLen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val nd = docs.size.toLong
    val df = docs.flatMap { case (id, ws) => ws.distinct.map(w => (w, id)) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.size.toLong }
    val want = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).toSeq
        .map { case (w, g) =>
          val score = (bitLen(nd) - bitLen(df(w))).toLong * 100L * g.size
          (w, g.size.toLong, score)
        }
        .sortBy { case (w, _, score) => (-score, w) }
        .take(Search.KeywordsK).zipWithIndex
        .map { case ((w, tf, sc), i) => (id, w, tf, sc, i + 1) }
    }.toSet
    val got = Search.textKeywords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got == want)
    assert(got.map(_._2).size > Search.KeywordsK,
      "keywords degenerate: every doc picked the same terms")
  }

  test("text_colloc_dice equals brute bigram Dice top-50") {
    val uni = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val cab = docs.flatMap { case (_, ws) => ws.iterator.zip(ws.iterator.drop(1)) }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= Search.CollocMinSupport)
    val want = cab.toSeq.map { case ((w1, w2), c) =>
      val dice = (BigInt(2) * c * 1000000 / (uni(w1) + uni(w2))).toLong
      (w1, w2, c, uni(w1), uni(w2), dice)
    }.sortBy { case (w1, w2, _, _, _, dice) => (-dice, w1, w2) }
      .take(Search.CollocTopK).toSet
    val got = Search.textCollocDice(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.size >= 10, s"collocation mining degenerate: ${got.size} pairs")
  }
}
