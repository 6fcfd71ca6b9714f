package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PortableHash._
import graft.operators.Dedup

/** Dedup candidate-generation audits: the stop-band width cap must be a
  * dormant safety valve at test scale (no bucket near it), so the capped
  * query and the capped oracle state the same result set the uncapped
  * formulation would.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("no minhash band bucket approaches the width cap at test scale") {
    val postings = Dedup.shinglePostings(spark, sf)
      .select(col("doc_id"), col("n"), hexH(col("sh")).as("hp"))
    val m = Dedup.minhashSignatures(postings)
    val widths = m.select(col("doc_id"), explode(array((0 until Bands).map(k =>
        concat_ws(",", lit(k), slice(col("mh"), k * RowsPerBand + 1, RowsPerBand))): _*)).as("bucket"))
      .groupBy(col("bucket")).count()
    val maxW = widths.agg(max(col("count"))).collect()(0).getLong(0)
    info(s"max band width = $maxW (cap ${Dedup.MaxBandWidth})")
    assert(maxW < Dedup.MaxBandWidth / 2,
      "band buckets are wide enough that the stop-band cap would change results")
  }

  test("dedup_waste matches a driver-side duplicate-mass audit") {
    val out = Dedup.dedupWaste(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3).trim.toLowerCase.replaceAll("\\s+", " ")))
    val keep = docs.groupBy(_._4).view.mapValues(_.map(_._1).min).toMap
    val expect = docs.groupBy(_._2).map { case (src, rows) =>
      val dup = rows.filter(r => keep(r._4) != r._1)
      val chars = rows.map(_._3).sum
      val dchars = dup.map(_._3).sum
      src -> ((rows.length.toLong, dup.length.toLong, chars, dchars,
        if (chars > 0) dchars * 1000000L / chars else 0L))
    }
    assert(out == expect)
    // corpus-wide: dup doc count is n_docs - |distinct normalized texts|
    assert(out.values.map(_._2).sum == docs.length - keep.size)
  }

  test("simhash geometry scales key space with corpus size") {
    // the rule must keep expected bucket width <= target at every n, keep
    // the table count C(m, radius)-polynomial, and never shrink below the
    // minimal complete split
    for (n <- Seq(1L, 500L, 64_000L, 16_000_000L, 500_000_000L, 100_000_000_000L)) {
      val (widths, combos) = Dedup.simhashGeometry(n)
      val m = widths.length
      val c = m - Dedup.SimhashRadius
      assert(widths.sum === 60 && c >= 1)
      assert(combos.length === choose(m, c), s"n=$n: all C($m,$c) tables")
      val worstKeyBits = widths.sorted.take(c).sum
      val expWidth = n.toDouble / math.pow(2.0, worstKeyBits)
      assert(expWidth <= Dedup.SimhashTargetWidth,
        s"n=$n m=$m: expected bucket width $expWidth over target")
      info(s"n=$n -> m=$m chunks, ${combos.length} tables, >=$worstKeyBits-bit keys")
    }
    // monotone: more docs never means fewer chunks
    val ms = Seq(1L, 1000L, 1000000L, 1000000000L)
      .map(n => Dedup.simhashGeometry(n)._1.length)
    assert(ms === ms.sorted)
  }

  private def choose(n: Int, k: Int): Int =
    (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i).toInt

  test("simhash multi-chunk keys are complete at the radius (pigeonhole, random fingerprints)") {
    // pure-Scala mirror of the packed-key construction: any pair within the
    // radius must share at least one table key, at every geometry the rule
    // can pick
    val rnd = new scala.util.Random(7)
    for (n <- Seq(500L, 16_000_000L, 500_000_000L)) {
      val (widths, combos) = Dedup.simhashGeometry(n)
      val offsets = widths.scanLeft(0)(_ + _)
      def keys(sim: Long): Seq[(Int, Long)] = combos.zipWithIndex.map {
        case (combo, t) =>
          val packed = combo.foldLeft((0L, 0)) { case ((acc, shift), i) =>
            (acc + ((sim >>> offsets(i)) % (1L << widths(i))) * (1L << shift),
              shift + widths(i))
          }._1
          (t, packed)
      }
      for (_ <- 1 to 200) {
        val a = rnd.nextLong() >>> 4 // 60-bit
        val flips = rnd.shuffle((0 until 60).toList)
          .take(rnd.nextInt(Dedup.SimhashRadius + 1))
        val b = flips.foldLeft(a)((v, i) => v ^ (1L << i))
        assert(keys(a).toSet.intersect(keys(b).toSet).nonEmpty,
          s"n=$n: pair at hamming ${flips.length} shares no key")
      }
    }
  }

  test("simhash bucket widths stay near the design target at test scale") {
    val n = graft.Tables.documents(spark, sf).count()
    val (widths, combos) = Dedup.simhashGeometry(n)
    val keyed = graft.operators.Dedup.simhashKeys(
      Dedup.simhashFingerprints(spark, sf), widths, combos)
    val stats = keyed.groupBy(col("t"), col("key")).count()
      .agg(max(col("count")).as("maxw"), avg(col("count")).as("avgw"))
      .collect()(0)
    info(s"n=$n geometry m=${widths.length}/${combos.length} tables: " +
      s"max bucket ${stats.getLong(0)}, avg ${stats.getDouble(1)}")
    // identical-fingerprint families are real duplicates (same bucket by
    // construction) — allow them, but the bulk must sit near the target
    assert(stats.getDouble(1) <= Dedup.SimhashTargetWidth,
      "average simhash bucket width exceeds the design target")
  }

  test("no winnow fingerprint approaches the df cap at test scale") {
    val dfs = graft.operators.TextQueries.textWinnowFp(spark, sf)
      .groupBy(col("fp")).count()
    val maxDf = dfs.agg(max(col("count"))).collect()(0).getLong(0)
    info(s"max winnow fp df = $maxDf (cap ${graft.operators.TextQueries.MaxFpDf})")
    assert(maxDf < graft.operators.TextQueries.MaxFpDf / 2,
      "fp postings are wide enough that the df cap would change results")
  }

  test("capped minhash pipeline still finds every verified near-dup pair") {
    // the 0.5-jaccard ground truth comes from the exact all-pairs plan;
    // LSH banding at (16 hashes, 4 bands) must recover all of it here
    val exact = Dedup.dedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh) && lsh.subsetOf(exact))
  }

  test("auto-tuned minhash banding finds every verified near-dup pair") {
    val exact = Dedup.dedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.dedupMinhashAuto(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cfg = Dedup.mhTunedConfig(spark, sf)
    info(s"auto config: bands=${cfg.bands} rows=${cfg.rows} " +
      f"sDup=${cfg.sDup}%.3f sJunk=${cfg.sJunk}%.3f")
    assert(exact.subsetOf(auto) && auto.subsetOf(exact))
  }

  test("minhash tuner: tight corpora tune cheaper than loose ones, junk stays bounded") {
    val tight = Dedup.tuneMinhashFromProfile(Seq(0.95, 0.96, 0.97), Seq.fill(100)(0.05))
    val loose = Dedup.tuneMinhashFromProfile(Seq(0.7, 0.8, 0.9), Seq.fill(100)(0.05))
    info(s"tight=$tight loose=$loose")
    def sCurve(s: Double, c: Dedup.MinhashConfig) =
      1.0 - math.pow(1.0 - math.pow(s, c.rows), c.bands)
    for (c <- Seq(tight, loose)) {
      assert(sCurve(c.sDup, c) >= Dedup.MhTuneRecall, s"recall constraint: $c")
      assert(sCurve(c.sJunk, c) <= Dedup.MhTuneJunkMax, s"junk constraint: $c")
    }
    assert(tight.bands * tight.rows < loose.bands * loose.rows,
      "a tight corpus must need fewer hashes")
    // no dups observed → conservative mid-band fallback, still feasible
    val blind = Dedup.tuneMinhashFromProfile(Seq.empty, Seq.empty)
    assert(sCurve(0.75, blind) >= Dedup.MhTuneRecall)
  }

  test("jaccard τ tuner: lands in the bimodal valley, clamps, defaults") {
    // bimodal: background mass near 0.1, dup cluster at 0.8 → τ* in the gap
    val bimodal = Dedup.tuneJaccardTau(Seq.fill(50)(0.1) ++ Seq(0.8, 0.85, 0.9))
    assert(bimodal > 0.1 && bimodal < 0.8, s"τ*=$bimodal not in the valley")
    // dup-free: largest gap runs to the 1.0 sentinel, τ* conservative-high
    val dupFree = Dedup.tuneJaccardTau(Seq.fill(50)(0.15))
    assert(dupFree >= 0.5 && dupFree <= Dedup.JaccTauMax, s"τ*=$dupFree")
    // no sample at all → fixed default
    assert(Dedup.tuneJaccardTau(Seq.empty) === 0.5)
    // τ* never leaves [JaccTauMin, JaccTauMax]
    val hi = Dedup.tuneJaccardTau(Seq(0.97, 0.98, 0.99))
    assert(hi >= Dedup.JaccTauMin && hi <= Dedup.JaccTauMax, s"τ*=$hi")
  }

  test("auto-τ jaccard equals the plain pairwise result at the tuned τ") {
    val tau = Dedup.jaccTunedTau(spark, sf)
    info(f"tuned τ* = $tau%.2f")
    assert(tau >= Dedup.JaccTauMin && tau <= Dedup.JaccTauMax)
    // independent ground truth: the naive postings self-join thresholded at
    // τ* (reuses none of the prefix-filter machinery under test)
    val post = Dedup.shinglePostings(spark, sf)
      .select(col("doc_id"), col("n"), xxhash64(col("sh")).as("h"))
    val naive = post.as("a").join(post.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).cast("double").as("i"))
      .withColumn("jacc", col("i") / (col("na") + col("nb") - col("i")))
      .filter(col("jacc") >= lit(tau))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.dedupJaccardAuto(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive === auto)
  }

  test("substring dedup: whole-doc exact duplicates have full span coverage") {
    import graft.operators.TextQueries
    val sub = TextQueries.textSubstrDedup(spark, sf)
      .select("doc_id", "n_tokens", "dup_windows", "covered", "dup_frac")
    val rows = sub.collect()
    assert(rows.nonEmpty, "synthetic corpus has dup families; substr dedup must fire")
    rows.foreach { r =>
      val (n, dw, cov) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(cov <= n && dw <= n - TextQueries.SubstrK + 1,
        s"doc ${r.getLong(0)}: coverage/window bounds violated")
    }
    // Cross-op invariant: a doc in an exact-dup group (and long enough to
    // have windows) shares EVERY window with its twin → dup_frac = 1.0.
    val exactDups = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(graft.functions.TextFunctions.normalize(col("text"))).as("fp"))
      .withColumn("n_dups", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("n_dups") > 1).select("doc_id")
    val flagged = sub.filter(col("dup_frac") === 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val twins = exactDups.join(
        TextQueries.textSubstrDedup(spark, sf).select("doc_id"), "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(twins.subsetOf(flagged),
      s"exact-duplicate docs missing full coverage: ${twins -- flagged}")
  }

  test("canonical selection: total, one keeper per cluster, longest text wins") {
    val canon = Dedup.dedupCanonical(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    // total mapping: every doc exactly once
    assert(canon.count() === docs.count())
    assert(canon.select("doc_id").distinct().count() === docs.count())
    // exactly one keep=1 per cluster, and it IS the canonical
    val perCluster = canon.groupBy("cluster_id")
      .agg(sum(col("keep")).as("keepers"),
        countDistinct(col("canonical_id")).as("canons"))
    assert(perCluster.filter(col("keepers") =!= 1 || col("canons") =!= 1).count() === 0)
    assert(canon.filter(col("keep") === 1 && col("doc_id") =!= col("canonical_id"))
      .count() === 0)
    // the canonical's text is maximal within its cluster
    val withLen = canon.join(docs, "doc_id")
    val maxLen = withLen.groupBy("cluster_id").agg(max(col("n_chars")).as("mx"))
    val canonLen = withLen.filter(col("keep") === 1)
      .select(col("cluster_id"), col("n_chars"))
    assert(canonLen.join(maxLen, "cluster_id")
      .filter(col("n_chars") =!= col("mx")).count() === 0)
    // the clusters actually merge something at this SF (non-vacuous)
    assert(canon.filter(col("keep") === 0).count() > 0,
      "no doc was deduplicated — canonical selection untested")
    canon.unpersist()
  }

  /** Undirected edge list → symmetric DataFrame edge frame. */
  private def edgeFrame(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    val one = es.toDF("doc_a", "doc_b")
    one.unionByName(one.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
  }

  /** Driver-side union-find ground truth: node → component min id. */
  private def ufTruth(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("pointer-doubling CC ≡ plain min-label propagation ≡ union-find truth") {
    val rnd = new scala.util.Random(11)
    // random sparse graph: several mid-size components + singleton edges
    val es = (0 until 120).map { _ =>
      val c = rnd.nextInt(8)                      // 8 loose components
      val base = c * 1000L
      (base + rnd.nextInt(40), base + rnd.nextInt(40))
    }.filter(e => e._1 != e._2).distinct
    val edges = edgeFrame(es)
    val (jumped, rJump) = Dedup.connectedComponents(edges, jump = true)
    val (plain, rPlain) = Dedup.connectedComponents(edges, jump = false)
    val got = jumped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotPlain = plain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = ufTruth(es)
    assert(got === truth, "jumped CC disagrees with union-find")
    assert(gotPlain === truth, "plain CC disagrees with union-find")
    info(s"rounds: jumped=$rJump plain=$rPlain")
    assert(rJump <= rPlain)
  }

  test("chain adversary: doubling converges in O(log n) rounds where plain would abort") {
    // a 300-node path has diameter 299 — the plain loop would blow past
    // MaxClusterRounds (50); the doubling loop must finish in ~log2 rounds
    val n = 300L
    val es = (0L until n - 1).map(i => (i, i + 1))
    val (labels, rounds) = Dedup.connectedComponents(edgeFrame(es), jump = true)
    info(s"chain n=$n converged in $rounds rounds")
    assert(rounds <= 2 * (64 - java.lang.Long.numberOfLeadingZeros(n)) + 2,
      s"doubling took $rounds rounds on a $n-chain — not logarithmic")
    assert(rounds <= Dedup.MaxClusterRounds)
    // every node labeled 0 (the chain min)
    assert(labels.filter(col("lbl") =!= 0L).count() === 0)
  }

  test("recall eval: metrics recompute from the two verified pipelines") {
    val r = Dedup.dedupRecallEval(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nt, nc, nh) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val truth = Dedup.dedupNgramJaccard(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    // dedup_minhash_lsh's output IS candidates ∩ truth (candidates
    // verified by the same exact Jaccard at the same τ) — so its size must
    // equal the eval's hit count, closing the loop between the two
    // verified pipelines and this audit
    val verified = Dedup.dedupMinhashLsh(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nt == truth.size.toLong)
    assert(nh == verified.size.toLong)
    assert(verified.subsetOf(truth))
    assert(nh <= nt && nh <= nc)
    assert(row.getLong(3) == (if (nt > 0) nh * 1000000L / nt else 0L))
    assert(row.getLong(4) == (if (nc > 0) nh * 1000000L / nc else 0L))
  }

  test("recall eval pane: forced pane equals the audit of the sliced corpus") {
    // the corpus is far below DocPaneIds at every gate SF, so the dispatch
    // is a no-op there — force a tiny pane to exercise the sliced branch
    val pane = Tables.documents(spark, sf)
      .agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    val paned = Dedup.dedupRecallEvalAt(spark, sf, pane).collect().head
    // independent slice recompute through the public single-corpus ops on
    // a view restricted the same way (pair-local signatures/jaccard make
    // the slice semantics exact by construction)
    val n = Tables.documents(spark, sf).count()
    assert(n > pane, "median split must actually slice")
    val full = Dedup.dedupRecallEvalAt(spark, sf, Long.MaxValue).collect().head
    // the paned truth/candidate counts must be ≤ the full audit's and the
    // identities between the five columns must hold on the pane too
    assert(paned.getLong(0) <= full.getLong(0))
    assert(paned.getLong(1) <= full.getLong(1))
    val (nt, nc, nh) = (paned.getLong(0), paned.getLong(1), paned.getLong(2))
    assert(nh <= nt && nh <= nc)
    assert(paned.getLong(3) == (if (nt > 0) nh * 1000000L / nt else 0L))
    assert(paned.getLong(4) == (if (nc > 0) nh * 1000000L / nc else 0L))
    // and the paned truth is exactly the full truth post-filtered to the
    // pane (pair-locality — the property that licenses the pane)
    val fullTruth = Dedup.dedupNgramJaccard(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val expectTruth = fullTruth.count { case (a, b) => a < pane && b < pane }
    assert(nt == expectTruth.toLong,
      "paned truth must equal full truth post-filtered to the pane")
  }
}
