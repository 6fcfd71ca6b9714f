package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import graft.operators.{Analytics, Dedup, Sampling, Similarity}

/** Plan audits: the physical plans must stay scale-shaped — filters pushed
  * into the parquet scan, dims broadcast, no accidental cartesian products.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 pushes the shipdate filter into the scan") {
    val p = plan(Analytics.q1PricingSummary(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1 reads only the columns it needs") {
    val p = plan(Analytics.q1PricingSummary(spark, sf))
    assert(!p.contains("l_orderkey"), "scan must prune unused lineitem columns")
  }

  test("dimension joins broadcast (q5, category_revenue)") {
    assert(plan(Analytics.q5LocalSupplier(spark, sf)).contains("BroadcastHashJoin"))
    assert(plan(Analytics.categoryRevenue(spark, sf)).contains("BroadcastHashJoin"))
  }

  test("blocked dedup plans contain no cartesian product") {
    for (q <- Seq(Dedup.dedupNgramJaccard(spark, sf), Dedup.dedupMinhashLsh(spark, sf),
        Dedup.dedupSimhash(spark, sf), Dedup.dedupMinhashAuto(spark, sf),
        Dedup.dedupSemantic(spark, sf),
        graft.operators.Multimodal.mmPhashNeardup(spark, sf))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString("\n"))
    }
  }

  test("simhash pair join reads the checkpointed key frame, not two scans") {
    // r15: simhashPairs materializes the keyed frame before its self-join —
    // without it both join sides recompute the whole upstream fingerprint
    // scan (PhashAttrib: the dominant stage, 35.9 s of mm_phash_neardup's
    // sf10 wall; the checkpoint took the query 136.1 → 45.0 s). The final
    // plan must read the checkpoint (ExistingRDD) and contain NO parquet
    // scan of the documents table at all.
    for (q <- Seq(Dedup.dedupSimhash(spark, sf),
        graft.operators.Multimodal.mmPhashNeardup(spark, sf))) {
      val p = plan(q)
      assert(p.contains("ExistingRDD"), p.linesIterator.take(8).mkString("\n"))
      assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
        p.linesIterator.take(8).mkString("\n"))
    }
  }

  test("window funnel is a value-framed window pass, not a per-anchor scan") {
    // the shared pass: ONE Window operator computes both next-event
    // columns, value-based (tie-safe) frame
    val np = plan(Analytics.windowFunnelNexted(spark, sf))
    assert(np.contains("RangeFrame") || np.contains("RANGE BETWEEN"), np)
    assert(np.linesIterator.count(_.contains("Window [")) == 1, np)
    // and the full funnel never falls back to a per-anchor event scan
    val p = plan(Analytics.eventsWindowFunnel(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.count(_.contains("Window [")) <= 1, p)
  }

  test("customer_abc: Pareto cumulative without a customer-sized global sort") {
    val p = plan(Analytics.customerAbc(spark, sf))
    // the oracle's `sum() OVER (ORDER BY rev DESC)` must not leak into the
    // plan: every window must be prefixSum's — bucket-local cumsums or the
    // <=32k-row bucket-offsets pass, both carrying the _pb bucket column
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach { l =>
      assert(l.contains("_pb"), s"window not bucket-scoped (global customer sort?): $l")
    }
  }

  test("ccnet tiers: exact ntile without a corpus-sized window partition") {
    val p = plan(graft.operators.TextQueries.textCcnetBuckets(spark, sf))
    // the oracle's per-lang ntile must NOT leak into the plan (a lang-only
    // window over raw docs puts a whole language on one reducer)
    assert(!p.contains("ntile"), p)
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach { l =>
      val aggregatedInput = l.contains("sum(c#") || l.contains("sum(bc#")
      val multiKey =
        """windowspecdefinition\(lang#\d+, avg_centibits#""".r.findFirstIn(l).isDefined
      assert(aggregatedInput || multiKey,
        s"window partitioned on a corpus-sized key set: $l")
    }
  }

  test("text_surprisal aggregates map-side before both shuffles") {
    val p = plan(graft.operators.TextQueries.textSurprisal(spark, sf))
    assert(p.contains("partial_count") || p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dsir scoring joins a broadcast weight table; no nested-loop crosses") {
    val p = plan(graft.operators.TextQueries.sampleDsir(spark, sf))
    // the λ table is ≤ DsirBuckets rows — it must broadcast onto the
    // bigram scan, and the totals must ride the count frame as a window,
    // not as two more cross-joined rescans of the bigram frame
    assert(p.contains("BroadcastHashJoin [f#"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("quality-model scoring is a shuffle-free scan (literal weight table)") {
    val p = plan(graft.operators.TextQueries.textQualityModel(spark, sf))
    // the model is a per-row literal lookup: the only plumbing allowed is
    // the doc_id-keyed label join (broadcast at this scale)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bloom decontamination probes a literal bitmap — no bench-side join in the scoring plan") {
    val p = plan(graft.operators.TextQueries.textDecontaminateBloom(spark, sf))
    // the filter is a literal: the scoring side must not join the benchmark
    // (that would be the postings plan the bloom path exists to avoid);
    // the only exchanges are the gram-dedup and the doc_id rollup
    assert(!p.contains("Join"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("topk sketch aggregates partially before the exchange; final sort is bounded") {
    val p = plan(Analytics.eventsTopkSketch(spark, sf))
    // partial sketch per partition (ObjectHashAggregate partial_graft_topk_sketch),
    // merged across ONE exchange, then TakeOrderedAndProject on <= cap rows
    assert(p.contains("partial_graft_topk_sketch"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2, p)
  }

  test("knn_range is a broadcast scan with the threshold filter — no shuffle at all") {
    val p = plan(graft.operators.Similarity.knnRange(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("customer_rfm scores against broadcast thresholds — no customer-sized window") {
    val p = plan(Analytics.customerRfm(spark, sf))
    assert(!p.contains("Window"), "RFM must not plan an ntile window over customers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("part_cosim pairs come from the basket join, never cartesian") {
    val p = plan(Analytics.partCosim(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // the only windows allowed: the bounded per-basket width filter and the
    // two-phase top-k (bucketed) — never a part-partitioned full sort
    assert(p.contains("ok#") && p.contains("Join"), p)
  }

  test("semdedup pair join is cell-keyed, never cartesian") {
    val p = plan(graft.operators.Similarity.dedupSemdedup(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join [cell#") || p.contains("Join [cast(cell#"), p)
  }

  test("runtime bloom filter prunes a fact scan behind a selective dim filter") {
    // The 100 TB mechanism: a shuffle join whose build side carries a
    // selective filter gets a bloom filter injected on the probe scan
    // (Catalyst InjectRuntimeFilter). Size thresholds hide it at test
    // scale — lower them to prove our declarative join shapes ADMIT it
    // (an RDD/imperative formulation would not).
    import org.apache.spark.sql.functions.col
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.lineitem(spark, sf)
      val p = plan(l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).count())
      assert(p.toLowerCase.contains("might_contain"),
        "expected an injected bloom filter on the fact side:\n" + p.take(1500))
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("temporal dimension join is a carry-forward window, not an interval join") {
    // union + ONE hash shuffle on the key + window; an interval-range
    // formulation would surface as a nested-loop/cartesian join that goes
    // quadratic per key at scale
    val p = plan(graft.cdc.CdcQueries.scd2DimJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("Union"), p)
  }

  test("aggregations are partial before the shuffle (map-side combine)") {
    val p = plan(Analytics.dailyRevenue(spark, sf))
    assert(p.contains("partial_"), p)
  }
  test("q6 pushes all scan predicates into the reader") {
    // formatted mode: toString truncates the PushedFilters list
    val p = Analytics.q6ForecastRevenue(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range must reach the scan")
    assert(p.contains("LessThan(l_quantity"), "quantity bound must reach the scan")
  }

  test("q4 plans a semi join and customers_inactive an anti join") {
    assert(plan(Analytics.q4OrderPriority(spark, sf)).contains("LeftSemi"))
    assert(plan(Analytics.customersInactive(spark, sf)).contains("LeftAnti"))
  }

  test("q16 plans an anti join, q20 a semi join, q2 no forced fact broadcast") {
    assert(plan(Analytics.q16SupplierDist(spark, sf)).contains("LeftAnti"))
    assert(plan(Analytics.q20DominantSupplier(spark, sf)).contains("LeftSemi"))
    // q2's nation/region hints live INSIDE the materialized offers
    // subtree (computed once, checkpointed); the OUTER plan — min-cost
    // join + part join — must carry no forced broadcast at all, so the
    // SF-scaled sides degrade to shuffle joins when they outgrow AQE's
    // threshold
    val hints = Analytics.q2MinCostSupplier(spark, sf).queryExecution.analyzed
      .collect { case h: ResolvedHint => h.child.toString }
    assert(hints.isEmpty, hints.mkString("\n"))
  }
  test("cdc snapshot aggregates map-side before the shuffle (partial max_by)") {
    val p = plan(graft.cdc.CdcQueries.snapshotLatest(spark, sf))
    assert(p.contains("partial_max_by") || p.contains("partial_max"), p.linesIterator.take(6).mkString("\n"))
  }

  test("cdc snapshot delta is one dual-state aggregate — no snapshot join") {
    val p = plan(graft.cdc.CdcQueries.snapshotDelta(spark, sf))
    // both table states (as-of-t1 and latest) come out of ONE per-key
    // max_by aggregate; the round-≤10 two-snapshots + full-outer plan
    // (the sf10 suite's worst superlinear wall, 220 s) must not come back
    assert(!p.contains("FullOuter") && !p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_max_by") || p.contains("partial_max"), p)
    // the only non-broadcast exchanges: the id-keyed aggregate shuffle and
    // the ≤4-row class rollup — never three snapshot-sized shuffles
    val ex = "hashpartitioning\\(([a-z_0-9#]+)".r
      .findAllMatchIn(p).map(_.group(1).takeWhile(_ != '#')).toSeq
    assert(ex.toSet.subsetOf(Set("id", "change")), ex.mkString(","))
  }

  test("payload entropy uses the native byte histogram — never per-byte rows") {
    val p = plan(graft.operators.Multimodal.mmPayloadEntropy(spark, sf))
    assert(p.contains("graft_byte_histogram"), p)
    // the old plan exploded transform(sequence(1, octet_length(payload)))
    // into one row per payload byte — the sf10 smoke's worst per-10× ratio
    assert(!p.contains("sequence("), p)
  }

  test("knn top-k is two-phase bucketed — no corpus-sized single-reducer sort") {
    for (q <- Seq(Similarity.knnBrute(spark, sf), Similarity.knnLsh(spark, sf),
        Similarity.knnIvf(spark, sf), Similarity.knnPq(spark, sf),
        Similarity.knnIvfPq(spark, sf))) {
      val parts = "hashpartitioning\\([^)]*".r.findAllIn(plan(q)).toSeq
      // phase one windows over (q_id, bucket) — the only sorts are bounded
      assert(parts.exists(_.contains("_b0")),
        "expected a bucketed phase-one window exchange:\n" + parts.mkString("\n"))
      // and no exchange is keyed by vec_id ALONE — the old IVF assignment's
      // per-vector argmax window. (q_id, vec_id) pair-keyed aggregation
      // exchanges are fine: that's the LSH candidate dedup, no hot key.
      assert(!parts.exists(_.startsWith("hashpartitioning(vec_id")),
        "no per-vector window exchange allowed:\n" + parts.mkString("\n"))
    }
  }

  test("no forced broadcast of SF-scaled tables (customer/part/supplier)") {
    def hints(df: DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h.child.toString }.toSeq
    // hint counts: only the fixed-size dims (nation 25 rows, region 5) keep one
    assert(hints(Analytics.q5LocalSupplier(spark, sf)).size === 2)
    assert(hints(Analytics.q7VolumeShipping(spark, sf)).size === 2)
    assert(hints(Analytics.q10Returns(spark, sf)).size === 1)
    for (q <- Seq(Analytics.categoryRevenue _, Analytics.q14PromoRevenue _,
        Analytics.q18LargeOrders _, Analytics.topSuppliers _))
      assert(hints(q(spark, sf)).isEmpty)
    // every remaining hinted subtree really is nation or region
    for (h <- hints(Analytics.q5LocalSupplier(spark, sf)) ++
        hints(Analytics.q7VolumeShipping(spark, sf)) ++
        hints(Analytics.q10Returns(spark, sf)))
      assert(h.contains("n_nationkey") || h.contains("r_regionkey"), h.take(200))
    // the size threshold still broadcasts the small dims at test scale
    assert(plan(Analytics.q10Returns(spark, sf)).contains("BroadcastHashJoin"))
    assert(plan(Analytics.categoryRevenue(spark, sf)).contains("BroadcastHashJoin"))
  }

  test("basket rules: pairs from the basket join; support floor precedes scoring joins") {
    val df = Analytics.basketRules(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // the RuleMinSupp prune must sit under the supp/lift joins in the
    // optimized plan, not above them — otherwise every weight-1 pair rides
    // through three joins before dying
    val opt = df.queryExecution.optimizedPlan.toString
    val joinDepth = opt.linesIterator.zipWithIndex
      .filter(_._1.contains("Join")).map(_._2).toSeq
    val filterDepth = opt.linesIterator.zipWithIndex
      .filter(l => l._1.contains(">= 2") && l._1.contains("supp_pair")).map(_._2).toSeq
    assert(filterDepth.nonEmpty, opt)
    assert(joinDepth.nonEmpty && filterDepth.head > joinDepth.head,
      s"support floor not under the scoring joins:\n$opt")
  }

  test("kmv overlap: no cartesian; windows only on bucket/pair frames") {
    val p = plan(graft.operators.Sketches.eventsKmvOverlap(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // every window is either topKPerGroup's bucket phase (_b…) or the
    // ≤2K-row-per-pair merged-sketch rank — never a raw-corpus partition
    p.linesIterator.filter(_.contains("windowspecdefinition(")).foreach { l =>
      assert(l.contains("_b") || l.contains("type_a"), l)
    }
    // the distinct (type, hash) build partial-aggregates before the wire
    assert(p.contains("partial_"), p)
  }

  test("key skew: windows rank count-VALUES, never keys; partial agg first") {
    val p = plan(graft.operators.Scale.eventsKeySkew(spark, sf))
    p.linesIterator.filter(_.contains("windowspecdefinition(")).foreach { l =>
      assert(!l.contains("user_id"), s"window over the key frame: $l")
    }
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("quantile sketch: bucket agg is map-side partial; no cartesian") {
    // the BUILD is materialized before extraction (it feeds both the
    // per-type rows and the _all merge), so audit its plan separately
    val bp = plan(graft.operators.Sketches.quantileBuckets(
      graft.operators.Sketches.quantileCents(Tables.events(spark, sf))))
    assert(bp.contains("partial_count"), bp)
    val p = plan(graft.operators.Sketches.eventsQuantileSketch(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // extraction windows run on the bucket/value frames keyed by event_type
    p.linesIterator.filter(_.contains("windowspecdefinition(")).foreach { l =>
      assert(l.contains("event_type"), l)
    }
  }

  test("priority sample: rank windows are bucketed or k-bounded, never global") {
    val p = plan(Sampling.samplePriority(spark, sf))
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach { l =>
      assert(l.contains("_b") || l.contains("source"),
        s"window neither bucket-scoped nor source-keyed: $l")
    }
    assert(!p.contains("CartesianProduct"), p)
  }

  test("triangle closure is an equi-join chain, never cartesian/nested-loop") {
    val p = plan(graft.operators.Graph.partTriangles(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // exactly one BNLJ is expected: the 1-row total_tri scalar broadcast.
    // The wedge + closing-edge joins must be equi (an OR-condition closure
    // would add a second nested-loop join)
    // (the wedge + closure joins themselves sit behind the materialize
    // checkpoints and don't appear in this final plan; their equi-join
    // shape is pinned by the exact-equality GraphSpec result instead)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("ngram novelty: no cartesian; gram join is key-equi") {
    val p = plan(graft.operators.Search.textNgramNovelty(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bot triage windows are user-keyed; joins stay equi") {
    val p = plan(graft.operators.Experiments.eventsBotTriage(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("user_id"), s"window not user-keyed: $l"))
  }

  test("seasonality cell agg is map-side partial before the exchange") {
    val p = plan(graft.operators.Experiments.eventsSeasonality(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), "cell counts must partial-agg map-side")
  }

  test("ab srm: only the 1-row scalar assembly is a nested-loop join") {
    val p = plan(graft.operators.Experiments.eventsAbSrm(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("cusum shift: grid fill is the one broadcast calendar join; windows type-keyed") {
    val p = plan(graft.operators.Experiments.eventsCusumShift(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // exactly one BNLJ is expected: the bounded alphabet × calendar grid
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("event_type"), s"window not type-keyed: $l"))
  }

  test("orders_backlog: delta joins are equi; no cartesian") {
    val p = plan(graft.operators.Olap.ordersBacklog(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), "daily deltas must partial-agg map-side")
  }

  test("dedup_waste: fp join is equi; per-source agg is map-side partial") {
    val p = plan(graft.operators.Dedup.dedupWaste(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
  }

  test("ndcg eval: relevance/weight joins are equi; no cartesian") {
    val p = plan(graft.operators.Search.textNdcgEval(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("centroid drift: the dims-frame join is a broadcast equi-join") {
    val p = plan(graft.operators.Similarity.embedCentroidDrift(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("theilsen median is a bucketed counting pass, never a global pair sort") {
    val p = plan(graft.operators.TimeSeries.dailyRevenueTheilsen(spark, sf))
    // the oracle's row_number() OVER (ORDER BY slope,...) must not leak in:
    // the only windows allowed are the ≤4097-row coarse-bucket cum (_tb)
    // and prefixSum's bucket-scoped passes (_pb) — never a pair-frame sort
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach { l =>
      assert(l.contains("_pb") || l.contains("_tb"),
        s"window not bucket-scoped (global pair sort?): $l")
    }
    assert(!p.contains("row_number"), "no rank pass over the raw pair frame")
  }

  test("ivf probe sweep: exactly the 3 intended sweep passes, bucketed top-k") {
    val df = graft.operators.Similarity.knnIvfProbeSweep(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // one union of |ProbeSweep| branches — no hidden extra rescans
    assert(p.linesIterator.count(_.contains("Union")) == 1,
      p.linesIterator.filter(_.contains("Union")).mkString("\n"))
    // per sweep point: the probed-candidate join is cell-keyed equi, and
    // every rank window is topKPerGroup's — the bucketed phase one (_b…) or
    // the q_id-keyed phase two over the bounded buckets×K survivor frame
    p.linesIterator.filter(_.contains("windowspecdefinition(")).foreach { l =>
      assert(l.contains("_b") || l.contains("q_id"),
        s"window neither bucket- nor q_id-scoped: $l")
    }
  }

  test("cohort repeat: windows ride the bounded (cohort × gap) frame") {
    val p = plan(graft.operators.Lifecycle.ordersCohortRepeat(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the median windows partition by cohort over per-(cohort,gap) COUNTS —
    // never a raw per-customer frame (no ck in any window line)
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach { l =>
      assert(l.contains("cohort"), s"window not cohort-keyed: $l")
      assert(!l.contains("ck#"), s"window over the raw customer frame: $l")
    }
  }

  test("ivf balance: map-side assignment, no joins beyond the bounded rollup") {
    val p = plan(graft.operators.Similarity.embedIvfBalance(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), "assignment must be map-side, never a join")
  }
}
