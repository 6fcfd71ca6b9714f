package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

class SkewSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("salted aggregation equals the plain single-phase aggregation") {
    val ev = Tables.events(spark, sf)
    val plain = Scale.plainSumCount(ev, "user_id", "value")
    val salted = Scale.saltedSumCount(ev, "user_id", "value")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("bucketed join plans without a shuffle exchange") {
    val joined = Scale.bucketedOrdersLineitem(spark, sf)
    val plan = joined.queryExecution.executedPlan.toString
    // the join inputs must be bucket-scanned, not re-shuffled: no Exchange
    // below the SortMergeJoin (only the final agg may shuffle, above it)
    assert(plan.contains("SortMergeJoin"), plan)
    val joinSection = plan.split("SortMergeJoin").last
    assert(!joinSection.contains("Exchange hashpartitioning"), plan)
    assert(joinSection.contains("Bucketed: true"), plan)
    assert(joined.count() > 0)
  }
  test("two-phase prefix sum equals the single-window running sum at several widths") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("v"))
    val slow = docs.withColumn("cum", sum(col("v")).over(Window.orderBy(col("doc_id"))))
    // explicit small widths exercise multi-bucket offsets; None exercises
    // the derived-from-data width
    for (w <- Seq(Some(64L), Some(257L), None)) {
      val fast = Scale.prefixSum(docs, "doc_id", "v", bucketWidth = w)
      assert(fast.exceptAll(slow).count() === 0, s"width=$w")
      assert(slow.exceptAll(fast).count() === 0, s"width=$w")
    }
    // offset-clustered keys (snowflake-style ids): the derived width must
    // come from the RANGE, not the magnitude — a max-only rule would put
    // every row in one bucket and still be result-correct, so pin the
    // bucketing itself: derived width must keep per-bucket rows bounded
    val shifted = docs.withColumn("doc_id", col("doc_id") + lit(1000000000000L))
    val slowS = shifted.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("doc_id"))))
    val fastS = Scale.prefixSum(shifted, "doc_id", "v")
    assert(fastS.exceptAll(slowS).count() === 0)
    assert(slowS.exceptAll(fastS).count() === 0)
    val n = docs.count()
    val derived = 1L + (shifted.agg(max(col("doc_id")) - min(col("doc_id")))
      .head().getLong(0)) / Scale.PrefixSumTargetBuckets
    assert(derived <= math.max(1L, n), // range ≈ n docs → width stays small
      s"derived width $derived collapses offset keys into few buckets")
  }

  test("durable-materialization seam produces identical results") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("v"))
    val local = Scale.prefixSum(docs, "doc_id", "v").collect().toSet
    spark.conf.set("spark.graft.durableMaterialize", "true")
    try {
      val durable = Scale.prefixSum(docs, "doc_id", "v").collect().toSet
      assert(durable === local)
    } finally spark.conf.unset("spark.graft.durableMaterialize")
  }

  test("two-phase top-k equals the single-window top-k") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val single = ev.withColumn("rnk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("n").desc, col("user_id"))))
      .filter(col("rnk") <= 7)
    val twoPhase = Scale.topKPerGroup(ev, Seq("event_type"),
      Seq(col("n").desc, col("user_id")), k = 7, saltSrc = col("user_id"), buckets = 8)
    assert(twoPhase.exceptAll(single).count() === 0)
    assert(single.exceptAll(twoPhase).count() === 0)
  }

  test("bucketized interval join equals the naive range join at several bucket counts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // edge shapes on purpose: zero-length intervals, an interval covering
    // the whole domain, adjacent intervals sharing a boundary, facts at
    // interval endpoints, keys with no intervals at all
    val facts = Seq((1L, 0L), (1L, 5L), (1L, 10L), (1L, 99L), (2L, 50L),
      (3L, 7L)).toDF("k", "pt")
    val ivs = Seq((1L, 0L, 0L, "a"), (1L, 1L, 10L, "b"), (1L, 10L, 99L, "c"),
      (2L, 0L, 99L, "d"), (9L, 0L, 99L, "e")).toDF("k", "f", "t", "tag")
    val naive = facts.join(ivs, facts("k") === ivs("k") &&
        col("pt") >= col("f") && col("pt") <= col("t"))
      .select(facts("k"), col("pt"), col("f"), col("t"), col("tag"))
      .collect().map(_.toSeq).toSet
    for (buckets <- Seq(1, 3, 4096)) {
      val got = Scale.intervalJoin(facts, ivs, Seq("k"), "pt", "f", "t", buckets)
        .select(col("k"), col("pt"), col("f"), col("t"), col("tag"))
        .collect().map(_.toSeq).toSet
      assert(got === naive, s"buckets=$buckets")
    }
  }

  test("salted join equals the plain join and replicates the build side") {
    import org.apache.spark.sql.functions._
    val ords = Tables.orders(spark, sf)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
    val plain = ords.join(cust, "c_custkey")
    for (salts <- Seq(1, 4, 16)) {
      val salted = Scale.saltedJoin(ords, cust, "c_custkey", salts)
        .select(plain.columns.map(col): _*)
      assert(salted.exceptAll(plain).count() === 0, s"salts=$salts")
      assert(plain.exceptAll(salted).count() === 0, s"salts=$salts")
    }
    // the build side must carry the salt explode (Generate) in the plan
    val p = Scale.saltedJoin(ords, cust, "c_custkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate explode"), p)
  }

  test("key-skew audit: value-frame Gini/top-10 equal the direct per-key math") {
    import org.apache.spark.sql.functions._
    // recompute every column naively from the per-key counts on the driver
    val perKey = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("cnt")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Scale.eventsKeySkew(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === perKey.keySet)
    for ((t, xs) <- perKey) {
      val n = xs.length.toLong
      val tot = xs.sum
      val w = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = ((BigInt(2) * w - BigInt(n + 1) * tot).toDouble
        / (BigInt(n) * tot).toDouble)
      val r = got(t)
      assert(r.getAs[Long]("n_keys") === n, t)
      assert(r.getAs[Long]("total_events") === tot, t)
      assert(r.getAs[Long]("max_count") === xs.max, t)
      assert(r.getAs[Long]("max_share_ppm") === xs.max * 1000000L / tot, t)
      assert(r.getAs[Long]("top10_share_ppm")
        === xs.sorted.reverse.take(10).sum * 1000000L / tot, t)
      assert(math.abs(r.getAs[Double]("gini") - gini) <= 1e-6 + 1e-12, t)
    }
    // non-vacuity: the top-10 share strictly exceeds the exact-uniform
    // share somewhere (the strongly-skewed regime is the synthetic test)
    assert(got.values.exists(r => r.getAs[Long]("top10_share_ppm")
      > 10L * 1000000L / r.getAs[Long]("n_keys")))
  }

  test("key-skew Gini is 0 on uniform counts and ~1-10/n when one key has all") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("skew_synth").toString
    // uniform: every user exactly 3 events; degenerate: one hot user plus
    // 9 single-event users
    val uni = (1 to 40).flatMap(u => Seq.fill(3)(u))
      .zipWithIndex.map { case (u, i) => (i.toLong, u.toLong, "uni") }
    val hot = (Seq.fill(991)(1L) ++ (2L to 10L)).zipWithIndex
      .map { case (u, i) => (100000L + i, u, "hot") }
    spark.createDataFrame(uni ++ hot)
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", lit(0L)).withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Scale.eventsKeySkew(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("uni").getAs[Double]("gini") === 0.0)
    assert(r("uni").getAs[Long]("max_share_ppm") === 1000000L / 40)
    // hot: n=10, T=1000; sorted asc = 9×1 then 991. Gini = (2W-(n+1)T)/(nT)
    // with W = Σi·xᵢ = 45 + 10·991 = 9955 → (19910-11000)/10000 = 0.891
    assert(r("hot").getAs[Double]("gini") === 0.891)
    assert(r("hot").getAs[Long]("max_share_ppm") === 991000L)
    assert(r("hot").getAs[Long]("top10_share_ppm") === 1000000L)
  }
}
