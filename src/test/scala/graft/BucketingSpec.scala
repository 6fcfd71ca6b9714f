package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join lever at cluster scale. A fact⋈dim join
  * on a shared key shuffles BOTH sides every run; writing both sides
  * bucketed by the join key (the one-time layout cost) makes every
  * subsequent join exchange-free — at 100 TB that converts the dominant
  * recurring shuffle of a mart workload into a one-time write. This spec
  * proves the property end to end on real testdata: same results, a
  * SortMergeJoin with ZERO shuffle exchanges, and bucket pruning on a
  * key-equality filter (1 of N buckets scanned).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
  private val NumBuckets = 8

  private def ensureTables(): Unit = {
    if (!spark.catalog.tableExists("b_orders")) {
      Tables.orders(spark, sf)
        .write.bucketBy(NumBuckets, "o_custkey").sortBy("o_custkey")
        .option("path", s"$dir/b_orders").saveAsTable("b_orders")
      Tables.customer(spark, sf)
        .write.bucketBy(NumBuckets, "c_custkey").sortBy("c_custkey")
        .option("path", s"$dir/b_customer").saveAsTable("b_customer")
    }
  }

  test("bucketed fact-dim join runs with zero shuffle exchanges") {
    ensureTables()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).as("total"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // the join itself must not exchange either side; the only exchange
      // allowed in the whole plan is the final groupBy's
      val joinSection = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      // and the result is the same as the plain (shuffling) join
      val plain = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).as("total"))
      assert(joined.orderBy("c_mktsegment").collect().toSeq ===
        plain.orderBy("c_mktsegment").collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("key-equality filter prunes to a single bucket") {
    ensureTables()
    val key = Tables.orders(spark, sf).agg(min("o_custkey")).head().getLong(0)
    // a bare filter doesn't need the bucket distribution, so the
    // DisableUnnecessaryBucketedScan rule would turn the bucketed scan off
    // and with it the pruning — pin the scan on for the assertion
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("b_orders").filter(col("o_custkey") === key)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains(s"SelectedBucketsCount: 1 out of $NumBuckets"),
        s"bucket pruning did not engage:\n$p")
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }
}
