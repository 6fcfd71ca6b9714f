package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Dedup}

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
        Dedup.dedupSimhash(spark, sf))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString("\n"))
    }
  }

  test("aggregations are partial before the shuffle (map-side combine)") {
    val p = plan(Analytics.dailyRevenue(spark, sf))
    assert(p.contains("partial_"), p)
  }
}
