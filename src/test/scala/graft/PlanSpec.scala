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
  test("cdc snapshot aggregates map-side before the shuffle (partial max_by)") {
    val p = plan(graft.cdc.CdcQueries.snapshotLatest(spark, sf))
    assert(p.contains("partial_max_by") || p.contains("partial_max"), p.linesIterator.take(6).mkString("\n"))
  }
}
