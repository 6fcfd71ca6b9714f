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
}
