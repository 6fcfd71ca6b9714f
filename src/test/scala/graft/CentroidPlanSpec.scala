package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeVector
import graft.operators.Similarity

/** The no-literal-ceiling IVF assignment path: past MaxCells the centroid
  * matrix rides a 1-row broadcast DataFrame instead of plan-embedded
  * literals (Similarity.centCols). These tests pin (a) the dispatch, (b)
  * bit-identical assignment between the two transports, and (c) the plan
  * shape at an SF whose √n cell count actually exceeds the clamp (sf10:
  * 200k vectors → 448 cells).
  */
class CentroidPlanSpec extends AnyFunSuite {
  import TestSpark.spark

  val Dim = 16
  val CellsOver = Similarity.MaxCells + 44 // past the literal ceiling

  /** Deterministic pseudo-random doubles in [−1, 1) — fixed across runs. */
  def pseudo(i: Int, j: Int): Double = {
    val x = (i * 1103515245L + j * 12345L + 42L) & 0x7fffffffL
    x.toDouble / 0x40000000L - 1.0
  }
  lazy val cents: Array[Array[Double]] = Array.tabulate(CellsOver, Dim)(pseudo)
  lazy val vecs = {
    import spark.implicits._
    (0 until 500)
      .map(i => (i.toLong, Seq.tabulate(Dim)(j => pseudo(i + 7919, j))))
      .toDF("vec_id", "v")
  }

  /** Same norm fold order as Similarity.n2Seq (sequential left-to-right). */
  private def norms(cs: Array[Array[Double]]): IndexedSeq[Double] =
    cs.map { cv =>
      var acc = 0.0; var i = 0
      while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
      math.sqrt(acc)
    }.toIndexedSeq

  test("cellsFor is the uncapped √n rule (floor NumCells, no MaxCells clamp)") {
    // the exact sizing knnGraph/semdedup Scaladoc promises: max(32, ⌈√n⌉)
    for (n <- Seq(1L, 100L, 1024L, 20000L, 200000L, 20000000L))
      assert(Similarity.cellsFor(n) ==
        math.max(Similarity.NumCells, math.ceil(math.sqrt(n.toDouble)).toInt),
        s"cellsFor($n)")
    assert(Similarity.cellsFor(20000000L) > Similarity.MaxCells,
      "no ceiling: cells keep growing ∝ √n past the literal-transport clamp")
  }

  test("dispatch: ≤ MaxCells attaches nothing (literal plan, no join)") {
    val cc = Similarity.centColsOf(spark, cents.take(Similarity.NumCells))
    val df = cc.cleanup(cc.attach(vecs)
      .withColumn("cell", NativeVector.argmaxDot(col("v"), cc.flat, cc.sn)))
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), s"literal path must not join:\n$plan")
  }

  test("join-plan assignment ≡ literal-plan assignment past MaxCells") {
    // literal transport, forced (bypasses the dispatch that would refuse it)
    val lit = vecs
      .withColumn("cell", NativeVector.argmaxDot(col("v"),
        typedlit(cents.flatten.toIndexedSeq), typedlit(norms(cents))))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // joined transport, as dispatched for cells > MaxCells
    val cc = Similarity.centColsOf(spark, cents)
    val joined = cc.cleanup(cc.attach(vecs)
      .withColumn("cell", NativeVector.argmaxDot(col("v"), cc.flat, cc.sn)))
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"past MaxCells the matrix must arrive via the 1-row broadcast join:\n$plan")
    val jm = joined.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(jm == lit, "assignment must be bit-identical across transports")
    assert(jm.values.toSet.size > 1, "sanity: more than one cell used")
  }

  test("sf10 crosses the ceiling: assignment plan is the join shape, literal-free, and runs") {
    val dir = "/root/repo/testdata-sf10"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists,
      "sf10 scaled dir not present")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(Similarity.cellsFor(n) > Similarity.MaxCells,
      s"sf10 must exceed the clamp (n=$n, cells=${Similarity.cellsFor(n)})")
    val assigned = Similarity.assignCells(
      graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
      spark, dir)
    val plan = assigned.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "sf10 assignment must take the centroid-frame join plan")
    // no cell-scaled literal embedded anywhere: a 448×64 matrix literal
    // would put ~450k chars of doubles into the plan string
    assert(plan.length < 100000,
      s"plan string suspiciously large (${plan.length}) — literal leak?")
    // and the join plan actually executes: full 200k-vector assignment
    val stats = assigned.agg(
      min(col("cell")).as("lo"), max(col("cell")).as("hi"),
      countDistinct(col("cell")).as("nc")).collect()(0)
    assert(stats.getInt(0) >= 0)
    assert(stats.getInt(1) < Similarity.cellsFor(n))
    assert(stats.getLong(2) > Similarity.MaxCells,
      "more distinct cells in use than the old clamp allowed")
  }
}
