package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** The portable (oracle-gated) sketches: the HLL estimate must sit inside
  * its published error envelope, its `_all` row must be a true register
  * MERGE (identical to re-sketching the union from raw rows), and the
  * Count-Min estimate must be one-sided with the eps·N overcount bound —
  * the properties a 1000-executor tree-reduce relies on.
  */
class SketchesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val hll = Sketches.eventsApproxDistinct(spark, sf).collect()
    .map(r => r.getString(0) -> r).toMap

  test("HLL estimate within the m=64 error envelope on every group") {
    // published std error = 1.04/sqrt(m) ≈ 13%; assert 3 sigma
    assert(hll.nonEmpty)
    for ((g, r) <- hll) {
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact <= 3 * 1.04 / math.sqrt(Sketches.HllM),
        s"group $g: exact=$exact est=$est")
    }
  }

  test("HLL _all row is a true register merge of the per-group sketches") {
    // recompute the union sketch from RAW rows (one group spanning all
    // event types) and compare registers via the reg_sum it produces —
    // max-merge of per-group registers must equal the from-scratch union
    val ev = Tables.events(spark, sf)
      .select(lit("_all").as("event_type"), col("user_id"))
    val h = graft.functions.PortableHash.hexH(concat(lit("hll:"), col("user_id")))
    val raw = ev.select(col("event_type"), h.as("h"))
      .select(col("event_type"), (col("h") % Sketches.HllM).as("bucket"),
        expr(s"h div ${Sketches.HllM}").as("rest"))
      .withColumn("rho", (lit(55) - length(bin(col("rest")))).cast("int"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("mj"))
      .agg(count(lit(1)).as("present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mj AS INT))")).as("psum"))
      .collect()(0)
    val fromScratch = raw.getAs[Long]("psum") +
      (Sketches.HllM - raw.getAs[Long]("present")) * 36028797018963968L
    assert(hll("_all").getAs[Long]("reg_sum") === fromScratch)
  }

  test("Count-Min is one-sided and within the eps*N envelope") {
    val rows = Sketches.eventsCountMin(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_exact")).sum
    // eps = e/width per the CM analysis; depth 4 gives confidence 1-e^-4.
    // Assert the bound on the MAX overcount with a small slack for the
    // md5 family not being perfectly pairwise-independent.
    val bound = math.E / Sketches.CmWidth * n * 2
    for (r <- rows) {
      val (exact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("cm_est"))
      assert(est >= exact, s"${r.getString(0)}: underestimate $est < $exact")
      assert(est - exact <= bound,
        s"${r.getString(0)}: overcount ${est - exact} > $bound")
    }
  }

  test("Count-Min counter rows each sum to the full event count") {
    // every depth row counts every event exactly once — the invariant that
    // makes counters mergeable by plain addition
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val perRow = Sketches.eventsCountMin(spark, sf) // force build path compiles
    val sketchTotals = {
      val it = ev.select(concat(col("event_type"), lit(":"), col("user_id")).as("item"))
      val hm = graft.functions.PortableHash.hmod(concat(lit("cm:"), col("item")))
      it.withColumn("hm", hm)
        .select(explode(array((0 until Sketches.CmDepth).map(j =>
          struct(lit(j).as("i"),
            (graft.functions.PortableHash.affine(j, col("hm")) % Sketches.CmWidth)
              .as("bucket"))): _*)).as("p"))
        .groupBy(col("p.i")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getAs[Long]("cnt"))
    }
    assert(sketchTotals.length === Sketches.CmDepth)
    assert(sketchTotals.forall(_ === total), s"rows=$sketchTotals total=$total")
    assert(perRow.columns.contains("overcount"))
  }
}
