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

  private lazy val kmv = Sketches.eventsKmvOverlap(spark, sf).collect()

  test("KMV per-type estimates sit inside the (K-1) error envelope") {
    // KMV relative std error ≈ 1/sqrt(K-2) (Beyer et al. 2007); assert 3σ
    assert(kmv.nonEmpty)
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val bound = 3.0 / math.sqrt(Sketches.KmvK - 2)
    val seen = collection.mutable.Set[String]()
    for (r <- kmv; (t, est) <- Seq(
        r.getAs[String]("type_a") -> r.getAs[Double]("est_a"),
        r.getAs[String]("type_b") -> r.getAs[Double]("est_b"))) {
      seen += t
      val ex = exact(t).toDouble
      assert(math.abs(est - ex) / ex <= bound, s"type $t: exact=$ex est=$est")
    }
    assert(seen.size === exact.size, "every type must appear in some pair")
  }

  test("KMV estimate is EXACT when a type has fewer than K distinct users") {
    // a filtered twin of the events table where every type has < K users
    val dir = java.nio.file.Files.createTempDirectory("kmv_small").toString
    Tables.events(spark, sf).filter(col("user_id") % 1000 < 40)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val small = Sketches.eventsKmvOverlap(spark, dir).collect()
    assert(small.nonEmpty)
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(exact.values.forall(_ < Sketches.KmvK), "premise: all types < K")
    for (r <- small) {
      assert(r.getAs[Double]("est_a") === exact(r.getAs[String]("type_a")).toDouble)
      assert(r.getAs[Double]("est_b") === exact(r.getAs[String]("type_b")).toDouble)
      // sketches are complete sets here, so the intersection is exact too
      assert(r.getAs[Double]("est_inter") === r.getAs[Long]("exact_inter").toDouble)
    }
  }

  test("KMV union sketch is a true monoid merge (≡ sketch of the raw union)") {
    // for every pair, (k_union, theta) must equal the bottom-K sketch built
    // from scratch over the RAW (not sketched) union of the two types' users
    val ev = Tables.events(spark, sf)
    val h = graft.functions.PortableHash.hexH(concat(lit("kmv:"), col("user_id")))
    for (r <- kmv.take(3)) {
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val hs = ev.filter(col("event_type").isin(ta, tb))
        .select(h.as("h")).distinct().orderBy(col("h"))
        .limit(Sketches.KmvK).collect().map(_.getAs[Long]("h"))
      assert(r.getAs[Long]("k_union") === hs.length.toLong, s"($ta,$tb)")
      assert(r.getAs[Long]("theta") === hs.max, s"($ta,$tb)")
    }
  }

  test("KMV intersection estimate within a 3σ hypergeometric envelope") {
    for (r <- kmv) {
      val estU = r.getAs[Double]("est_union")
      val estI = r.getAs[Double]("est_inter")
      val exI = r.getAs[Long]("exact_inter").toDouble
      val bound = estU * (3.0 / math.sqrt(Sketches.KmvK))
      assert(math.abs(estI - exI) <= bound,
        s"(${r.getAs[String]("type_a")},${r.getAs[String]("type_b")}): " +
          s"est=$estI exact=$exI bound=$bound")
    }
  }

  private lazy val qsk = Sketches.eventsQuantileSketch(spark, sf).collect()

  test("quantile sketch is within its 1/16 construction bound on every cell") {
    assert(qsk.length >= 3)
    for (r <- qsk)
      assert(r.getAs[Long]("rel_err_ppm") <= 62500L,
        s"${r.getString(0)}/${r.getString(1)}: ${r.getAs[Long]("rel_err_ppm")} ppm")
  }

  test("quantile sketch exact audit matches a driver-side sort") {
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(floor(value * 1e2) AS BIGINT)").as("v"))
      .filter(col("v") >= 1).collect()
      .map(r => (r.getString(0), r.getAs[Long]("v")))
    val vals = (raw.groupBy(_._1).view.mapValues(_.map(_._2).sorted) ++
      Map("_all" -> raw.map(_._2).sorted)).toMap
    for (r <- qsk) {
      val xs = vals(r.getString(0))
      val n = xs.length
      val target = r.getString(1) match {
        case "p50" => (n + 1) / 2
        case "p90" => (n * 9 + 9) / 10
        case _     => (n * 99 + 99) / 100
      }
      assert(r.getAs[Long]("exact_cents") === xs(target - 1),
        s"${r.getString(0)}/${r.getString(1)}")
      assert(r.getAs[Long]("n") === n.toLong)
    }
  }

  test("quantile sketch bucket table is a counter monoid (split-merge ≡ whole)") {
    // bucket counts over the whole table must equal the per-half tables
    // summed — the property a tree-reduce of partial sketches relies on
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("CAST(floor(value * 1e2) AS BIGINT)").as("v"))
      .filter(col("v") >= 1)
    val idx = expr("""CASE WHEN v < 8 THEN v
      ELSE (length(bin(v)) - 1) * 8 + (shiftright(v, length(bin(v)) - 4) & 7)
      END""")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("idx", idx).groupBy(col("event_type"), col("idx"))
        .agg(count(lit(1)).as("cnt"))
    val whole = sketch(ev)
    val merged = sketch(ev.filter(col("event_id") % 2 === 0))
      .unionByName(sketch(ev.filter(col("event_id") % 2 === 1)))
      .groupBy(col("event_type"), col("idx")).agg(sum(col("cnt")).as("cnt"))
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
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

  test("sliding HLL window estimate equals a from-scratch sketch per window") {
    // the slid register table is a max-merge of per-day tables; re-sketch
    // each 7-day window directly from raw (day, user) rows and demand the
    // identical reg_sum-driven estimate — proves the merge loses nothing
    val out = Sketches.eventsHllSliding(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = raw.map(_._1).distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexH(sv: String): Long = java.lang.Long.parseLong(
      md.digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    for ((dayStr, row) <- out) {
      val wend = java.time.LocalDate.parse(dayStr)
      val wstart = wend.minusDays(Sketches.HllWinDays - 1)
      val users = raw.filter { case (dd, _) =>
        !dd.isBefore(wstart) && !dd.isAfter(wend) }.map(_._2).distinct
      assert(row.getAs[Long]("n_exact") == users.length.toLong, s"day $dayStr")
      // from-scratch registers over the window's users
      val regs = users.map(u => hexH(s"hll:$u"))
        .groupBy(_ % Sketches.HllM).view
        .mapValues(_.map(h => 55 - java.lang.Long.toBinaryString(h / Sketches.HllM).length).max)
        .toMap
      val present = regs.size.toLong
      val regSum = regs.values.map(mj => 1L << (55 - mj)).sum +
        (Sketches.HllM - present) * (1L << 55)
      assert(row.getAs[Long]("reg_sum") == regSum, s"day $dayStr")
    }
    // window ends clip at the observed max day — no phantom future windows
    val maxDay = days.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    assert(out.keys.max == maxDay.toString)
  }
}
