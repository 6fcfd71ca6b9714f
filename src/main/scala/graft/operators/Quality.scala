package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pipeline-governance operators: a Deequ-style data-quality expectation
  * suite, the bitmask form of N-day retention, ABC-class migration between
  * periods, and greedy supplier set cover. Shared discipline with the rest
  * of the registry: integer/DECIMAL-exact statistics (ppm with one floor
  * division in the final projection), map-side-partial aggregates before
  * any shuffle, bounded frames for anything sorted or windowed, and
  * driver-side collects only for bounded greedy state (the set-cover picks
  * — [[SetCoverRounds]] rows, the embed_kcenter precedent).
  */
object Quality {

  /** Data-quality expectation suite over the mart (the Deequ/
    * Great-Expectations role): one row per declared constraint with the
    * checked population, violation count, floor-ppm violation rate, and a
    * 0/1 pass flag. Five scans total — the three lineitem domain checks
    * share one aggregate, the two orders checks share one, and the two
    * lineitem↔orders checks (orphan FK + ship-before-order) share one
    * key-shuffle join; the customer-FK check rides a second join. At scale
    * the FK checks are the honest big-big shuffle joins (you cannot audit
    * referential integrity without lining the keys up); everything else
    * collapses map-side. Violations found on this corpus are real: the
    * synthetic lineitem ship dates are uncorrelated with their order
    * dates, and the audit says so.
    */
  def dqExpectations(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val cust = Tables.customer(s, d)
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))

    // one lineitem scan for the three row-local domain checks
    val liAgg = Scale.materialize(li.agg(
      count(lit(1)).as("n"),
      cnt(col("l_quantity") < 1 || col("l_quantity") > 50).as("v_qty"),
      cnt(col("l_discount") < 0 || col("l_discount") > 0.1).as("v_disc"),
      cnt(!col("l_returnflag").isin("A", "N", "R")).as("v_flag")))
    // one orders scan: totalprice domain + orderkey uniqueness
    val ordAgg = Scale.materialize(ord.agg(
      count(lit(1)).as("n"),
      cnt(col("o_totalprice") <= 0).as("v_price"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup")))
    val custAgg = cust.agg(
      count(lit(1)).as("n"),
      cnt(!col("c_mktsegment").isin(
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .as("v_seg"))
    // orders→customer FK: left join preserving orders, count unmatched
    val fkCust = ord.select(col("o_custkey"))
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"), cnt(col("c_custkey").isNull).as("v_fk"))
    // lineitem→orders FK + ship-after-order temporal check on ONE join
    val fkOrd = Scale.materialize(li
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n"),
        cnt(col("o_orderkey").isNull).as("v_fk"),
        cnt(col("o_orderkey").isNotNull).as("n_matched"),
        cnt(col("o_orderkey").isNotNull &&
          col("l_shipdate") < col("o_orderdate")).as("v_ship")))

    def row(src: DataFrame, name: String, checked: String, viol: String): DataFrame =
      src.select(lit(name).as("check_name"),
        col(checked).as("n_checked"), col(viol).as("n_violations"))
    row(liAgg, "lineitem_quantity_range", "n", "v_qty")
      .unionByName(row(liAgg, "lineitem_discount_range", "n", "v_disc"))
      .unionByName(row(liAgg, "lineitem_returnflag_domain", "n", "v_flag"))
      .unionByName(row(ordAgg, "orders_totalprice_positive", "n", "v_price"))
      .unionByName(row(ordAgg, "orders_orderkey_unique", "n", "v_dup"))
      .unionByName(row(custAgg, "customer_mktsegment_domain", "n", "v_seg"))
      .unionByName(row(fkCust, "orders_custkey_fk", "n", "v_fk"))
      .unionByName(row(fkOrd, "lineitem_orderkey_fk", "n", "v_fk"))
      .unionByName(row(fkOrd, "lineitem_ship_after_order", "n_matched", "v_ship"))
      .select(col("check_name"), col("n_checked"), col("n_violations"),
        expr("CAST(CAST(CAST(n_violations AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div nullif(n_checked, 0) AS BIGINT)")
          .as("violation_ppm"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("passed"))
  }

  private def dqOracleSql: String =
    """WITH l AS (SELECT count(*) AS n,
      |    count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS v_qty,
      |    count(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS v_disc,
      |    count(*) FILTER (l_returnflag NOT IN ('A','N','R')) AS v_flag
      |  FROM lineitem),
      |o AS (SELECT count(*) AS n,
      |    count(*) FILTER (o_totalprice <= 0) AS v_price,
      |    count(*) - count(DISTINCT o_orderkey) AS v_dup FROM orders),
      |c AS (SELECT count(*) AS n,
      |    count(*) FILTER (c_mktsegment NOT IN
      |      ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'))
      |      AS v_seg FROM customer),
      |fc AS (SELECT count(*) AS n,
      |    count(*) FILTER (c_custkey IS NULL) AS v_fk
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey),
      |fo AS (SELECT count(*) AS n,
      |    count(*) FILTER (o_orderkey IS NULL) AS v_fk,
      |    count(*) FILTER (o_orderkey IS NOT NULL) AS n_matched,
      |    count(*) FILTER (o_orderkey IS NOT NULL
      |      AND l_shipdate < o_orderdate) AS v_ship
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey),
      |rows_ AS (
      |  SELECT 'lineitem_quantity_range' AS check_name, n, v_qty AS v FROM l
      |  UNION ALL SELECT 'lineitem_discount_range', n, v_disc FROM l
      |  UNION ALL SELECT 'lineitem_returnflag_domain', n, v_flag FROM l
      |  UNION ALL SELECT 'orders_totalprice_positive', n, v_price FROM o
      |  UNION ALL SELECT 'orders_orderkey_unique', n, v_dup FROM o
      |  UNION ALL SELECT 'customer_mktsegment_domain', n, v_seg FROM c
      |  UNION ALL SELECT 'orders_custkey_fk', n, v_fk FROM fc
      |  UNION ALL SELECT 'lineitem_orderkey_fk', n, v_fk FROM fo
      |  UNION ALL SELECT 'lineitem_ship_after_order', n_matched, v_ship FROM fo)
      |SELECT check_name, CAST(n AS BIGINT) AS n_checked,
      |  CAST(v AS BIGINT) AS n_violations,
      |  CAST((CAST(v AS HUGEINT) * 1000000) // nullif(n, 0) AS BIGINT)
      |    AS violation_ppm,
      |  CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
      |FROM rows_""".stripMargin

  /** Day capacity of one BIGINT activity bitmask (bit 63 stays clear so
    * shifted masks never touch the sign bit). The corpus spans 30 days;
    * past 63 days a production run keys masks by (user, 63-day epoch) and
    * max-merges — the plan shape is unchanged, so the audit clamps.
    */
  val MaxMaskDays = 63

  /** Retention lags reported (days 1..k). */
  val RetentionLags = 7

  /** N-day return rate via per-user day bitmasks — the roaring-bitmap
    * formulation of retention: ONE aggregate folds each user's activity
    * into a 64-bit mask (`bit_or(1 << day_offset)`), and every lag-k
    * statistic is then a popcount over that register — numerator
    * `popcount(mask & (mask >> k))` (days active at d AND d+k), denominator
    * `popcount(mask & ((1 << (D−k)) − 1))` (days active at d with d+k
    * inside the corpus window). State per user is ONE long regardless of
    * activity volume — this is the shape that holds at 10⁹ users where the
    * events_retention/cohort_matrix joins would shuffle user×day frames;
    * here it is audited exactly against them. All integer; the lag frame is
    * the bounded 7-row literal; one division per output row.
    */
  def eventsBitmapRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val bounds = ev.agg(min(col("day")).as("dmn"), max(col("day")).as("dmx"))
    val masks = ev.crossJoin(broadcast(bounds)) // 1-row corpus-bounds scalar
      .select(col("user_id"), (col("day") - col("dmn")).as("off"),
        least(col("dmx") - col("dmn") + 1, lit(MaxMaskDays.toLong)).as("dc"))
      .filter(col("off") < MaxMaskDays)
      .groupBy(col("user_id"), col("dc"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(off AS INT)))")
        .as("mask"))
    retentionRollup(masks)
  }

  /** Lag-k popcount rollup over a (mask, dc) register frame — shared
    * VERBATIM by the batch audit above and the streaming twin
    * ([[graft.streaming.StreamRetention]]), so stream ≡ batch is the same
    * plan on the same registers, not two restatements.
    */
  private[graft] def retentionRollup(masks: DataFrame): DataFrame =
    masks
      .select(col("mask"), col("dc"),
        explode(array((1 to RetentionLags).map(k => lit(k.toLong)): _*)).as("k"))
      .select(col("k"),
        expr("bit_count(mask & shiftright(mask, CAST(k AS INT)))").as("ret"),
        // dc−k clamps at 0: a shift amount < 0 would wrap mod 64 (Java <<)
        // into a bogus near-full mask when the corpus span or a configured
        // windowDays sits below k+1 days; at 0 the base mask is (1<<0)−1 = 0
        // — the correct "no day has d+k inside the window" answer
        expr("bit_count(mask & (shiftleft(CAST(1 AS BIGINT), " +
          "CAST(greatest(dc - k, 0) AS INT)) - 1))").as("base"))
      .groupBy(col("k"))
      .agg(sum(col("base")).cast("long").as("n_base"),
        sum(col("ret")).cast("long").as("n_returned"))
      .select(col("k"), col("n_base"), col("n_returned"),
        expr("CAST(CAST(CAST(n_returned AS DECIMAL(38,0)) * 1000000 " +
          "AS DECIMAL(38,0)) div nullif(n_base, 0) AS BIGINT)")
          .as("retention_ppm"))

  private def bitmapRetentionOracleSql: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
       |  FROM events),
       |b AS (SELECT min(day) AS dmn, max(day) AS dmx FROM ev),
       |m AS (SELECT user_id, least(dmx - dmn + 1, $MaxMaskDays) AS dc,
       |    bit_or(CAST(1 AS BIGINT) << CAST(day - dmn AS INT)) AS mask
       |  FROM ev, b WHERE day - dmn < $MaxMaskDays GROUP BY 1, 2),
       |x AS (SELECT k,
       |    bit_count(mask & (mask >> CAST(k AS INT))) AS ret,
       |    bit_count(mask &
       |      ((CAST(1 AS BIGINT) << CAST(greatest(dc - k, 0) AS INT)) - 1)) AS base
       |  FROM m, (SELECT unnest(range(1, ${RetentionLags + 1})) AS k) ks),
       |g AS (SELECT k, CAST(sum(base) AS BIGINT) AS n_base,
       |    CAST(sum(ret) AS BIGINT) AS n_returned FROM x GROUP BY 1)
       |SELECT k, n_base, n_returned,
       |  CAST((CAST(n_returned AS HUGEINT) * 1000000)
       |    // nullif(n_base, 0) AS BIGINT) AS retention_ppm
       |FROM g""".stripMargin

  /** ABC class (A = top 80% of revenue, B = next 15%, C = tail) of a
    * customer within one order slice — the exact cum-share algebra
    * customer_abc uses (value-frame prefix sum reproduces the SQL RANGE
    * window's tie semantics; thresholds as integer cross-multiplications).
    */
  private def abcOf(orders: DataFrame): DataFrame = {
    val cust = orders.groupBy(col("o_custkey").as("custkey"))
      .agg((round(sum(col("o_totalprice").cast("decimal(18,4)")), 2) * 100)
        .cast("long").as("rev_cents"))
      .transform(Scale.materialize)
    val byVal = cust.groupBy(col("rev_cents")).agg(sum(col("rev_cents")).as("vsum"))
    val cumAsc = Scale.prefixSum(byVal, "rev_cents", "vsum")
    val total = cust.agg(sum(col("rev_cents")).as("total"))
    cust.join(cumAsc, "rev_cents").join(broadcast(total))
      .withColumn("cumge", col("total") - col("cum") + col("vsum"))
      .select(col("custkey"), col("rev_cents"),
        when(col("cumge") * 5 <= col("total") * 4, lit("A"))
          .when(col("cumge") * 20 <= col("total") * 19, lit("B"))
          .otherwise(lit("C")).as("abc"))
  }

  /** ABC-class migration matrix between the first and second half of the
    * order history (split at the integer midpoint of the corpus's order-
    * date micros — a broadcast 1-row scalar, no literal date): for each
    * (class-in-H1, class-in-H2) cell — `-` meaning no orders that half —
    * the customer count and each half's revenue cents. The churn/upsell
    * summary a mart publishes next to the ABC listing: who moved between
    * the A/B/C tiers, who appeared, who went silent. Two half-corpus ABC
    * passes (each the proven customer_abc plan), one full-outer key join,
    * and a ≤4×4-cell rollup.
    */
  def customerAbcMigration(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice"),
      unix_date(to_date(col("o_orderdate"))).as("dy"))
    val mid = ord.agg(expr("(min(dy) + max(dy)) div 2").as("mid"))
    val withMid = ord.crossJoin(broadcast(mid)) // 1-row corpus-bounds scalar
    val h1 = abcOf(withMid.filter(col("dy") <= col("mid")))
      .select(col("custkey"), col("abc").as("abc_from"), col("rev_cents").as("rev1"))
    val h2 = abcOf(withMid.filter(col("dy") > col("mid")))
      .select(col("custkey"), col("abc").as("abc_to"), col("rev_cents").as("rev2"))
    h1.join(h2, Seq("custkey"), "full_outer")
      .select(coalesce(col("abc_from"), lit("-")).as("abc_from"),
        coalesce(col("abc_to"), lit("-")).as("abc_to"),
        coalesce(col("rev1"), lit(0L)).as("rev1"),
        coalesce(col("rev2"), lit(0L)).as("rev2"))
      .groupBy(col("abc_from"), col("abc_to"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev1")).as("rev_cents_h1"),
        sum(col("rev2")).as("rev_cents_h2"))
  }

  private def abcMigrationOracleSql: String = {
    def half(name: String, cond: String): String =
      s"""${name}c AS (SELECT o_custkey AS custkey,
         |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) * 100
         |      AS BIGINT) AS rev_cents
         |  FROM orders, b WHERE $cond GROUP BY 1),
         |${name}t AS (SELECT sum(rev_cents) AS total FROM ${name}c),
         |$name AS (SELECT custkey, rev_cents,
         |    CASE WHEN cumge * 5 <= total * 4 THEN 'A'
         |         WHEN cumge * 20 <= total * 19 THEN 'B' ELSE 'C' END AS abc
         |  FROM (SELECT custkey, rev_cents,
         |      sum(rev_cents) OVER (ORDER BY rev_cents DESC) AS cumge
         |    FROM ${name}c) w, ${name}t)""".stripMargin
    s"""WITH b AS (SELECT (min(CAST(o_orderdate AS DATE) - DATE '1970-01-01') +
       |    max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')) // 2 AS mid
       |  FROM orders),
       |${half("h1", "CAST(o_orderdate AS DATE) - DATE '1970-01-01' <= mid")},
       |${half("h2", "CAST(o_orderdate AS DATE) - DATE '1970-01-01' > mid")}
       |SELECT coalesce(h1.abc, '-') AS abc_from,
       |  coalesce(h2.abc, '-') AS abc_to,
       |  count(*) AS n_customers,
       |  CAST(sum(coalesce(h1.rev_cents, 0)) AS BIGINT) AS rev_cents_h1,
       |  CAST(sum(coalesce(h2.rev_cents, 0)) AS BIGINT) AS rev_cents_h2
       |FROM h1 FULL OUTER JOIN h2 ON h1.custkey = h2.custkey
       |GROUP BY 1, 2""".stripMargin
  }

  /** Greedy rounds for supplier set cover. */
  val SetCoverRounds = 8

  /** The covered set rides the anti-join as a BROADCAST while it holds at
    * most this many partkeys (32 MB of longs): the set is bounded by
    * Σ n_new ≤ K · max-parts-per-supplier, a few hundred keys on any
    * TPC-H-shaped graph, so the hint virtually always applies — past the
    * budget the round falls back to the shuffle anti-join unhinted (AQE
    * decides), never to a driver-killing broadcast.
    */
  val CoverBroadcastRows = 4L * 1000 * 1000

  /** Greedy supplier set cover over the supplier→part bipartite graph (the
    * classic (1−1/e) sourcing-consolidation question: which K suppliers
    * cover the most distinct parts?): each round counts UNCOVERED parts
    * per supplier over the distinct edge frame (one anti-join + one
    * map-side-partial agg), picks the argmax (ties to the lowest suppkey),
    * and folds its parts into the covered set. Driver state is the K picks
    * only — bounded like embed_kcenter's centers; the covered frame stays
    * distributed (a tiny partkey register, re-materialized per round so
    * round r+1 reads a settled subtree, not an r-deep plan chain).
    *
    * The big side never shuffles: `covered` is bounded by Σ n_new (the
    * picks' own coverage counts — known values, not an estimate), so the
    * per-round uncovered filter is a BROADCAST anti-join over one columnar
    * scan of the edge frame. The round-12 shape instead exchanged the full
    * SF-scaled edge relation on partkey every round AND re-distinct'ed the
    * covered set (K big shuffles + K distincts); it was the slowest
    * registry query at every SF (115 s / 6.0× per 10× at sf10). The
    * distinct also drops: remaining's parts are disjoint from covered by
    * construction, and one supplier's partkeys are unique in a distinct
    * edge frame. Rounds stop early when coverage exhausts — the oracle's
    * round-r CTE is empty in exactly that case, so both engines emit the
    * same rows.
    */
  def supplierSetCover(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // DURABLE (parquet) materialization for the edge frame, not
    // localCheckpoint: local-checkpointed blocks are unevictable, and
    // pinning an SF-scaled edge relation for all K rounds starves execution
    // memory (measured: SparkOutOfMemory in the late rounds at 100× the
    // gate SF). The loop re-reads edges 2×K times; a columnar re-read
    // scales, a pinned block cache does not. An explicit write+read-back
    // (instead of the r15 Dataset.checkpoint) computes the distinct ONCE —
    // the reliable-checkpoint protocol re-runs its subtree for the write
    // job — and the files are reclaimed as soon as the greedy state is
    // driver-resident.
    val tmp = java.nio.file.Files.createTempDirectory("graft_setcover_")
    try {
      Tables.lineitem(s, d)
        .select(col("l_suppkey").as("suppkey"), col("l_partkey").as("partkey"))
        .distinct()
        .write.parquet(s"$tmp/edges")
      val edges = s.read.parquet(s"$tmp/edges")
      // the covered register stays a DRIVER array while it holds at most
      // CoverBroadcastRows partkeys (bounded by Σ n_new — known values, the
      // same budget the r15 broadcast hint used): each round then reads a
      // broadcast local relation instead of a materialized distributed
      // union chain, dropping the per-round checkpoint fence. Past the
      // budget it degrades to exactly the r15 distributed register.
      var coveredSet: Array[Long] = Array.empty
      var coveredDf: Option[DataFrame] = None
      var chosen = Vector.empty[(Int, Long, Long, Long)]
      var done = false
      for (r <- 1 to SetCoverRounds if !done) {
        val nCovered = chosen.lastOption.map(_._4).getOrElse(0L)
        val rhs = coveredDf
          .getOrElse(broadcast(coveredSet.toSeq.toDF("partkey")))
        val remaining = edges.join(rhs, Seq("partkey"), "left_anti")
        val best = remaining.groupBy(col("suppkey"))
          .agg(count(lit(1)).as("n_new"))
          .orderBy(col("n_new").desc, col("suppkey").asc)
          .limit(1).collect() // bounded greedy state: 1 row per round
        if (best.isEmpty) done = true
        else {
          val (sk, nNew) = (best(0).getLong(0), best(0).getLong(1))
          chosen = chosen :+ ((r, sk, nNew, nCovered + nNew))
          val picked = remaining.filter(col("suppkey") === sk)
            .select(col("partkey"))
          if (coveredDf.isEmpty && nCovered + nNew <= CoverBroadcastRows)
            coveredSet = coveredSet ++ picked.collect().map(_.getLong(0))
          else
            coveredDf = Some(Scale.materialize(coveredDf
              .getOrElse(coveredSet.toSeq.toDF("partkey"))
              .unionByName(picked)))
        }
      }
      chosen.toDF("round", "suppkey", "n_new_parts", "n_covered")
    } finally {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(tmp)
      try w.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally w.close()
    }
  }

  private def setCoverOracleSql: String = {
    val rounds = (1 to SetCoverRounds).map { r =>
      val src = if (r == 1) "e" else s"r$r"
      val rem = if (r == 1) ""
      else s"""r$r AS MATERIALIZED (SELECT e.suppkey, e.partkey FROM e
              |  ANTI JOIN c${r - 1} USING (partkey)),
              |""".stripMargin
      val cov = if (r == 1) s"SELECT DISTINCT partkey FROM e JOIN p1 USING (suppkey)"
      else s"""SELECT partkey FROM c${r - 1}
              |  UNION SELECT partkey FROM r$r JOIN p$r USING (suppkey)""".stripMargin
      s"""${rem}p$r AS MATERIALIZED (SELECT suppkey, count(*) AS n_new
         |  FROM $src GROUP BY 1 ORDER BY n_new DESC, suppkey LIMIT 1),
         |c$r AS MATERIALIZED ($cov)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to SetCoverRounds).map { r =>
      s"""SELECT CAST($r AS INT) AS round, suppkey,
         |  CAST(n_new AS BIGINT) AS n_new_parts,
         |  (SELECT count(*) FROM c$r) AS n_covered FROM p$r""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS suppkey,
       |    l_partkey AS partkey FROM lineitem),
       |$rounds
       |$sel""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_expectations" -> dqExpectations,
    "events_bitmap_retention" -> eventsBitmapRetention,
    "customer_abc_migration" -> customerAbcMigration,
    "supplier_set_cover" -> supplierSetCover,
  )

  val oracles: Map[String, String] = Map(
    "dq_expectations" -> dqOracleSql,
    "events_bitmap_retention" -> bitmapRetentionOracleSql,
    "customer_abc_migration" -> abcMigrationOracleSql,
    "supplier_set_cover" -> setCoverOracleSql,
  )
}
