package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.detRound
import graft.functions.PortableHash.{hexH, hexHSql, hmod, affine, affineSql, P}

/** Portable mergeable sketches as relational plans — HyperLogLog distinct
  * counting and Count-Min frequency estimation, computed bit-identically in
  * Spark and the DuckDB oracle (no engine-native approx functions on the
  * gated path; `approx_aggregates` covers Spark's own
  * `approx_count_distinct`/`percentile_approx` under a spec instead).
  *
  * Why this exists at 100 TB: both sketches are COMMUTATIVE-MONOID state —
  * HLL registers merge by per-bucket max, CM counters merge by per-cell sum
  * — so a `groupBy` over them is all map-side partial aggregation: the
  * shuffle carries one bounded register/counter table per group, never the
  * raw identity stream. That is the only shape a 10^12-row distinct-count or
  * heavy-hitter scan can take on a shared-nothing cluster. The merge step is
  * not simulated: `events_approx_distinct` derives its corpus-wide `_all`
  * row by max-merging the per-group REGISTER TABLES (never rescanning raw
  * events), exercising the monoid the way a 1000-executor tree-reduce would.
  *
  * Determinism across engines: the hash family is [[graft.functions.PortableHash]]
  * (md5-based, shared literal coefficients), register math stays in BIGINT
  * (2^(55-M_j) register sums, integer counters), and the only doubles are
  * final ratios of identical integers under explicitly-parenthesized IEEE
  * association — so the DuckDB restatement is hash-exact, including the
  * sketches' own estimation error.
  *
  * Reference anchor: the reference's ClickHouse mart role (init-clickhouse
  * .sql) is the natural consumer of `uniq`/`topK`-style approximations;
  * these are the portable Spark-side twins (cf. `events_topk_sketch`, the
  * Misra-Gries native aggregate).
  */
object Sketches {

  // ------------------------------------------------------------------ HLL
  /** Registers m = 64 (6 bucket bits off a 60-bit md5 hash, 54-bit rest).
    * rho = 55 - bitlen(rest) ∈ [1, 54] (rest = 0, probability 2^-54, maps
    * to 54 rather than the conventional 55 — both engines share the
    * convention, so parity is unaffected). alpha_64 = 0.709, the published
    * constant (Flajolet et al., 2007). Small-range correction (raw ≤ 2.5m
    * and empty registers present) uses linear counting m·ln(m/V) — but ln
    * is libm-implementation-defined, so instead of calling it at query
    * time the 64 possible values (V ∈ 1..64) are DRIVER-COMPUTED ONCE and
    * embedded as the same literal doubles in both engines (the
    * literal-model pattern of knn_ivf/embed_pca): cross-engine parity
    * stays exact with zero transcendental calls in either plan.
    */
  val HllM = 64
  val HllAlpha = 0.709
  /** Linear-counting table: lc(V) = m·ln(m/V), V = 1..64 (V = 0 never
    * routes here — the raw estimator is used when no register is empty).
    */
  val HllLc: IndexedSeq[Double] =
    (1 to HllM).map(v => HllM.toDouble * math.log(HllM.toDouble / v))
  /** Raw-vs-linear-counting switch point, the published 2.5·m. */
  val HllLcCut = 2.5 * HllM
  /** 2^55 — scales Σ 2^-M_j into exact BIGINT territory. */
  private val TwoP55 = "36028797018963968"

  def eventsApproxDistinct(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // (event_type, bucket, rho) per event; register = max(rho) per bucket
    val rows = ev
      .select(col("event_type"), col("user_id"),
        hexH(concat(lit("hll:"), col("user_id"))).as("h"))
      .select(col("event_type"), col("user_id"),
        (col("h") % HllM).as("bucket"), expr(s"h div $HllM").as("rest"))
    val reg = rows
      .withColumn("rho", (lit(55) - length(bin(col("rest")))).cast("int"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
    // corpus-wide registers by MERGING the per-type register table (max per
    // bucket) — the monoid step, no raw-event rescan
    val regAll = reg.groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
      .select(lit("_all").as("event_type"), col("bucket"), col("mj"))
    val est = reg.unionByName(regAll)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mj AS INT))")).as("psum"))
      .select(col("event_type"),
        (lit(HllM.toLong) - col("present")).as("v_zero"),
        (col("psum") + (lit(HllM.toLong) - col("present")) * expr(s"CAST($TwoP55 AS BIGINT)"))
          .as("reg_sum"))
      .withColumn("raw_est",
        (lit(HllAlpha) * lit(HllM.toDouble * HllM)) *
          (lit(TwoP55.toDouble) / col("reg_sum").cast("double")))
      .withColumn("hll_est", detRound(
        when(col("raw_est") <= lit(HllLcCut) && col("v_zero") > 0,
          element_at(typedlit(HllLc), col("v_zero").cast("int")))
          .otherwise(col("raw_est")), 2))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    val exactAll = ev.agg(countDistinct(col("user_id")).as("n_exact"))
      .select(lit("_all").as("event_type"), col("n_exact"))
    est.join(exact.unionByName(exactAll), "event_type")
      .select(col("event_type"), col("n_exact"), col("v_zero"), col("reg_sum"),
        col("hll_est"),
        detRound((col("hll_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double") * lit(100.0), 2).as("err_pct"))
  }

  /** Double literal that DuckDB parses as DOUBLE (not DECIMAL): Scala's
    * toString round-trips, and the e-suffix forces float parsing — so the
    * oracle reads back the exact bits the Spark literal carries.
    */
  private def dlit(x: Double): String = {
    val s = x.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  private val hllOracleSql: String = {
    val h = hexHSql("'hll:' || user_id")
    s"""WITH rows_ AS (SELECT event_type, user_id,
       |    ($h) % $HllM AS bucket, ($h) // $HllM AS rest FROM events),
       |reg AS (SELECT event_type, bucket, max(55 - length(bin(rest))) AS mj
       |  FROM rows_ GROUP BY 1, 2),
       |reg2 AS (SELECT * FROM reg
       |  UNION ALL SELECT '_all', bucket, max(mj) FROM reg GROUP BY 2),
       |est AS (SELECT event_type,
       |    $HllM - count(*) AS v_zero,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - mj AS INT))
       |      + ($HllM - count(*)) * CAST($TwoP55 AS BIGINT) AS BIGINT) AS reg_sum
       |  FROM reg2 GROUP BY 1),
       |est1 AS (SELECT event_type, v_zero, reg_sum,
       |    ((${HllAlpha}e0) * (${HllM * HllM}e0)) *
       |      ((${TwoP55}e0) / CAST(reg_sum AS DOUBLE)) AS raw_est
       |  FROM est),
       |est2 AS (SELECT event_type, v_zero, reg_sum,
       |    floor((CASE WHEN raw_est <= ${dlit(HllLcCut)} AND v_zero > 0
       |      THEN ([${HllLc.map(dlit).mkString(", ")}])[CAST(v_zero AS INT)]
       |      ELSE raw_est END) * 1e2) / 1e2 AS hll_est
       |  FROM est1),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
       |    FROM events GROUP BY 1
       |  UNION ALL SELECT '_all', count(DISTINCT user_id) FROM events)
       |SELECT est2.event_type, n_exact, v_zero, reg_sum, hll_est,
       |  floor(((hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
       |    * 100e0) * 1e2) / 1e2 AS err_pct
       |FROM est2 JOIN ex USING (event_type)""".stripMargin
  }

  // ------------------------------------------------- HLL sliding window
  /** Trailing window width (days) — matches events_wau, its exact twin. */
  val HllWinDays = 7

  /** 7-day sliding distinct users per day via HLL REGISTER-TABLE merges —
    * the scale path for `events_wau`'s exact sliding distinct. Per day the
    * sketch build keeps 64 registers; each day's register table then
    * contributes to the 7 window ends it falls inside, and the window
    * estimate max-merges those ≤ 7 tables — so the sliding-window state is
    * O(days x 64) REGARDLESS of user cardinality, where the exact form
    * shuffles every (day, user) pair 7 times. This is exactly how a
    * 1000-executor daily-uniques dashboard slides at 10^12 events: merge
    * yesterday's registers, never rescan yesterday's users. The exact
    * count rides along as the audit column (same fan-out as events_wau).
    *
    * Determinism: identical register math to [[eventsApproxDistinct]]
    * (integer registers, literal linear-counting table, parenthesized
    * final ratios) — the oracle is hash-exact including the sketch error.
    */
  def eventsHllSliding(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val days = ev.select(to_date(col("ts")).as("day"), col("user_id"))
    val bounds = days.agg(max(col("day")).as("hi"))
    val reg = days
      .select(col("day"), hexH(concat(lit("hll:"), col("user_id"))).as("h"))
      .select(col("day"), (col("h") % HllM).as("bucket"), expr(s"h div $HllM").as("rest"))
      .withColumn("rho", (lit(55) - length(bin(col("rest")))).cast("int"))
      .groupBy(col("day"), col("bucket")).agg(max(col("rho")).as("mj"))
    // slide: each day's register table max-merges into window ends day..day+6
    val slid = reg
      .select(col("day"), col("bucket"), col("mj"),
        explode(sequence(lit(0), lit(HllWinDays - 1))).as("off"))
      .select(date_add(col("day"), col("off")).as("wday"), col("bucket"), col("mj"))
      .join(broadcast(bounds))
      .filter(col("wday") <= col("hi"))
      .groupBy(col("wday"), col("bucket")).agg(max(col("mj")).as("mj"))
    val est = slid.groupBy(col("wday"))
      .agg(count(lit(1)).as("present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mj AS INT))")).as("psum"))
      .select(col("wday"),
        (lit(HllM.toLong) - col("present")).as("v_zero"),
        (col("psum") + (lit(HllM.toLong) - col("present")) * expr(s"CAST($TwoP55 AS BIGINT)"))
          .as("reg_sum"))
      .withColumn("raw_est",
        (lit(HllAlpha) * lit(HllM.toDouble * HllM)) *
          (lit(TwoP55.toDouble) / col("reg_sum").cast("double")))
      .withColumn("hll_est", detRound(
        when(col("raw_est") <= lit(HllLcCut) && col("v_zero") > 0,
          element_at(typedlit(HllLc), col("v_zero").cast("int")))
          .otherwise(col("raw_est")), 2))
    val exact = days.distinct()
      .select(col("day"), col("user_id"),
        explode(sequence(lit(0), lit(HllWinDays - 1))).as("off"))
      .select(date_add(col("day"), col("off")).as("wday"), col("user_id"))
      .join(broadcast(bounds))
      .filter(col("wday") <= col("hi"))
      .groupBy(col("wday")).agg(countDistinct(col("user_id")).as("n_exact"))
    est.join(exact, "wday")
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"),
        col("n_exact"), col("v_zero"), col("reg_sum"), col("hll_est"),
        detRound((col("hll_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double") * lit(100.0), 2).as("err_pct"))
  }

  private val hllSlidingOracleSql: String = {
    val h = hexHSql("'hll:' || user_id")
    s"""WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
       |b AS (SELECT max(day) AS hi FROM ev),
       |rows_ AS (SELECT day, ($h) % $HllM AS bucket, ($h) // $HllM AS rest
       |  FROM ev),
       |reg AS (SELECT day, bucket, max(55 - length(bin(rest))) AS mj
       |  FROM rows_ GROUP BY 1, 2),
       |sl AS (SELECT day + CAST(off AS INTEGER) AS wday, bucket, mj
       |  FROM reg, (SELECT unnest(range(0, $HllWinDays)) AS off) o),
       |sl2 AS (SELECT wday, bucket, max(mj) AS mj
       |  FROM sl, b WHERE wday <= hi GROUP BY 1, 2),
       |est AS (SELECT wday,
       |    $HllM - count(*) AS v_zero,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - mj AS INT))
       |      + ($HllM - count(*)) * CAST($TwoP55 AS BIGINT) AS BIGINT) AS reg_sum
       |  FROM sl2 GROUP BY 1),
       |est1 AS (SELECT wday, v_zero, reg_sum,
       |    ((${HllAlpha}e0) * (${HllM * HllM}e0)) *
       |      ((${TwoP55}e0) / CAST(reg_sum AS DOUBLE)) AS raw_est
       |  FROM est),
       |est2 AS (SELECT wday, v_zero, reg_sum,
       |    floor((CASE WHEN raw_est <= ${dlit(HllLcCut)} AND v_zero > 0
       |      THEN ([${HllLc.map(dlit).mkString(", ")}])[CAST(v_zero AS INT)]
       |      ELSE raw_est END) * 1e2) / 1e2 AS hll_est
       |  FROM est1),
       |du AS (SELECT DISTINCT day, user_id FROM ev),
       |exw AS (SELECT day + CAST(off AS INTEGER) AS wday, user_id
       |  FROM du, (SELECT unnest(range(0, $HllWinDays)) AS off) o),
       |ex AS (SELECT wday, count(DISTINCT user_id) AS n_exact
       |  FROM exw, b WHERE wday <= hi GROUP BY 1)
       |SELECT strftime(est2.wday, '%Y-%m-%d') AS day, n_exact, v_zero,
       |  reg_sum, hll_est,
       |  floor(((hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
       |    * 100e0) * 1e2) / 1e2 AS err_pct
       |FROM est2 JOIN ex USING (wday)""".stripMargin
  }

  // ------------------------------------------------------------ Count-Min
  /** Depth 4 × width 256 counter grid over (event_type, user_id) items
    * (~750 distinct at sf0.01 — wider than the grid, so collisions are
    * real and the one-sided overcount is visible, not degenerate).
    * Point estimate = min over the 4 rows of the probed counters
    * (Cormode & Muthukrishnan, 2005); est ≥ exact always, and the
    * overcount column audits the sketch against the exact counts.
    *
    * Scale: the sketch build is a groupBy over (depth, bucket) — 1,024
    * cells regardless of corpus size, fully map-side partial (counter
    * merge IS addition); the probe side joins the DISTINCT item frame
    * (bounded by cardinality, not event count) against those 1,024 rows.
    */
  val CmDepth = 4
  val CmWidth = 256

  def eventsCountMin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(concat(col("event_type"), lit(":"), col("user_id")).as("item"))
    val hm = hmod(concat(lit("cm:"), col("item")))
    val probes = (i: DataFrame) => i
      .withColumn("hm", hm)
      .select(col("*"), explode(array((0 until CmDepth).map(j =>
        struct(lit(j).as("i"), (affine(j, col("hm")) % CmWidth).as("bucket"))): _*)).as("p"))
      .select(i.columns.map(col) :+ col("p.i").as("i") :+ col("p.bucket").as("bucket"): _*)
    val sketch = probes(ev).groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val dist = ev.groupBy(col("item")).agg(count(lit(1)).as("n_exact"))
    probes(dist).join(sketch, Seq("i", "bucket"))
      .groupBy(col("item"), col("n_exact"))
      .agg(min(col("cnt")).as("cm_est"))
      .select(col("item"), col("n_exact"), col("cm_est"),
        (col("cm_est") - col("n_exact")).as("overcount"))
  }

  private val cmOracleSql: String = {
    val hm = s"(${hexHSql("'cm:' || item")}) % $P"
    val probeList = (0 until CmDepth)
      .map(j => s"(${affineSql(j, "hm")}) % $CmWidth").mkString(", ")
    s"""WITH it AS (SELECT event_type || ':' || user_id AS item FROM events),
       |h AS (SELECT item, $hm AS hm FROM it),
       |pr AS (SELECT item, unnest(range(0, $CmDepth)) AS i,
       |    unnest([$probeList]) AS bucket FROM h),
       |sk AS (SELECT i, bucket, count(*) AS cnt FROM pr GROUP BY 1, 2),
       |ex AS (SELECT item, count(*) AS n_exact FROM it GROUP BY 1),
       |eh AS (SELECT item, n_exact, $hm AS hm FROM ex),
       |ep AS (SELECT item, n_exact, unnest(range(0, $CmDepth)) AS i,
       |    unnest([$probeList]) AS bucket FROM eh),
       |est AS (SELECT item, n_exact, min(cnt) AS cm_est
       |  FROM ep JOIN sk USING (i, bucket) GROUP BY 1, 2)
       |SELECT item, n_exact, cm_est, cm_est - n_exact AS overcount
       |FROM est""".stripMargin
  }

  // ------------------------------------------------------------------ KMV
  /** Bottom-K / K-minimum-values sketch (Bar-Yossef et al. 2002; the theta-
    * sketch family) per event_type over user_id, plus pairwise SET-OPERATION
    * estimates — the audience-overlap question ("how many users do view and
    * purchase share?") that HLL cannot answer (HLL unions but does not
    * intersect without inclusion-exclusion error blowup).
    *
    * Per type: the K=64 smallest DISTINCT 60-bit hashes; distinct estimate
    * (K-1)·2^60 / h_(K) (unbiased KMV), exact when the type has < K users.
    * Per pair: the merged bottom-K of the union gives theta = h_(K); for
    * h ≤ theta, membership in a type's SKETCH ⟺ membership in its SET
    * (theta ≤ both kth minima), so `n_common` — merged-K rows present in
    * both sketches — estimates |A∩B| as (n_common/K)·est_union, and
    * n_common/K is a direct Jaccard estimate. Exact intersections ride
    * along as the audit column (the bounded distinct (type,user) frame
    * self-joined — types² fan-out, never events²).
    *
    * Scale: one distinct partial-agg over (type, hash); bottom-K per type
    * via the two-phase `Scale.topKPerGroup` (no type-sized sort partition);
    * everything after operates on K·types rows. Sketch merge is "union the
    * rows, re-take bottom-K" — a commutative monoid, so a 1000-executor
    * tree-reduce ships K-row tables, never user streams.
    *
    * Determinism: hashes and counts are integers; the only doubles are
    * (exact-literal)/(integer-cast) divisions and one product, parenthesized
    * identically in both engines, then floor-rounded (detRound).
    */
  val KmvK = 64
  /** 2^60, the hexH hash space — exact in double. */
  private val KmvSpace = math.pow(2.0, 60)
  /** (K-1)·2^60 — 63 needs 6 significand bits, so the product is exact. */
  private val KmvNum = (KmvK - 1).toDouble * KmvSpace

  def eventsKmvOverlap(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hashed = ev
      .select(col("event_type"),
        hexH(concat(lit("kmv:"), col("user_id"))).as("h"))
      .distinct()
    val sk = Scale.materialize(
      Scale.topKPerGroup(hashed, Seq("event_type"), Seq(col("h").asc),
        KmvK, col("h")).drop("rnk"))
    val rawEst = (kt: Column, kth: Column) =>
      when(kt < KmvK, kt.cast("double"))
        .otherwise(lit(KmvNum) / kth.cast("double"))
    val per = sk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k_t"), max(col("h")).as("kth"))
      .select(col("event_type"),
        rawEst(col("k_t"), col("kth")).as("est_raw"))
    val types = sk.select(col("event_type")).distinct()
    val tp = types.as("x").join(types.as("y"),
        col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
    val ua = tp.join(sk.withColumnRenamed("event_type", "type_a"), "type_a")
      .select(col("type_a"), col("type_b"), col("h"))
    val ub = tp.join(sk.withColumnRenamed("event_type", "type_b"), "type_b")
      .select(col("type_a"), col("type_b"), col("h"))
    // nsrc = 2 ⟺ the hash sits in BOTH sketches (⟺ both sets, once h ≤ theta)
    val uh = ua.unionByName(ub)
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(count(lit(1)).as("nsrc"))
    val ur = uh.withColumn("r", row_number().over(
      Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("h"))))
    val uk = ur.filter(col("r") <= KmvK)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("k_union"), max(col("h")).as("theta"),
        sum(when(col("nsrc") === 2, 1L).otherwise(0L)).as("n_common"))
    val tu = ev.select(col("event_type"), col("user_id")).distinct()
    val exi = tu.as("p").join(tu.as("q"),
        col("p.user_id") === col("q.user_id") &&
          col("p.event_type") < col("q.event_type"))
      .groupBy(col("p.event_type").as("type_a"), col("q.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    uk
      .join(per.select(col("event_type").as("type_a"), col("est_raw").as("_ea")), "type_a")
      .join(per.select(col("event_type").as("type_b"), col("est_raw").as("_eb")), "type_b")
      .join(exi, Seq("type_a", "type_b"), "left")
      .withColumn("union_raw", rawEst(col("k_union"), col("theta")))
      .select(col("type_a"), col("type_b"), col("k_union"), col("theta"),
        col("n_common"),
        detRound(col("_ea"), 2).as("est_a"),
        detRound(col("_eb"), 2).as("est_b"),
        detRound(col("union_raw"), 2).as("est_union"),
        detRound((col("n_common").cast("double") / col("k_union").cast("double"))
          * col("union_raw"), 2).as("est_inter"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        detRound(col("n_common").cast("double") / col("k_union").cast("double"), 4)
          .as("jaccard_est"))
  }

  private val kmvOracleSql: String = {
    val h = hexHSql("'kmv:' || user_id")
    val est = (kt: String, kth: String) =>
      s"CASE WHEN $kt < $KmvK THEN CAST($kt AS DOUBLE) " +
        s"ELSE (${dlit(KmvNum)}) / CAST($kth AS DOUBLE) END"
    s"""WITH hs AS (SELECT DISTINCT event_type, ($h) AS h FROM events),
       |rk AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS r FROM hs),
       |sk AS (SELECT event_type, h FROM rk WHERE r <= $KmvK),
       |per AS (SELECT event_type, count(*) AS k_t, max(h) AS kth
       |  FROM sk GROUP BY 1),
       |est AS (SELECT event_type, ${est("k_t", "kth")} AS est_raw FROM per),
       |ty AS (SELECT DISTINCT event_type FROM sk),
       |tp AS (SELECT x.event_type AS type_a, y.event_type AS type_b
       |  FROM ty x JOIN ty y ON x.event_type < y.event_type),
       |uh AS (SELECT type_a, type_b, h, count(*) AS nsrc FROM (
       |    SELECT type_a, type_b, s.h FROM tp JOIN sk s ON s.event_type = type_a
       |    UNION ALL
       |    SELECT type_a, type_b, s.h FROM tp JOIN sk s ON s.event_type = type_b)
       |  GROUP BY 1, 2, 3),
       |ur AS (SELECT type_a, type_b, h, nsrc,
       |    row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS r FROM uh),
       |uk AS (SELECT type_a, type_b, count(*) AS k_union, max(h) AS theta,
       |    CAST(sum(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
       |  FROM ur WHERE r <= $KmvK GROUP BY 1, 2),
       |tu AS (SELECT DISTINCT event_type, user_id FROM events),
       |exi AS (SELECT p.event_type AS type_a, q.event_type AS type_b,
       |    count(*) AS exact_inter
       |  FROM tu p JOIN tu q
       |    ON p.user_id = q.user_id AND p.event_type < q.event_type
       |  GROUP BY 1, 2),
       |un AS (SELECT uk.*, ${est("k_union", "theta")} AS union_raw FROM uk)
       |SELECT un.type_a, un.type_b, k_union, theta, n_common,
       |  floor(ea.est_raw * 1e2) / 1e2 AS est_a,
       |  floor(eb.est_raw * 1e2) / 1e2 AS est_b,
       |  floor(union_raw * 1e2) / 1e2 AS est_union,
       |  floor(((CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE))
       |    * union_raw) * 1e2) / 1e2 AS est_inter,
       |  coalesce(exact_inter, 0) AS exact_inter,
       |  floor((CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE)) * 1e4) / 1e4
       |    AS jaccard_est
       |FROM un
       |JOIN est ea ON ea.event_type = un.type_a
       |JOIN est eb ON eb.event_type = un.type_b
       |LEFT JOIN exi ON exi.type_a = un.type_a AND exi.type_b = un.type_b""".stripMargin
  }

  // ------------------------------------------------- quantile sketch (DD)
  /** Mergeable relative-error quantile sketch (the DDSketch role, Masson et
    * al. VLDB 2019) with a PURE-INTEGER bucket function both engines share:
    * values in cents, bucket = exact singleton for v < 8, else
    * (bitlen−1)·8 + (top-3-bits-after-MSB) — i.e. log₂ with 8 subdivisions
    * per octave, computed from `length(bin(v))` and shifts, no logarithm
    * anywhere. A bucket [lo, lo+w) has w ≤ lo/8, and the representative is
    * the bucket midpoint, so every estimate is within 1/16 relative error
    * by CONSTRUCTION (spec-pinned at 62,500 ppm).
    *
    * Why this is the 100 TB quantile: percentile_exact needs a per-group
    * sort; this sketch is a (type, bucket) count-agg — ≤ ~512 cells per
    * type at ANY corpus size, counter merge IS addition, so it partial-aggs
    * map-side and tree-reduces like the HLL/CM sketches above. Quantile
    * extraction is a window over the bounded bucket frame. The exact
    * discrete quantiles ride along as the audit — computed on the (type,
    * cents-VALUE) frame (bounded by the price alphabet, not the corpus) via
    * the same rank-window-on-value-frame discipline as events_key_skew.
    *
    * Both engines run identical integer arithmetic end to end (targets
    * ceil(q·n) in integer form, ppm errors by integer division) — the gate
    * hashes the sketch's estimation error itself.
    */
  /** (event_type, v cents) frame for the sketch — shared by the batch query
    * and the streaming twin.
    */
  def quantileCents(ev: DataFrame): DataFrame = ev
    .select(col("event_type"), expr("CAST(floor(value * 1e2) AS BIGINT)").as("v"))
    .filter(col("v") >= 1)

  /** The sketch state: (event_type, idx, cnt) counter table. A plain count
    * aggregation — exactly the state shape a streaming Complete-mode agg
    * keeps, ≤ ~512 rows per type at any corpus size.
    */
  def quantileBuckets(cents: DataFrame): DataFrame = {
    val idx = expr("""CASE WHEN v < 8 THEN v
      ELSE (length(bin(v)) - 1) * 8 + (shiftright(v, length(bin(v)) - 4) & 7)
      END""")
    cents.withColumn("idx", idx)
      .groupBy(col("event_type"), col("idx")).agg(count(lit(1)).as("cnt"))
  }

  /** Quantile extraction over a bucket table + the exact audit over the raw
    * cents frame (both bounded-frame windows). A corpus-wide `_all` group
    * is derived by MERGING the per-type bucket tables (sum per bucket — the
    * counter-monoid step, same discipline as the HLL `_all` row), never by
    * rescanning raw events; the exact audit merges the per-type value
    * frames the same way.
    */
  def quantileExtract(bucketTable0: DataFrame, cents: DataFrame): DataFrame = {
    // both the per-type rows and the _all merge read the bucket table —
    // materialize once or the build (a full corpus agg in the batch path)
    // runs twice
    val bt = Scale.materialize(bucketTable0)
    val bucketTable = bt.unionByName(
      bt.groupBy(col("idx")).agg(sum(col("cnt")).as("cnt"))
        .select(lit("_all").as("event_type"), col("idx"), col("cnt")))
    val rep = expr("""CASE WHEN idx < 8 THEN idx ELSE
      shiftleft(8 + idx % 8, CAST(idx div 8 AS INT) - 3)
        + (CASE WHEN idx div 8 >= 4
           THEN shiftleft(CAST(1 AS BIGINT), CAST(idx div 8 AS INT) - 4)
           ELSE CAST(0 AS BIGINT) END)
      END""")
    val wIdx = Window.partitionBy(col("event_type")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("event_type"))
    val cum = bucketTable.withColumn("rep", rep)
      .withColumn("cum", sum(col("cnt")).over(wIdx))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val qs = typedlit(Seq("p50", "p90", "p99"))
    val target = expr("""CASE q WHEN 'p50' THEN (n * 1 + 1) div 2
      WHEN 'p90' THEN (n * 9 + 9) div 10 ELSE (n * 99 + 99) div 100 END""")
    val sketchQ = cum.withColumn("q", explode(qs))
      .withColumn("target", target)
      .filter(col("cum") >= col("target"))
      .groupBy(col("event_type"), col("q"))
      // rep is monotone in idx, so min(rep) IS the first qualifying bucket
      .agg(min(col("rep")).as("sketch_cents"), max(col("n")).as("n"))
    val valFrame = Scale.materialize(
      cents.groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt")))
    val exactCum = valFrame.unionByName(
        valFrame.groupBy(col("v")).agg(sum(col("cnt")).as("cnt"))
          .select(lit("_all").as("event_type"), col("v"), col("cnt")))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val exactQ = exactCum.withColumn("q", explode(qs))
      .withColumn("target", target)
      .filter(col("cum") >= col("target"))
      .groupBy(col("event_type"), col("q"))
      .agg(min(col("v")).as("exact_cents"))
    sketchQ.join(exactQ, Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("n"),
        col("sketch_cents"), col("exact_cents"),
        expr("(abs(sketch_cents - exact_cents) * CAST(1000000 AS BIGINT)) div exact_cents")
          .as("rel_err_ppm"))
  }

  def eventsQuantileSketch(s: SparkSession, d: String): DataFrame = {
    val cents = quantileCents(Tables.events(s, d))
    quantileExtract(quantileBuckets(cents), cents)
  }

  private val quantileOracleSql: String =
    """WITH ev AS (SELECT event_type, CAST(floor(value * 1e2) AS BIGINT) AS v
      |  FROM events WHERE CAST(floor(value * 1e2) AS BIGINT) >= 1),
      |bx AS (SELECT event_type,
      |    CASE WHEN v < 8 THEN v
      |      ELSE (length(bin(v)) - 1) * 8 + ((v >> (length(bin(v)) - 4)) & 7)
      |    END AS idx
      |  FROM ev),
      |bk0 AS (SELECT event_type, idx, count(*) AS cnt FROM bx GROUP BY 1, 2),
      |bk AS (SELECT * FROM bk0
      |  UNION ALL SELECT '_all', idx, sum(cnt) FROM bk0 GROUP BY 2),
      |br AS (SELECT *,
      |    CASE WHEN idx < 8 THEN idx ELSE
      |      ((8 + idx % 8) << (CAST(idx // 8 AS INT) - 3))
      |        + (CASE WHEN idx // 8 >= 4
      |           THEN (CAST(1 AS BIGINT) << (CAST(idx // 8 AS INT) - 4))
      |           ELSE 0 END)
      |    END AS rep,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY idx
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM bk),
      |qq AS (SELECT unnest(['p50', 'p90', 'p99']) AS q),
      |tg AS (SELECT br.*, q,
      |    CASE q WHEN 'p50' THEN (n * 1 + 1) // 2
      |      WHEN 'p90' THEN (n * 9 + 9) // 10 ELSE (n * 99 + 99) // 100
      |    END AS target
      |  FROM br CROSS JOIN qq),
      |sk AS (SELECT event_type, q, min(rep) AS sketch_cents,
      |    CAST(max(n) AS BIGINT) AS n
      |  FROM tg WHERE cum >= target GROUP BY 1, 2),
      |exv AS (SELECT event_type, v, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |ex0 AS (SELECT * FROM exv
      |  UNION ALL SELECT '_all', v, sum(cnt) FROM exv GROUP BY 2),
      |ex1 AS (SELECT *,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM ex0),
      |ex2 AS (SELECT ex1.*, q,
      |    CASE q WHEN 'p50' THEN (n * 1 + 1) // 2
      |      WHEN 'p90' THEN (n * 9 + 9) // 10 ELSE (n * 99 + 99) // 100
      |    END AS target
      |  FROM ex1 CROSS JOIN qq),
      |ex AS (SELECT event_type, q, min(v) AS exact_cents
      |  FROM ex2 WHERE cum >= target GROUP BY 1, 2)
      |SELECT event_type, q, n, sketch_cents, exact_cents,
      |  (abs(sketch_cents - exact_cents) * CAST(1000000 AS BIGINT)) // exact_cents
      |    AS rel_err_ppm
      |FROM sk JOIN ex USING (event_type, q)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_approx_distinct" -> eventsApproxDistinct,
    "events_hll_sliding" -> eventsHllSliding,
    "events_count_min" -> eventsCountMin,
    "events_kmv_overlap" -> eventsKmvOverlap,
    "events_quantile_sketch" -> eventsQuantileSketch,
  )

  val oracles: Map[String, String] = Map(
    "events_approx_distinct" -> hllOracleSql,
    "events_hll_sliding" -> hllSlidingOracleSql,
    "events_count_min" -> cmOracleSql,
    "events_kmv_overlap" -> kmvOracleSql,
    "events_quantile_sketch" -> quantileOracleSql,
  )
}
