package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Bench {

  /** One measured unit: elapsed seconds and, for a failed query, the error
    * marker that REPLACES its timing in the report (a broken query must
    * never masquerade as a fast one).
    */
  final case class Result(name: String, elapsed: Double, err: Option[String])

  /** Time each query with a full-materialization reduce, `reps` times,
    * reporting the MEDIAN (single runs generated false regressions round
    * over round — knn_lsh read 1.7× slower in r5 purely from one-shot
    * noise plus shared-cache attribution). Factored out of main so
    * BenchSpec can prove the error-marker contract with a
    * deliberately-broken query. An error on any rep reports the error and
    * stops re-running that query.
    */
  def measure(queries: Seq[(String, (SparkSession, String) => DataFrame)],
      spark: SparkSession, sfDir: String, reps: Int = 1): Seq[Result] =
    queries.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      var r = 0
      while (r < math.max(1, reps) && err.isEmpty) {
        val t0 = System.nanoTime()
        // Hash-reduce over every output column so Catalyst cannot prune the
        // projected expressions (a bare count() measures only the scan for
        // map-only queries) — each query's full compute path is on the clock.
        err = try {
          val df = fn(spark, sfDir)
          df.select(xxhash64(df.columns.map(col): _*).as("h"))
            .agg(bit_xor(col("h"))).collect()
          None
        } catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
        times += (System.nanoTime() - t0) / 1e9
        // Isolate measured units: drop the debris a query leaves behind
        // (localCheckpoint blocks, streaming memory-sink tables) and let GC
        // settle OUTSIDE the next rep's clock — measured 2-4× inflation on
        // later queries without this, purely from cross-query pressure.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        spark.catalog.listTables().collect()
          .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
        System.gc()
        r += 1
      }
      // Attribution aid (env-gated, off for driver runs): per-rep walls +
      // post-GC heap so suite-vs-isolated inflation can be localized.
      if (sys.env.contains("SPARK_GRAFT_DEBUG")) {
        val rt = Runtime.getRuntime
        System.err.println(f"[bench-debug] $name reps=${
          times.map(t => f"$t%.2f").mkString(",")} heapMB=${
          (rt.totalMemory - rt.freeMemory) / 1048576}%d")
      }
      Result(name, median(times.toSeq), err)
    }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  /** The driver-facing JSON line: successful queries report seconds, failed
    * ones an {"err": ...} object; total sums successes only and `errors`
    * counts failures so a partial total can't read as a full one.
    */
  def toJson(results: Seq[Result], sfDir: String): String = {
    val qs = results.map {
      case Result(k, v, None) => s"\"" + k + "\":" + v
      case Result(k, _, Some(e)) => s"\"" + k + "\":{\"err\":" + jstr(e) + "}"
    }.mkString("{", ",", "}")
    val total = results.collect { case Result(_, v, None) => v }.sum
    val nErr = results.count(_.err.isDefined)
    // "schema" marks which of the two emitted line shapes this is (full =
    // complete per-query map; compact = totals + pointer only) so a consumer
    // that grabbed the wrong line fails loudly instead of silently reading
    // a map-less summary as the full bench.
    s"""{"metric":"total","schema":"full","value":$total,"unit":"sec","errors":$nErr,"queries":$qs,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths so the alphabetically-first query doesn't
    // absorb several seconds of one-time startup cost.
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()
    // Materialize the simulated CDC topics once per SF (raw envelope json +
    // the parsed bronze frame) and serve the cdc family's reads from parquet
    // for the rest of the run: a deployment consumes a TOPIC and parses it
    // ONCE into bronze (reference pipeline shape) — only the simulator's
    // generation cost (to_json over the base tables, ~55 s at sf10) comes
    // off the per-query clock, and it is reported as its own entry below,
    // not hidden. Verify never enables this: the correctness gates keep the
    // live to_json→from_json path that self-tests Envelope.parse.
    // Start from a FRESH cache dir every run: a leftover cache from a prior
    // JVM made this entry read 0.7 s (stale hit) in one round and 6+ s
    // (real generation) in the next, silently flattering or inflating
    // total-vs-total comparisons (r15 verdict). Deleting first makes the
    // entry mean one stable thing: the cost of generating + materializing
    // the simulated topics, every run.
    locally {
      val root = Paths.get("target/cdc-cache")
      if (Files.exists(root)) {
        val w = Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        } finally w.close()
      }
    }
    val tCdc = System.nanoTime()
    graft.cdc.CdcSim.enableCache("target/cdc-cache")
    graft.cdc.CdcSim.prewarmCache(spark, sfDir)
    val cdcCache = Result("changelog_cache_build",
      (System.nanoTime() - tCdc) / 1e9, None)
    // Pre-warm the incremental snapshot store OUTSIDE any query's clock and
    // report the build as its own entry: the 8 sequential micro-batch merges
    // used to be charged to whichever store query ran first (alphabetically
    // cdc_consistency_check, which read 12.6 s for a ~1 s join in r5),
    // poisoning round-over-round comparison.
    val tStore = System.nanoTime()
    graft.cdc.CdcQueries.prewarmStore(spark, sfDir)
    val storeBuild = Result("store_build", (System.nanoTime() - tStore) / 1e9, None)
    // optional arg: comma-separated query-name filter (dev iteration)
    val only = args.headOption.map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = cdcCache +: storeBuild +: measure(
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) },
      spark, sfDir, reps)
    results.foreach(r =>
      r.err.foreach(msg => System.err.println(s"[bench] ${r.name} FAILED: $msg")))
    val line = toJson(results, sfDir)
    // sbt prefixes stdout with [info], which broke the driver's JSON parse in
    // round 1 — also persist the line to a file the driver can read directly.
    // Filtered dev runs go to a separate file so a partial total can never
    // masquerade as the full-suite bench.json the driver consumes.
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT", ".")
    Files.createDirectories(Paths.get(outDir))
    val fileName = if (only.isEmpty) "bench.json" else "bench_filtered.json"
    Files.writeString(Paths.get(outDir, fileName), line + "\n")
    // Capture protocol (consumers anchor here):
    //   1. `bench.json` on disk is AUTHORITATIVE — the full line with the
    //      complete per-query map, always intact.
    //   2. stdout carries the full line EXACTLY ONCE (next print), before
    //      spark.stop — tooling that greps the full map reads this one.
    //   3. the ABSOLUTE last bytes on both streams are a COMPACT summary
    //      line (totals + errors + a pointer to bench.json, no per-query
    //      map). Rounds 7/9/10 proved a bounded tail capture (the driver
    //      keeps the final ~2000 chars) can NEVER hold the ~7 KB full
    //      line — three rounds of re-emission fixes all lost to sbt's
    //      [success] footer. A line small enough to fit the tail window
    //      is the only version of this that can work.
    println(line)
    spark.stop()
    Console.out.flush(); Console.err.flush()
    val nOk = results.count(_.err.isEmpty)
    val compact = s"""{"metric":"total","schema":"compact","value":${results.collect {
        case Result(_, v, None) => v }.sum},"unit":"sec","errors":${
        results.count(_.err.isDefined)},"n_queries":$nOk,""" +
      s""""queries_in":"$fileName","sf":"$sfDir"}"""
    println(compact)
    System.err.println(compact)
    Console.out.flush(); Console.err.flush()
  }
}
