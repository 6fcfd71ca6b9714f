package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Scale

/** Scratch timing/explain harness (not driver-facing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/region.parquet").count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // store_build attribution: per-merge walls
    val dir = java.nio.file.Files.createTempDirectory("graft_snapstore_probe_").toString
    val ch = time("parsedChangelog mat") {
      graft.cdc.CdcSim.enableCache("target/cdc-cache")
      graft.cdc.CdcSim.prewarmCache(spark, d)
      Scale.materialize(graft.cdc.CdcSim.parsedChangelog(spark, d))
    }
    val bounds = time("bounds")(ch.agg(min(col("ts_ms")), max(col("ts_ms"))).head())
    val t0 = bounds.getLong(0)
    val span = bounds.getLong(1) - t0 + 1
    val payloadCols = ch.columns.toSeq.filterNot(Set("id", "op", "ts_ms", "sign").contains)
    for (k <- 0 until graft.cdc.CdcQueries.StoreBatches)
      time(s"merge $k") {
        graft.streaming.BucketedSnapshot.merge(dir, Seq("id"), payloadCols)(
          ch.filter(expr(s"((ts_ms - $t0) * ${graft.cdc.CdcQueries.StoreBatches}) div $span = $k")), k.toLong)
      }
    spark.stop()
  }
}
