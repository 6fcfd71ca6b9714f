package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for a partitioned parquet mart — the storage-
  * maintenance role ClickHouse's background part merges play for the
  * reference's MergeTree tables (and OPTIMIZE plays on a lakehouse table):
  * streaming/idempotent writers (Mart, the foreachBatch sinks) leave one
  * file per micro-batch per partition, and a year of 5-minute triggers
  * turns every dashboard scan into a 100k-file listing.
  *
  * Contract: a partition is fragmented when it holds > 1 file AND its
  * total bytes are under `targetBytes` (a partition at or past target size
  * is healthy — splitting big files is a different job). Fragmented
  * partitions are rewritten as ONE file each; everything else is untouched,
  * byte for byte.
  *
  * Scale + safety: the stats pass is a driver-side FS listing, bounded by
  * partition count (the same metadata op every table-format maintenance
  * job performs). The rewrite reads ONLY the picked partitions (by path,
  * `basePath`-rooted so the partition column survives), repartitions by
  * the partition column — each partition lands in exactly one task, so the
  * writer emits exactly one file per partition dir — and re-writes through
  * dynamic partition overwrite, whose committer stages and swaps per
  * partition (the idempotent-rerun protocol MartSpec already pins). The
  * frame is materialized before the overwrite because source and sink are
  * the same files. Re-running is a no-op: compacted partitions hold one
  * file and are no longer eligible.
  */
object Compaction {

  final case class PartStats(value: String, files: Int, bytes: Long)

  /** Per-partition file counts and sizes of `dir`'s `col=value` children. */
  def stats(s: SparkSession, dir: String, partitionCol: String): Seq[PartStats] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol="))
      .map { st =>
        val parts = fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartStats(st.getPath.getName.stripPrefix(s"$partitionCol="),
          parts.size, parts.map(_.getLen).sum)
      }
      .sortBy(_.value)
  }

  /** Compact fragmented partitions; returns the partition values rewritten. */
  def compact(s: SparkSession, dir: String, partitionCol: String,
      targetBytes: Long): Seq[String] = {
    val picked = stats(s, dir, partitionCol)
      .filter(p => p.files > 1 && p.bytes < targetBytes)
    if (picked.isEmpty) return Seq.empty
    val paths = picked.map(p => s"$dir/$partitionCol=${p.value}")
    val frame = s.read.option("basePath", dir).parquet(paths: _*)
      .repartition(col(partitionCol))
      .localCheckpoint() // sink == source files; break lineage before overwrite
    frame.write
      .partitionBy(partitionCol)
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)
    picked.map(_.value)
  }
}
