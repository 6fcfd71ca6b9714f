package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality
import graft.streaming.StreamRetention

/** The streaming register gate must report exactly what the batch bitmask
  * audit reports: stream the sf events in two drops (out of day order —
  * registers are order-insensitive, a property the batch plan gets for
  * free and the stream must prove), then compare the lag-k frame row for
  * row with `events_bitmap_retention`.
  */
class StreamRetentionSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("streamed registers reproduce the batch retention frame exactly") {
    val tmp = Files.createTempDirectory("graft_retention").toFile
    tmp.deleteOnExit()
    val in = s"$tmp/in"; Files.createDirectories(Paths.get(in))
    val days = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .localCheckpoint()
    val row = days.agg(min(col("day")), max(col("day"))).head()
    val (dmn, dmx) = (row.getLong(0), row.getLong(1))

    def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").json(s"$tmp/stage_$name")
      val src = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".json")).head
      Files.copy(src.toPath, Paths.get(in, s"$name.json"))
    }
    // split by parity of the DAY, so each user's register accumulates
    // across micro-batches rather than arriving whole
    drop("even", days.filter(col("day") % 2 === 0))
    StreamRetention.start(spark, in, dmn, "ret_sink_a").awaitTermination()
    drop("odd", days.filter(col("day") % 2 =!= 0))
    StreamRetention.start(spark, in, dmn, "ret_sink_a").awaitTermination()

    val streamed = StreamRetention
      .finalizeRetention(spark, "ret_sink_a", dmx - dmn + 1)
    val batch = Quality.eventsBitmapRetention(spark, sf).localCheckpoint()
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(batch.count() === Quality.RetentionLags.toLong)
    // the sink table is dropped by finalize (session hygiene)
    assert(!spark.catalog.tableExists("ret_sink_a"))
  }
}
