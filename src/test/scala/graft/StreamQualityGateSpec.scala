package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextQueries
import graft.streaming.StreamQualityGate

/** The streaming quality gate must score exactly what the batch
  * text_quality_model scores: stream the sf corpus in two drops through
  * the gate (same trained model) and compare (doc_id, qm_score, pred)
  * row for row with the batch query.
  */
class StreamQualityGateSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("stream gate scores every doc exactly as the batch model query") {
    val tmp = Files.createTempDirectory("graft_qmgate").toString
    val in = s"$tmp/in"; Files.createDirectories(Paths.get(in))
    val model = TextQueries.qmFor(spark, sf)
    val docsDf = Tables.documents(spark, sf).select("doc_id", "text")

    def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").json(s"$tmp/stage_$name")
      val src = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".json")).head
      Files.copy(src.toPath, Paths.get(in, s"$name.json"))
    }
    def run(): Unit =
      StreamQualityGate.start(spark, in, model, s"$tmp/out", s"$tmp/chk")
        .awaitTermination()

    drop("a", docsDf.filter(col("doc_id") % 2 === 0))
    run()
    drop("b", docsDf.filter(col("doc_id") % 2 =!= 0))
    run()

    val streamed = StreamQualityGate.readScored(spark, s"$tmp/out")
      .select("doc_id", "qm_score", "pred").localCheckpoint()
    val batch = TextQueries.textQualityModel(spark, sf)
      .select("doc_id", "qm_score", "pred").localCheckpoint()
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)

    // replay with the same checkpoint is a no-op (overwritten partitions)
    run()
    assert(StreamQualityGate.readScored(spark, s"$tmp/out").count()
      === streamed.count())
  }
}
