package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextQueries
import graft.streaming.StreamDecontamGate

/** The streamed Bloom gate must flag exactly what the batch
  * text_decontaminate_bloom query flags, across multiple drops and a
  * checkpoint replay.
  */
class StreamDecontamGateSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("streamed flags equal the batch bloom query across drops; replay is a no-op") {
    val tmp = Files.createTempDirectory("graft_dgate").toString
    val in = s"$tmp/in"; Files.createDirectories(Paths.get(in))
    val bloom = TextQueries.bloomFor(spark, sf)

    // the batch query's input population: train docs only
    val train = Tables.documents(spark, sf)
      .filter(col("doc_id") % TextQueries.BenchMod =!= 0)
      .select(col("doc_id"), col("text"))

    def drop(name: String, filter: org.apache.spark.sql.Column): Unit = {
      train.filter(filter).select(to_json(struct(col("doc_id"), col("text"))).as("v"))
        .coalesce(1).write.mode("overwrite").text(s"$tmp/stage_$name")
      val src = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".txt")).head
      Files.copy(src.toPath, Paths.get(in, s"$name.txt"))
    }
    def run(): Unit =
      StreamDecontamGate.start(spark, in, bloom, s"$tmp/out", s"$tmp/chk")
        .awaitTermination()

    drop("a", col("doc_id") % 2 === 0); run()
    drop("b", col("doc_id") % 2 === 1); run()
    run() // replay: no new files, no new batches

    val got = StreamDecontamGate.readFlags(spark, s"$tmp/out")
      .filter(col("n_flagged") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_flagged"))
    val expected = TextQueries.textDecontaminateBloom(spark, sf)
    assert(got.exceptAll(expected).count() === 0,
      got.exceptAll(expected).collect().mkString(", "))
    assert(expected.exceptAll(got).count() === 0,
      expected.exceptAll(got).collect().mkString(", "))
    // and every train doc (with >= N tokens) was scored exactly once
    val scored = StreamDecontamGate.readFlags(spark, s"$tmp/out").count()
    val expectedScored = Tables.documents(spark, sf)
      .filter(col("doc_id") % TextQueries.BenchMod =!= 0)
      .filter(size(graft.functions.TextFunctions.tokens(col("text"))) >=
        TextQueries.DecontamN).count()
    assert(scored === expectedScored)
  }
}
