package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextQueries}
import graft.streaming.StreamIngestPipeline

/** The composed ingestion gate must decide exactly what the three verified
  * batch components decide in conjunction — per doc, with the fixed reject
  * precedence — across multiple drops and a checkpoint replay.
  */
class StreamIngestPipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("streamed admit/reject equals the batch conjunction; replay is a no-op") {
    val tmp = Files.createTempDirectory("graft_ingest").toString
    val in = s"$tmp/in"; Files.createDirectories(Paths.get(in))
    val model = TextQueries.qmFor(spark, sf)
    val bloom = TextQueries.bloomFor(spark, sf)
    val docs = Tables.documents(spark, sf)
    // reference corpus and incoming population are disjoint, and incoming
    // stays inside the bloom query's train-doc population
    val ref = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    val incoming = docs
      .filter(col("doc_id") % TextQueries.BenchMod =!= 0 && col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text"))
    val refPost = Dedup.durable(Dedup.referencePostings(ref))

    def drop(name: String, filter: org.apache.spark.sql.Column): Unit = {
      incoming.filter(filter)
        .select(to_json(struct(col("doc_id"), col("text"))).as("v"))
        .coalesce(1).write.mode("overwrite").text(s"$tmp/stage_$name")
      val src = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".txt")).head
      Files.copy(src.toPath, Paths.get(in, s"$name.txt"))
    }
    def run(): Unit =
      StreamIngestPipeline.start(spark, in, model, bloom, refPost,
        s"$tmp/out", s"$tmp/chk").awaitTermination()

    drop("a", col("doc_id") % 2 === 0); run()
    drop("b", col("doc_id") % 2 === 1); run()
    run() // replay

    val got = StreamIngestPipeline.readDecisions(spark, s"$tmp/out")
      .select(col("doc_id"), col("qm_score"), col("contaminated"),
        col("ndup_refs"), col("reject_reason"), col("admit"))

    // batch twins of the three gates over the identical population
    val qm = TextQueries.textQualityModel(spark, sf)
      .select(col("doc_id"), col("qm_score"))
    val contaminated = TextQueries.textDecontaminateBloom(spark, sf)
      .select(col("doc_id")).withColumn("c", lit(true))
    val ndup = Dedup.nearDupsAgainst(incoming, refPost, 0.5)
      .groupBy(col("in_id").as("doc_id")).agg(count(lit(1)).as("nd"))
    val expected = incoming.select(col("doc_id"))
      .join(qm, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_outer")
      .join(ndup, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("qm_score"),
        coalesce(col("c"), lit(false)).as("contaminated"),
        coalesce(col("nd"), lit(0L)).as("ndup_refs"))
      .withColumn("reject_reason",
        when(col("qm_score") <= 0, lit("quality"))
          .when(col("contaminated"), lit("contaminated"))
          .when(col("ndup_refs") > 0, lit("near_dup")))
      .withColumn("admit",
        when(col("reject_reason").isNull, lit(1)).otherwise(lit(0)))

    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).count() === 0,
      got.exceptAll(expected).limit(5).collect().mkString("\n"))
    assert(expected.exceptAll(got).count() === 0)
    // sanity: the corpus exercises every path
    val reasons = got.groupBy("reject_reason").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("admit") -> r.getLong(1)).toMap
    info(s"decision mix: $reasons")
    assert(got.filter(col("admit") === 1).count() > 0)
    assert(reasons.contains("quality") || reasons.contains("near_dup"))
  }
}
