package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamNearDup

/** The streaming ingestion gate must flag exactly what the batch operator
  * flags: stream two drops of incoming docs (exact copies of reference
  * docs, mutated near-dups, and novel docs) against the sf corpus and
  * compare with a direct batch run of the same core.
  */
class StreamNearDupSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("stream gate flags the same pairs as the batch cross-corpus dedup") {
    val tmp = Files.createTempDirectory("graft_neardup").toString
    val in = s"$tmp/in"; Files.createDirectories(Paths.get(in))
    val reference = Tables.documents(spark, sf).select("doc_id", "text")

    // incoming: 10 exact copies (ids 10000+), 5 light mutations (one token
    // appended — jaccard stays high), 5 novel docs (ids 20000+)
    val copies = reference.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val mutated = reference.filter(col("doc_id") >= 10 && col("doc_id") < 15)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
    val novel = spark.range(20000, 20005)
      .select(col("id").as("doc_id"),
        concat(lit("completely unrelated content block number "), col("id")).as("text"))
    val incoming = copies.unionByName(mutated).unionByName(novel).localCheckpoint()

    def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").json(s"$tmp/stage_$name")
      val src = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".json")).head
      Files.copy(src.toPath, Paths.get(in, s"$name.json"))
    }
    def run(): Unit =
      StreamNearDup.start(spark, in, reference, s"$tmp/out", s"$tmp/chk")
        .awaitTermination()

    drop("a", incoming.filter(col("doc_id") % 2 === 0))
    run()
    drop("b", incoming.filter(col("doc_id") % 2 =!= 0))
    run()

    val streamed = StreamNearDup.readFlagged(spark, s"$tmp/out")
      .select("in_id", "ref_id", "jacc").localCheckpoint()
    val batch = Dedup.nearDupsAgainst(incoming,
      Dedup.referencePostings(reference)).localCheckpoint()
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)

    // every exact copy must self-match at jacc = 1.0 against its source
    val exact = streamed.filter(col("jacc") === 1.0)
      .filter(col("in_id") - 10000 === col("ref_id")).count()
    assert(exact === 10)

    // replay with the same checkpoint is a no-op (overwritten partitions)
    run()
    assert(StreamNearDup.readFlagged(spark, s"$tmp/out").count() === streamed.count())
  }
}
