package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamSimhashGate

/** The streaming simhash gate must flag exactly the cross-corpus pairs
  * within the hamming radius — completeness is the pigeonhole guarantee of
  * the exact-radius banding, checked here against a brute-force cross
  * product of the fingerprints.
  */
class StreamSimhashGateSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("stream gate flags exactly the brute-force hamming<=radius cross pairs") {
    val tmp = Files.createTempDirectory("graft_shgate").toString
    val in = s"$tmp/in"; Files.createDirectories(Paths.get(in))
    val reference = Tables.documents(spark, sf).select("doc_id", "text")

    // incoming: exact copies (hamming 0), light mutations (small hamming),
    // novel docs (far)
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
      StreamSimhashGate.start(spark, in, reference, s"$tmp/out", s"$tmp/chk")
        .awaitTermination()

    drop("a", incoming.filter(col("doc_id") % 2 === 0))
    run()
    drop("b", incoming.filter(col("doc_id") % 2 =!= 0))
    run()

    val streamed = StreamSimhashGate.readFlagged(spark, s"$tmp/out")
      .select("in_id", "ref_id", "hamming").localCheckpoint()

    // brute-force ground truth: full cross product of fingerprints
    val inFp = Dedup.simhashFingerprintsOf(incoming)
      .select(col("doc_id").as("in_id"), col("sim").as("in_sim"))
    val refFp = Dedup.simhashFingerprintsOf(reference)
      .select(col("doc_id").as("ref_id"), col("sim").as("ref_sim"))
    val brute = inFp.crossJoin(refFp)
      .select(col("in_id"), col("ref_id"),
        bit_count(col("in_sim").bitwiseXOR(col("ref_sim"))).as("hamming"))
      .filter(col("hamming") <= Dedup.SimhashRadius)
      .localCheckpoint()
    assert(streamed.exceptAll(brute).count() === 0, "streamed-only pairs")
    assert(brute.exceptAll(streamed).count() === 0,
      "pairs the gate missed — pigeonhole completeness broken")

    // every exact copy self-matches at hamming 0
    assert(streamed.filter(col("hamming") === 0)
      .filter(col("in_id") - 10000 === col("ref_id")).count() >= 10)

    // replay with the same checkpoint is a no-op
    run()
    assert(StreamSimhashGate.readFlagged(spark, s"$tmp/out").count()
      === streamed.count())
  }
}
