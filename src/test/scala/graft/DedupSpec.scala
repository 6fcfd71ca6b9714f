package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PortableHash._
import graft.operators.Dedup

/** Dedup candidate-generation audits: the stop-band width cap must be a
  * dormant safety valve at test scale (no bucket near it), so the capped
  * query and the capped oracle state the same result set the uncapped
  * formulation would.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("no minhash band bucket approaches the width cap at test scale") {
    val postings = Dedup.shinglePostings(spark, sf)
      .select(col("doc_id"), col("n"), hexH(col("sh")).as("hp"))
    val m = Dedup.minhashSignatures(postings)
    val widths = m.select(col("doc_id"), explode(array((0 until Bands).map(k =>
        concat_ws(",", lit(k), slice(col("mh"), k * RowsPerBand + 1, RowsPerBand))): _*)).as("bucket"))
      .groupBy(col("bucket")).count()
    val maxW = widths.agg(max(col("count"))).collect()(0).getLong(0)
    info(s"max band width = $maxW (cap ${Dedup.MaxBandWidth})")
    assert(maxW < Dedup.MaxBandWidth / 2,
      "band buckets are wide enough that the stop-band cap would change results")
  }

  test("no winnow fingerprint approaches the df cap at test scale") {
    val dfs = graft.operators.TextQueries.textWinnowFp(spark, sf)
      .groupBy(col("fp")).count()
    val maxDf = dfs.agg(max(col("count"))).collect()(0).getLong(0)
    info(s"max winnow fp df = $maxDf (cap ${graft.operators.TextQueries.MaxFpDf})")
    assert(maxDf < graft.operators.TextQueries.MaxFpDf / 2,
      "fp postings are wide enough that the df cap would change results")
  }

  test("capped minhash pipeline still finds every verified near-dup pair") {
    // the 0.5-jaccard ground truth comes from the exact all-pairs plan;
    // LSH banding at (16 hashes, 4 bands) must recover all of it here
    val exact = Dedup.dedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh) && lsh.subsetOf(exact))
  }
}
