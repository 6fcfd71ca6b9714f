package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** Data-selection operators: DSIR importance resampling (and the trained
  * quality-model classifier). Exact values are pinned by the DuckDB oracle
  * gate; these tests pin the semantic invariants the hash compare can't
  * state — totality, flag consistency, and that the importance weights
  * actually discriminate toward the target slice.
  */
class SelectionSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  lazy val dsir = TextQueries.sampleDsir(spark, sf).cache()
  lazy val quality = TextQueries.textQuality(spark, sf)
    .select(col("doc_id"), col("keep").as("tflag"))

  test("dsir scores every doc with >= 2 tokens exactly once") {
    val eligible = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    assert(dsir.count() === eligible.count())
    assert(dsir.select("doc_id").distinct().count() === dsir.count())
  }

  test("dsir keep flag is exactly (dsir_bits > 0)") {
    assert(dsir.filter(
      (col("keep") === 1) =!= (col("dsir_bits") > 0)).count() === 0)
  }

  test("dsir importance weights discriminate toward the target slice") {
    // The target is the quality-keeper slice: docs in the target must score
    // higher ON AVERAGE than docs outside it (the model upweights features
    // overrepresented in the target). Deterministic given the data.
    val m = dsir.join(quality, "doc_id")
      .groupBy(col("tflag")).agg(avg(col("avg_centibits")).as("mean_cb"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) > m(0),
      s"target mean ${m(1)} should exceed non-target mean ${m(0)}")
  }

  test("dsir per-doc score is the sum of its features' bucket weights") {
    // n_feats equals the doc's bigram count (n_tokens - 1): the scoring
    // join must neither drop nor duplicate features.
    val counts = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), (size(col("toks")) - 1).cast("long").as("expected"))
    assert(dsir.join(counts, "doc_id")
      .filter(col("n_feats") =!= col("expected")).count() === 0)
  }
}
