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

  lazy val qm = TextQueries.textQualityModel(spark, sf).cache()

  test("quality model scores every doc, pred is exactly (score > 0)") {
    assert(qm.count() === Tables.documents(spark, sf).count())
    assert(qm.filter((col("pred") === 1) =!= (col("qm_score") > 0)).count() === 0)
  }

  test("quality model distills the rule: accuracy over the full corpus >= 0.75") {
    // Measured 0.822 (sf0.001) / 0.834 (sf0.01): the averaged integer
    // perceptron over hashed token bags recovers most of the rule's
    // boundary; the gap is inherent (the rule reads ratios the bag
    // features only proxy). Deterministic given the data.
    val n = qm.count().toDouble
    val acc = qm.filter(col("pred") === col("label")).count() / n
    assert(acc >= 0.75, s"accuracy $acc")
  }

  test("quality model is non-degenerate: both classes predicted") {
    val preds = qm.groupBy(col("pred")).count().collect()
    assert(preds.length === 2, "model must predict both keep and drop")
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
