package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: the correctness gate hash-compares Spark
  * output to DuckDB oracle output with columns sorted BY NAME, so an
  * unaliased aggregate (`sum(x)`) or a name present on only one side fails
  * the round even when every value matches. Runs at sf0.001; note several
  * query BUILDERS are eager (streaming materialization, localCheckpoint,
  * quantizer training), so constructing every frame here does execute real
  * work — the assertions themselves only inspect schemas.
  */
class VerifyParitySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every oracle key is a registered query and vice versa") {
    // knn_ivf's / knn_lsh_auto's oracles are GENERATED from the trained
    // centroids / tuned config, so they only exist after each query has run
    // once in this JVM — exactly Verify's order (run queries, then dump
    // oracle_sql.json). Train/tune, then demand full 1:1 coverage.
    graft.operators.Similarity.knnIvf(spark, sf).count()
    graft.operators.Similarity.knnLshAuto(spark, sf).count()
    graft.operators.Similarity.knnPq(spark, sf).count()
    graft.operators.Similarity.knnIvfPq(spark, sf).count()
    graft.operators.Dedup.mhTunedConfig(spark, sf)
    graft.operators.Dedup.jaccTunedTau(spark, sf)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${q -- o}")
  }

  test("output column names are clean identifiers present in the oracle SQL") {
    for ((name, fn) <- SparkEntry.queries) {
      val cols = fn(spark, sf).columns
      val bad = cols.filterNot(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
      assert(bad.isEmpty, s"$name: non-identifier output columns ${bad.mkString(",")} — alias them")
      for (sql <- SparkEntry.oracleSql.get(name); c <- cols)
        assert(("(?i)\\b" + c + "\\b").r.findFirstIn(sql).isDefined,
          s"$name: output column '$c' never appears in its oracle SQL — alias drift")
    }
  }
}
