package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The bench error contract: a broken query must surface as an {"err": ...}
  * marker — never as a timing — and must not contribute to the total.
  */
class BenchSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("a deliberately-broken query reports an err marker, not a timing") {
    val good = (s: SparkSession, d: String) =>
      Tables.region(s, d).groupBy(col("r_name")).count()
    val broken = (_: SparkSession, _: String) =>
      throw new IllegalStateException("deliberately broken")
    val results = Bench.measure(
      Seq("good_query" -> good, "broken_query" -> (broken: (SparkSession, String) => DataFrame)),
      spark, sf)
    val json = Bench.toJson(results, sf)

    assert(json.contains(""""broken_query":{"err":"IllegalStateException: deliberately broken"}"""), json)
    assert(""""broken_query":[0-9]""".r.findFirstIn(json).isEmpty,
      "a broken query must never report a numeric timing")
    assert(json.contains(""""errors":1"""), json)
    // total equals the good query's elapsed alone
    val goodElapsed = results.find(_.name == "good_query").get.elapsed
    assert(json.contains(s""""value":$goodElapsed"""), json)
  }
}
