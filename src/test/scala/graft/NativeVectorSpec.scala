package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{NativeVector, VectorFunctions}

class NativeVectorSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  lazy val e = Tables.embeddings(spark, sf)
    .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("v"))

  test("native dot is bit-identical to the HOF fold") {
    val diff = e
      .withColumn("hof", VectorFunctions.dot(col("v"), col("v")))
      .withColumn("nat", NativeVector.dot(col("v"), col("v")))
      .filter(col("hof") =!= col("nat"))
    assert(diff.count() === 0)
  }

  test("graft_dot is callable from SQL after registration") {
    NativeVector.register(spark)
    e.createOrReplaceTempView("emb_native_spec")
    val r = spark.sql(
      "SELECT vec_id, graft_dot(v, v) AS n2 FROM emb_native_spec ORDER BY vec_id LIMIT 1")
      .collect()
    assert(r.length === 1 && r(0).getDouble(1) > 0.0)
  }

  test("native dot stays inside whole-stage codegen") {
    val plan = e.withColumn("d", NativeVector.dot(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a whole-stage-codegen'd operator
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).getOrElse("")
    assert(dotLine.trim.startsWith("*("), plan)
  }
}
