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

  test("graft_dot and graft_argmax_dot are callable from SQL after registration") {
    NativeVector.register(spark)
    e.createOrReplaceTempView("emb_native_spec")
    val r = spark.sql(
      "SELECT vec_id, graft_dot(v, v) AS n2 FROM emb_native_spec ORDER BY vec_id LIMIT 1")
      .collect()
    assert(r.length === 1 && r(0).getDouble(1) > 0.0)
    val a = spark.sql(
      """SELECT graft_argmax_dot(v, array(1.0d, 0.0d, 0.0d, 1.0d), array(1.0d, 1.0d)) AS c
        |FROM emb_native_spec LIMIT 3""".stripMargin).collect()
    assert(a.forall(row => row.getInt(0) == 0 || row.getInt(0) == 1))
  }

  test("graft_topk_sketch is callable from SQL after registration") {
    NativeVector.register(spark)
    Tables.events(spark, sf).createOrReplaceTempView("ev_native_spec")
    val r = spark.sql(
      """SELECT e.term, e.est FROM (
        |  SELECT explode(graft_topk_sketch(event_type, 64)) AS e
        |  FROM ev_native_spec)""".stripMargin).collect()
    val exact = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r.map(x => (x.getString(0), x.getLong(1))).toMap === exact)
  }

  test("native dot stays inside whole-stage codegen") {
    val plan = e.withColumn("d", NativeVector.dot(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a whole-stage-codegen'd operator
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).getOrElse("")
    assert(dotLine.trim.startsWith("*("), plan)
  }

  test("argTopKDot equals the struct-sort formulation it replaced, ties to lowest cell") {
    // 4 centroids, the last a DUPLICATE of the first: rows where centroid 0
    // ranks anywhere in the top-k exercise the lowest-cell tie-break
    val cents = Array(
      Array.tabulate(64)(i => math.sin(i + 1.0)),
      Array.tabulate(64)(i => math.cos(i * 0.7)),
      Array.tabulate(64)(i => 1.0 / (i + 1)),
      Array.tabulate(64)(i => math.sin(i + 1.0)))
    def n2(v: Array[Double]) = { var a = 0.0; v.foreach(x => a += x * x); a }
    val sn = cents.map(c => math.sqrt(n2(c)))
    val flat = typedlit(cents.flatten.toIndexedSeq)
    val snLit = typedlit(sn.toIndexedSeq)
    // the exact shape ArgTopKDot replaced: (negccos, cell) struct sort
    val probe = array(cents.indices.map(k =>
      struct((-NativeVector.dot(col("v"), typedlit(cents(k).toIndexedSeq)) / lit(sn(k)))
        .as("negccos"), lit(k).as("cell"))): _*)
    val ref = transform(slice(sort_array(probe), 1, 3), p => p.getField("cell"))
    val diff = e
      .withColumn("fast", NativeVector.argTopKDot(col("v"), flat, snLit, lit(3)))
      .withColumn("ref", ref)
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
    // with k=3 of 4 cells and a duplicated pair, cell 0 must appear (the
    // duplicate's score is identical, so 0 precedes 3) and whenever 3
    // appears 0 must precede it in the SAME row's probe list
    val rows = e.select(NativeVector.argTopKDot(col("v"), flat, snLit, lit(3)).as("p"))
      .collect().map(_.getSeq[Int](0))
    assert(rows.forall(p => !p.contains(3) || p.indexOf(0) >= 0 && p.indexOf(0) < p.indexOf(3)))
    assert(rows.exists(_.contains(0)))
    // topK past the cell count clamps
    val full = e.select(NativeVector.argTopKDot(col("v"), flat, snLit, lit(99)).as("p"))
      .limit(1).collect()(0).getSeq[Int](0)
    assert(full.length === 4 && full.toSet === Set(0, 1, 2, 3))
  }

  test("pqLut equals the unrolled dot-of-slice array it replaced") {
    val numSub = 4
    val kk = 5
    // dim 64 → sub 16; deterministic fake codebook
    val cb = Array.tabulate(numSub, kk, 16)((m, k, j) => math.sin(m * 31 + k * 7 + j + 1.0))
    val flat = typedlit(cb.flatten.flatten.toIndexedSeq)
    val lutExprs = for (m <- 0 until numSub; k <- 0 until kk)
      yield NativeVector.dot(slice(col("v"), m * 16 + 1, 16), typedlit(cb(m)(k).toIndexedSeq))
    val diff = e
      .withColumn("fast", NativeVector.pqLut(col("v"), flat, lit(numSub)))
      .withColumn("ref", array(lutExprs: _*))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("matVec rejects a matrix whose length is not a multiple of the vector's") {
    // r13 advice: a malformed rotation literal must throw, not silently
    // truncate to floor(|mat|/n) rows
    val bad = typedlit((1 to 65).map(_.toDouble)) // |v| = 64 per fixture
    val ex = intercept[Exception] {
      e.withColumn("r", NativeVector.matVec(col("v"), bad)).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(ex).contains("not a multiple"), rootMsg(ex))
    // and the divisible case still rotates: identity matrix returns v
    val id = Array.tabulate(64, 64)((r, c) => if (r == c) 1.0 else 0.0)
    val diff = e
      .withColumn("r", NativeVector.matVec(col("v"), typedlit(id.flatten.toIndexedSeq)))
      .filter(col("r") =!= col("v"))
    assert(diff.count() === 0)
  }

  test("argTopKDot and pqLut stay inside whole-stage codegen") {
    val cents = Array.tabulate(48, 64)((k, i) => math.sin(k + i + 1.0))
    val sn = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val plan = e
      .withColumn("p", NativeVector.argTopKDot(col("v"),
        typedlit(cents.flatten.toIndexedSeq), typedlit(sn.toIndexedSeq), lit(8)))
      .withColumn("lut", NativeVector.pqLut(col("v"),
        typedlit(cents.flatten.toIndexedSeq), lit(4)))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_argtopk_dot")).getOrElse("")
    assert(line.trim.startsWith("*("), plan)
    assert(line.contains("graft_pq_lut"), plan)
  }

  test("argmaxDot equals the per-cell struct-max formulation, ties to lowest cell") {
    // 4 centroids, the last a DUPLICATE of the first: every row that picks
    // centroid 0 exercises the lowest-k tie-break against centroid 3
    val cents = Array(
      Array.tabulate(64)(i => math.sin(i + 1.0)),
      Array.tabulate(64)(i => math.cos(i * 0.7)),
      Array.tabulate(64)(i => 1.0 / (i + 1)),
      Array.tabulate(64)(i => math.sin(i + 1.0)))
    def n2(v: Array[Double]) = { var a = 0.0; v.foreach(x => a += x * x); a }
    val sn = cents.map(c => math.sqrt(n2(c)))
    val flat = typedlit(cents.flatten.toIndexedSeq)
    val snLit = typedlit(sn.toIndexedSeq)
    val structMax = array(cents.indices.map(k =>
      struct((NativeVector.dot(col("v"), typedlit(cents(k).toIndexedSeq)) / lit(sn(k))).as("s"),
        lit(-k).as("negk"))): _*)
    val diff = e
      .withColumn("fast", NativeVector.argmaxDot(col("v"), flat, snLit))
      .withColumn("ref", -array_max(structMax).getField("negk"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
    // the tie must actually be EXERCISED (some row picks the duplicated
    // centroid) and resolve to the lowest cell — 3 must never appear
    val cells = e.select(NativeVector.argmaxDot(col("v"), flat, snLit).as("c"))
      .groupBy("c").count().collect().map(_.getInt(0)).toSet
    assert(cells.contains(0), s"no row picked the duplicated centroid — tie untested ($cells)")
    assert(!cells.contains(3), s"tie must resolve to the LOWEST cell, got $cells")
  }
}
