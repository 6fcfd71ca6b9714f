package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions.tokens
import graft.operators.{Analytics, Dedup}

/** Scratch timing/explain harness (not driver-facing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val ds = Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shingleSet(col("toks")).as("shs"), size(col("toks")).as("n"))
    time("shingles      ") { ds.count() }
    val postings = ds.select(col("doc_id"), col("n"), explode(col("shs")).as("sh"))
      .withColumn("h", xxhash64(col("sh"))).drop("sh")
    time("postings      ") { postings.count() }
    time("join+agg      ") {
      postings.as("a").join(postings.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"), col("a.n"), col("b.n"))
        .agg(count(lit(1))).count()
    }
    time("full ngram    ") { Dedup.dedupNgramJaccard(spark, d).count() }
    time("q5            ") { Analytics.q5LocalSupplier(spark, d).count() }
    Analytics.q5LocalSupplier(spark, d).explain("formatted")
    spark.stop()
  }
}
