package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import graft.GraftSession
import graft.operators.{Analytics, Similarity}

/** Scratch timing/explain harness (not driver-facing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for ((name, df) <- Seq(
        "knn_brute" -> Similarity.knnBrute(spark, d),
        "knn_ivf" -> Similarity.knnIvf(spark, d),
        "q5" -> Analytics.q5LocalSupplier(spark, d))) {
      println(s"===== $name =====")
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      println(s"hints: ${hints.size}")
      hints.foreach(h => println("  hint over: " + h.child.toString.linesIterator.take(2).mkString(" | ").take(200)))
      val p = df.queryExecution.executedPlan.toString
      println("row_number occurrences: " + "row_number".r.findAllIn(p).size)
      println("hashpartitioning specs: " +
        "hashpartitioning\\([^)]*".r.findAllIn(p).map(_.take(60)).toSeq.distinct.mkString("\n  ", "\n  ", ""))
    }
    spark.stop()
  }
}
