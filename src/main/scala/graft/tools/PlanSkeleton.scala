package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev harness: prints the join/exchange skeleton of named queries. */
object PlanSkeleton {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    for (n <- args(0).split(",")) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan
        .toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Cartesian") || l.contains("Window") ||
          l.contains("HashAggregate") || l.contains("Scan parquet"))
        .map(_.trim.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
