package graft.tools
import graft.GraftSession
import graft.operators.{Dedup, TextQueries}
import org.apache.spark.sql.functions._
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 0 until 2) {
        val t0 = System.nanoTime()
        val df = f
        df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(bit_xor(col("h"))).collect()
        if (r > 0) println(f"[t] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("survivors")(Dedup.dedupExact(spark, d).select(col("keep_id").as("doc_id")))
    time("quality_all")(TextQueries.textQuality(spark, d))
    time("keepers")(TextQueries.textQuality(spark, d).filter(col("keep") === 1).select(col("doc_id"), col("quality")))
    time("corpus_clean")(TextQueries.corpusClean(spark, d))
    spark.stop()
  }
}
