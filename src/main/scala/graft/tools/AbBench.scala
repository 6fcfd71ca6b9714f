package graft.tools
import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._
object AbBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      // warm + 2 timed reps
      for (r <- 0 until 3) {
        val t0 = System.nanoTime()
        val df = f
        df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(bit_xor(col("h"))).collect()
        if (r > 0) println(f"[ab] $name rep$r ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("ppjoin", Dedup.dedupJaccardPpjoin(spark, d))
    time("allpairs", Dedup.dedupNgramJaccard(spark, d))
    spark.stop()
  }
}
