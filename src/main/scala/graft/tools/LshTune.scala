package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.NativeVector
import graft.functions.VectorFunctions.toDouble
import graft.operators.Similarity

/** Sweeps the LSH index shape (SigBits × NumTables, with and without 1-bit
  * multi-probe) and reports recall@10 vs brute force and the fraction of
  * the corpus scanned per query — the numbers behind SURVEY §4's "tunable"
  * claim. Dev tool; single-partition windows are fine at sweep scale.
  */
object LshTune {

  val K = 10
  val NumQueries = Similarity.NumQueries

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv")).localCheckpoint()
    val c = e.filter(col("vec_id") >= NumQueries).localCheckpoint()
    val nCorpus = c.count().toDouble

    def topkSet(scored: DataFrame): Map[Long, Set[Long]] = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= K)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val exact = topkSet(broadcast(q).join(c)
      .withColumn("cos", NativeVector.cosine(col("qv"), col("v"))))

    println(f"| SigBits | Tables | probe | recall@10 | scanned |")
    println(f"| --- | --- | --- | --- | --- |")
    for {
      bits <- Seq(4, 6, 8)
      tables <- Seq(4, 8, 12)
      multiprobe <- Seq(false, true)
    } {
      val planes = Similarity.mkPlanes(tables, bits)
      def sig(t: Int, v: org.apache.spark.sql.Column) =
        Similarity.signatureWith(planes, t, v)
      val cSig = c.select(col("vec_id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), sig(t, col("v")).as("sig"))): _*)).as("b"))
        .select(col("vec_id"), col("b.t").as("t"), col("b.sig").as("sig"))
      val probes = if (multiprobe) lit(-1) +: (0 until bits).map(j => lit(1 << j))
        else Seq(lit(-1))
      val qSig = q.select(col("q_id"), col("qv"), explode(array((for {
        t <- 0 until tables; p <- probes
      } yield struct(lit(t).as("t"), p.as("flip"))): _*)).as("b"))
        .select(col("q_id"), col("qv"), col("b.t").as("t"), col("b.flip").as("flip"))
        .withColumn("sig0", (0 until tables).foldRight(lit(0): org.apache.spark.sql.Column) {
          (t, acc) => when(col("t") === t, sig(t, col("qv"))).otherwise(acc)
        })
        .withColumn("sig", when(col("flip") === -1, col("sig0"))
          .otherwise(col("sig0").bitwiseXOR(col("flip"))))
      val cand = broadcast(qSig.select("q_id", "qv", "t", "sig"))
        .join(cSig, Seq("t", "sig"))
        .select(col("q_id"), col("qv"), col("vec_id")).distinct()
        .localCheckpoint()
      val scanned = cand.count() / (NumQueries * nCorpus)
      val approx = topkSet(cand.join(c, "vec_id")
        .withColumn("cos", NativeVector.cosine(col("qv"), col("v"))))
      val recall = exact.map { case (qid, nn) =>
        approx.get(qid).map(a => (a intersect nn).size.toDouble / nn.size).getOrElse(0.0)
      }.sum / exact.size
      println(f"| $bits | $tables | ${if (multiprobe) "1-bit" else "none"} | $recall%.3f | $scanned%.3f |")
    }
    spark.stop()
  }
}
