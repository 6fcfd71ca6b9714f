package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.expressions.Window

/** Scratch timing/explain harness (not driver-facing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/region.parquet").count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, d)

    def newForm(): DataFrame = {
      val t = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      val shs = array_distinct(
        when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ",
              element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2),
              element_at(col("toks"), i + 3))))
          .otherwise(array(concat_ws(" ", col("toks")))))
      t.select(col("doc_id"), shs.as("shs"))
        .select(col("doc_id"), explode(col("shs")).as("sh"),
          size(col("shs")).cast("long").as("n"))
    }

    def structForm(): DataFrame = {
      val t = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      val shs = array_distinct(
        when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ",
              element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2),
              element_at(col("toks"), i + 3))))
          .otherwise(array(concat_ws(" ", col("toks")))))
      t.select(col("doc_id"), shs.as("shs"))
        .select(col("doc_id"),
          explode(transform(col("shs"),
            x => struct(x.as("sh"), size(col("shs")).cast("long").as("n")))).as("e"))
        .select(col("doc_id"), col("e.sh").as("sh"), col("e.n").as("n"))
    }

    def oldForm(): DataFrame = {
      val t = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val sh3 = t.filter(size(col("toks")) >= 3)
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
        .withColumn("t1", lead(col("tok"), 1).over(w))
        .withColumn("t2", lead(col("tok"), 2).over(w))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
      val small = t.filter(size(col("toks")) < 3)
        .select(col("doc_id"), concat_ws(" ", col("toks")).as("sh"))
      sh3.unionByName(small)
        .dropDuplicates("doc_id", "sh")
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    }

    println(newForm().queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode).take(2500))
    for (rep <- 1 to 2) {
      time(s"r$rep old  form")(oldForm().write.format("noop").mode("overwrite").save())
      time(s"r$rep new  form")(newForm().write.format("noop").mode("overwrite").save())
      time(s"r$rep strc form")(structForm().write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
