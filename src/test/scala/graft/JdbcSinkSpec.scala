package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{CdcSim, Envelope}
import graft.streaming.{CdcPipeline, JdbcSink}

/** The reference's actual sink shape — stream → foreachBatch → JDBC append
  * (cdc_processor.py:105-117) — against embedded Derby (ships with Spark).
  */
class JdbcSinkSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("CDC stream lands in a JDBC table and replays are no-ops") {
    val tmp = Files.createTempDirectory("graft_jdbc").toString
    val url = s"jdbc:derby:$tmp/db;create=true"
    val ch = CdcSim.ordersChangelog(spark, sf)
    ch.select("value").write.mode("overwrite").text(s"$tmp/in")

    def launch() = JdbcSink.run(spark, CdcPipeline.Files(s"$tmp/in"),
      CdcSim.payloadSchema, url, "orders_cdc", s"$tmp/chk")
    launch().awaitTermination()

    val parsed = Envelope.parse(ch, CdcSim.payloadSchema)
    def sunk() = spark.read.jdbc(url, "orders_cdc", new java.util.Properties)
    // every data row is stamped with its batch id (crash-window dedup key)
    assert(sunk().columns.map(_.toLowerCase).contains("batch_id"))
    val data = sunk().drop("batch_id")
    assert(data.count() === parsed.count())
    assert(data.exceptAll(parsed).count() === 0)
    assert(parsed.exceptAll(data).count() === 0)

    // checkpoint replay: no new input → no new rows
    launch().awaitTermination()
    assert(sunk().count() === parsed.count())

    // direct foreachBatch replay of an already-committed batch id → no-op
    JdbcSink.idempotentJdbc(url, "orders_cdc")(parsed.limit(5), 0L)
    assert(sunk().count() === parsed.count())

    // crash-window replay: rows appended but the ledger insert never ran —
    // the replay must delete the orphans and land exactly one copy
    parsed.limit(7).withColumn("batch_id", org.apache.spark.sql.functions.lit(99L))
      .write.mode("append").jdbc(url, "orders_cdc", new java.util.Properties)
    JdbcSink.idempotentJdbc(url, "orders_cdc")(parsed.limit(7), 99L)
    assert(sunk().filter("batch_id = 99").count() === 7)
    assert(sunk().count() === parsed.count() + 7)
  }
}
