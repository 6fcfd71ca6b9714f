package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.CdcQueries
import graft.streaming.CdcStream

/** The production state-store config: RocksDB-backed keyed state (bounded
  * heap at 100 TB-scale key cardinality), exercised through the same CDC
  * upsert stream and checked against batch semantics.
  */
class RocksDbStateSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("CDC upsert stream under RocksDB state store matches batch snapshot") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = CdcStream.snapshotViaStream(spark, sf)
      val batch = CdcQueries.snapshotLatest(spark, sf)
      assert(stream.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(stream).count() === 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
