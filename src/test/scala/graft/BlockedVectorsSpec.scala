package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BlockedVectors, Dedup}

class BlockedVectorsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("blocked pairwise cosine equals the broadcast kernel") {
    val broadcastRes = Dedup.dedupEmbedding(spark, sf)
    for (blocks <- Seq(1, 3, 4)) {
      val blocked = BlockedVectors.dedupEmbeddingBlocked(spark, sf, blocks)
      assert(blocked.exceptAll(broadcastRes).count() === 0, s"blocks=$blocks extra rows")
      assert(broadcastRes.exceptAll(blocked).count() === 0, s"blocks=$blocks missing rows")
    }
  }
}
