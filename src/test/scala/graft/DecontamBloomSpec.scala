package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** Bloom decontamination contract: the filter can only ADD flags, never
  * lose one — every doc the exact postings join finds must be bloom-flagged
  * (a Bloom filter has no false negatives), and the false-positive surplus
  * must stay within the sizing rule's design bound at test scale.
  */
class DecontamBloomSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("bloom flags are a superset of exact contamination, with bounded FP surplus") {
    val exact = TextQueries.textDecontaminate(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val bloom = TextQueries.textDecontaminateBloom(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(bloom),
      s"false negatives: ${exact -- bloom} — impossible for a Bloom filter; the gram sets diverged")
    val trainDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % TextQueries.BenchMod =!= 0).count()
    val surplus = (bloom -- exact).size
    info(s"exact=${exact.size} bloom=${bloom.size} surplus=$surplus of $trainDocs train docs")
    assert(surplus <= math.max(1L, trainDocs / 100),
      s"false-positive surplus $surplus exceeds 1% of $trainDocs train docs — M sizing rule broken")
  }

  test("bloom sizing: M is a power of two >= 64x benchmark grams, floor 2^16") {
    val bi = TextQueries.bloomFor(spark, sf)
    assert((bi.m & (bi.m - 1)) === 0L, s"M=${bi.m} not a power of two")
    assert(bi.m >= TextQueries.BloomMinM)
    assert(bi.words.length.toLong === bi.m / 64)
    val setBits = bi.words.map(java.lang.Long.bitCount).sum
    info(s"M=${bi.m}, set bits=$setBits (${setBits.toDouble / bi.m} full)")
    assert(setBits.toDouble / bi.m <= 3.0 / 32,
      "set-bit fraction above the design bound — FP rate no longer ~ (3G/M)^3")
  }
}
