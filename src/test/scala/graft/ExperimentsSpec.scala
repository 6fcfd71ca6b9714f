package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Experiments

/** events_ab_test / text_length_ks against independent driver-side
  * recomputation (brute KS from raw lengths; Welch z from per-user sums),
  * plus the invariants an experimentation system must hold: assignment
  * stability and full user coverage.
  */
class ExperimentsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("ab test covers every user exactly once across the two variants") {
    val r = Experiments.eventsAbTest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val total = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(row.getAs[Long]("n0") + row.getAs[Long]("n1") == total)
    assert(row.getAs[Long]("n0") > 0 && row.getAs[Long]("n1") > 0)
  }

  test("ab test z-score matches a driver-side Welch recomputation") {
    val row = Experiments.eventsAbTest(spark, sf).collect().head
    val per = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val users = per.map(_._1).distinct
    // same portable hash (md5 60-bit) the query uses
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexH(sv: String): Long = {
      val h = md.digest(sv.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(h, 16)
    }
    def centsSum(u: Long): BigDecimal = per
      .filter(p => p._1 == u && p._2 == "purchase")
      .map(p => BigDecimal(p._3).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum
    val groups = users.groupBy(u => hexH(s"ab:$u") % 2)
    val stats = groups.view.mapValues { us =>
      val xs = us.map(centsSum)
      val n = xs.length
      val sx = xs.sum.toDouble
      val sxx = xs.map(x => (x * x).setScale(8, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val mean = sx / n
      (n, mean, (sxx - sx * sx / n) / (n - 1))
    }.toMap
    val (n0, m0, v0) = stats(0L); val (n1, m1, v1) = stats(1L)
    val z = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
    assert(row.getAs[Long]("n0") == n0 && row.getAs[Long]("n1") == n1)
    assert(row.getAs[Double]("mean0") == math.floor(m0 * 1e4) / 1e4)
    assert(row.getAs[Double]("mean1") == math.floor(m1 * 1e4) / 1e4)
    assert(row.getAs[Double]("z_score") == math.floor(z * 1e4) / 1e4)
    assert(row.getAs[Boolean]("significant") == (math.abs(z) > Experiments.AbZCrit))
  }

  test("text_length_ks matches brute-force KS for every source") {
    val out = Experiments.textLengthKs(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("ks_stat"), r.getAs[Long]("ks_at")))
      .toMap
    val lens = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = lens.length.toLong
    val values = lens.map(_._2).distinct.sorted
    for ((src, rows) <- lens.groupBy(_._1)) {
      val ns = rows.length.toLong
      val nr = n - ns
      val inSrc = rows.map(_._2)
      val all = lens.map(_._2)
      var best = -1L; var bestAt = Long.MaxValue
      for (x <- values) {
        val cs = inSrc.count(_ <= x).toLong
        val call = all.count(_ <= x).toLong
        val num = math.abs(cs * nr - (call - cs) * ns)
        if (num > best || (num == best && x < bestAt)) {
          if (num > best) { best = num; bestAt = x }
          else bestAt = math.min(bestAt, x)
        }
      }
      val ks = math.floor(best.toDouble / (ns * nr).toDouble * 1e6) / 1e6
      assert(out(src) == ((ns, ks, bestAt)), s"source $src")
      assert(ks >= 0.0 && ks <= 1.0)
    }
  }
}
