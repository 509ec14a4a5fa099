package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Skew fixture from FIXTURES.md §B: 10k rows with one hot key carrying
  * 90% of the data. Pins that the salted join is row-identical to the
  * plain shuffled join, hot key included, and that grouping over the
  * skewed key is exact. */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val big = {
    val rows = (1 to 10000).map { i =>
      val k = if (i <= 9000) 49L else i.toLong % 49 // hot key 49, disjoint from the rest
      (k, i.toLong)
    }
    rows.toDF("k", "payload")
  }
  private lazy val small =
    (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "attr")

  test("salted join equals plain join under 90% single-key skew") {
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "attr")
    val salted = SkewJoin.salted(big, small, "k", saltBuckets = 8)
      .select("k", "payload", "attr")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("grouping the skewed key stays exact") {
    val agg = big.groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .filter($"k" === 49L).as[(Long, Long, Long)].collect().head
    assert(agg._2 === 9000L)
    assert(agg._3 === (1L to 9000L).sum)
  }
}
