package graft.llm

import graft.SparkSuite

/** Pins [[Clustering.lloyd]]: the iterated k-means loop must descend
  * (Lloyd's monotonicity, modulo integer centroid rounding) and stay
  * deterministic — the driver only ever moves K×64 centroid ints. */
class ClusteringSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("lloyd inertia is non-increasing across iterations") {
    val (_, history) = Clustering.lloyd(spark, sf, iters = 3)
    assert(history.size == 3)
    // integer centroid rounding can cost at most a sliver; require
    // monotone descent within a 0.1% slack per step
    history.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + a / 1000,
        s"inertia rose: $history")
    }
    assert(history.last < history.head, s"no descent at all: $history")
  }

  test("lloyd is deterministic") {
    val (c1, h1) = Clustering.lloyd(spark, sf, iters = 2)
    val (c2, h2) = Clustering.lloyd(spark, sf, iters = 2)
    assert(c1 === c2)
    assert(h1 === h2)
  }
}
