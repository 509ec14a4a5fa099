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

  test("in-plan 2-step refinement survives a degenerate corpus") {
    // 3 vectors leave most seed cells empty: the NULL cross-multiplied
    // comparisons must fall through the argmin CASE identically in
    // both engines (the oracle pins cross-engine equality; this pins
    // that the plan neither crashes nor loses vectors), empty cells
    // simply don't emit rows, and a singleton cell has EXACTLY zero
    // n²-scaled inertia (its sum IS n·v).
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("tiny_ivf").toString
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 0.1).toFloat)
    Seq((0L, v, 0), (1L, v.map(-_), 0), (2L, v.map(x => (x * 2).toFloat), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = Clustering.queries("q_kmeans_2step")(spark, d)
      .as[(Int, Long, Long)].collect().toSeq
    assert(rows.map(_._2).sum === 3L, s"vectors lost: $rows")
    rows.filter(_._2 == 1L).foreach { r =>
      assert(r._3 === 0L, s"singleton cell with nonzero inertia: $r")
    }
  }

  test("q_embed_pca recovers a planted principal direction") {
    // Variance planted almost entirely on dim 1 (±10), a sliver on
    // dim 2 (±1, correlated with dim 1 through vecs 3/4), zero
    // elsewhere. Power iteration must converge to ±e1: loading(1)
    // saturates at exactly 1.0 (it IS the max |c|), dim 2 carries the
    // small coupled loading, dims 3..64 are exactly 0 (all-integer
    // zero sums — no float dust).
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("pca").toString
    def v(a: Float, b: Float) = Array.tabulate(64)(i =>
      if (i == 0) a else if (i == 1) b else 0f)
    Seq((1L, v(10f, 0f), 0), (2L, v(-10f, 0f), 0),
        (3L, v(0.1f, 1f), 0), (4L, v(-0.1f, -1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = Clustering.queries("q_embed_pca")(spark, d)
      .as[(Int, Int, Double)].collect().toSeq
    assert(rows.size == 192)
    val it3 = rows.filter(_._1 == 3).map(r => r._2 -> r._3).toMap
    assert(it3(1) == 1.0, s"dominant loading: ${it3(1)}")
    assert(math.abs(it3(2)) > 0.0 && math.abs(it3(2)) < 0.05,
      s"coupled loading: ${it3(2)}")
    (3 to 64).foreach(j => assert(it3(j) == 0.0, s"dim $j: ${it3(j)}"))

    // deflation on the same corpus: PC2 must land on the residual
    // dim-2 variance — saturated there, small on the deflated dim 1,
    // exact integer zero elsewhere
    val rows2 = Clustering.queries("q_embed_pca2")(spark, d)
      .as[(Int, Int, Double)].collect().toSeq
    val p2 = rows2.filter(_._1 == 3).map(r => r._2 -> r._3).toMap
    assert(math.abs(p2(2)) == 1.0, s"pc2 dominant loading: ${p2(2)}")
    assert(math.abs(p2(1)) < 0.2, s"pc2 deflated dim: ${p2(1)}")
    (3 to 64).foreach(j => assert(p2(j) == 0.0, s"pc2 dim $j: ${p2(j)}"))
  }

  test("k-center seeding: distinct centers, non-increasing max-min radius") {
    val rows = Clustering.queries("q_kmeans_kcenter")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Int]("round"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("d2")))
    assert(rows.length == 4)
    assert(rows.map(_._2).distinct.length == 4, "centers must be distinct")
    // farthest-first invariant: adding a center can only shrink every
    // point's min-distance, so the selected argmax is non-increasing
    val radii = rows.sortBy(_._1).drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"max-min radius increased: $radii")
  }

  test("k-center seeding stops early when the corpus has fewer vectors than K") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("tiny_kc").toString
    val v = Array.tabulate(64)(i => (math.cos(i + 1) * 0.1).toFloat)
    Seq((0L, v, 0), (1L, v.map(-_), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = Clustering.queries("q_kmeans_kcenter")(spark, d).collect()
    assert(rows.length == 2, s"expected 2 seeds from a 2-vector corpus")
  }
}
