package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit fixtures for the ANN operators and the recall@3 quality
  * metric — written quantizer-agnostic (they must survive swapping the
  * coarse quantizer, as r4 did going component-signs → SRP):
  *  - an identical-vector corpus shares one cell under ANY linear-sign
  *    quantizer → recall exactly 1.0;
  *  - multiprobe candidates are a superset of single-probe candidates,
  *    so recall@k is provably monotone in the probe set — checked as
  *    an invariant, with STRICT aggregate improvement demonstrated on
  *    the real sf0.001 embeddings. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def writeEmb(rows: Seq[(Long, Array[Float], Int)]): String = {
    val d = java.nio.file.Files.createTempDirectory("sim").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("recall@3 is exactly 1.0 on an identical-vector corpus") {
    // identical vectors → identical bucket bits under any sign
    // quantizer → ANN candidates == brute candidates → recall 1.0
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 2).toFloat)
    val dir = writeEmb((0L until 8L).map(i => (i, v, 0)))
    val r = Similarity.queries("q_knn_recall")(spark, dir)
      .select("query_id", "recall_at_3").as[(Long, Double)].collect().toMap
    assert(r.nonEmpty)
    assert(r.values.forall(_ == 1.0))
  }

  test("multiprobe recall dominates single-probe recall (real sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val sp = Similarity.queries("q_knn_recall")(spark, dir)
      .select("query_id", "recall_at_3").as[(Long, Double)].collect().toMap
    val mp = Similarity.queries("q_knn_recall_mp")(spark, dir)
      .select("query_id", "recall_at_3").as[(Long, Double)].collect().toMap
    assert(sp.keySet == mp.keySet)
    assert(sp.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(mp.values.forall(v => v >= 0.0 && v <= 1.0))
    // superset of candidates ⇒ per-query monotone …
    assert(sp.keySet.forall(q => mp(q) >= sp(q)))
    // … and on real data the wider probe strictly helps in aggregate
    assert(mp.values.sum > sp.values.sum)
  }

  test("argmin/second-argmin CASE generators rank every distance permutation") {
    // the IVF cell assignment rides on these generated fall-through
    // CASEs (Spark plan AND DuckDB twin share the structure) — pin
    // them against a reference argmin over all 4-element distance
    // vectors from {0,5,9}, ties included (lowest id must win)
    val vals = Seq(0, 5, 9)
    val cases = for (a <- vals; b <- vals; c <- vals; d <- vals)
      yield Seq(a, b, c, d)
    val results = cases.map { ds =>
      val cond = (k: Int, j: Int) => s"${ds(k)} <= ${ds(j)}"
      spark.range(1).selectExpr(
        s"${Similarity.argminCase(cond)} as best",
        s"${Similarity.secondCase(s"(${Similarity.argminCase(cond)})", cond)} as second")
        .as[(Int, Int)].head()
    }
    cases.zip(results).foreach { case (ds, (best, second)) =>
      val expBest = ds.zipWithIndex.minBy { case (v, i) => (v, i) }._2
      val expSecond = ds.zipWithIndex.filter(_._2 != expBest)
        .minBy { case (v, i) => (v, i) }._2
      assert(best === expBest, s"argmin of $ds")
      assert(second === expSecond, s"second-argmin of $ds")
    }
  }

  test("q_knn_recall output is one row per query with pairs, sorted") {
    val v = Array.tabulate(64)(i => (math.cos(i) * 3).toFloat)
    val dir = writeEmb((0L until 6L).map(i =>
      (i, v.updated(i.toInt, v(i.toInt) + 0.5f), 0)))
    val rows = Similarity.queries("q_knn_recall")(spark, dir)
      .select("query_id").as[Long].collect()
    assert(rows.toSeq == rows.toSeq.sorted)
    assert(rows.length == rows.distinct.length)
  }

  test("q_knn_graph generalizes q_knn_ivf_mp: same rows on the query batch") {
    // The graph is "ivf_mp with every node as a query" — restricting
    // it to ivf_mp's vec_id < 50 batch must reproduce ivf_mp's rows
    // exactly (same index, same probes, same ranking). Pins the two
    // plans to one semantic even as either is refactored.
    val dir = "/root/testdata/sf0.001"
    val g = Similarity.queries("q_knn_graph")(spark, dir)
      .filter($"vec_id" < 50)
      .select($"vec_id", $"rnk", $"neighbor_id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    val mp = Similarity.queries("q_knn_ivf_mp")(spark, dir)
      .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(mp.nonEmpty)
    assert(g == mp)
  }

  test("q_graph_communities: two cliques converge to per-clique labels") {
    // Two groups of 4 identical vectors, mutually negated: within a
    // group cosine = 1.0 (top-3 = the other three members, ids
    // ascending on the tie), across groups −1.0. LPA round 1: every
    // node adopts the lowest OTHER id among its neighbors (0→1,
    // {1,2,3}→0; 4→5, {5,6,7}→4); round 2 folds the stragglers back
    // (0 sees {0,0,0}→0; 1 sees {1,0,0}→0) — final labels are the
    // clique minima.
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)
    val neg = v.map(x => -x)
    val dir = writeEmb(
      (0L until 4L).map(i => (i, v, 0)) ++
        (4L until 8L).map(i => (i, neg, 1)))
    val got = Similarity.queries("q_graph_communities")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 4L))
  }

  test("q_knn_graph covers every corpus node with exactly k rows (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val n = graft.Tables(spark, dir, "embeddings").count()
    val perNode = Similarity.queries("q_knn_graph")(spark, dir)
      .groupBy("vec_id").count().as[(Long, Long)].collect()
    assert(perNode.length.toLong == n, "every node appears in the graph")
    assert(perNode.forall(_._2 == 3L), "exactly k = 3 neighbors per node")
  }

  test("packed BQ ranks identically to the array form (real sf0.001)") {
    // the 2×32-bit popcount encoding is a pure re-representation of
    // the sign vector — every (query, rank, neighbor, hamming) row
    // must match the zip_with array form exactly
    val dir = "/root/testdata/sf0.001"
    val arr = Similarity.queries("q_knn_bq")(spark, dir)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val packed = Similarity.queries("q_knn_bq_packed")(spark, dir)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(arr.nonEmpty && arr == packed)
  }
}
