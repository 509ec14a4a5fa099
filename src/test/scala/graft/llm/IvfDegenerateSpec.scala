package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Degenerate-corpus behavior of the trained IVF index: a corpus that
  * leaves seed cells empty must DEGRADE (fewer cells, the k-means
  * empty-cluster standard), not fail — the r7 `require(byK.size == 4)`
  * turned an empty cell into a query crash. */
class IvfDegenerateSpec extends SparkSuite {
  import spark.implicits._

  /** embeddings.parquet with every vector = base + tiny per-id jitter
    * in ONE half-space: all 20 assign to the same seed cell. */
  private def writeCorpus(vecs: Seq[(Long, Seq[Float])]): String = {
    val d = java.nio.file.Files.createTempDirectory("ivfdeg").toString
    vecs.map { case (id, v) => (id, v, (id % 4).toInt) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("single non-empty cell: IVF degrades to one cell, no crash") {
    // identical direction, distinct magnitudes -> one cell, full scan
    val dir = writeCorpus((0L until 20L).map(i =>
      i -> Seq.fill(64)(0.1f + 0.001f * i)))
    val r = Similarity.queries("q_knn_ivf")(spark, dir)
      .select("query_id", "cell", "rnk", "neighbor_id")
      .as[(Long, Int, Int, Long)].collect()
    assert(r.length == 20 * 3)                   // every query got k=3
    assert(r.map(_._2).distinct.toSeq == Seq(0)) // one re-indexed cell
  }

  test("single cell + nprobe=2: duplicate probe is collapsed, ranks stay a permutation") {
    val dir = writeCorpus((0L until 20L).map(i =>
      i -> Seq.fill(64)(0.1f + 0.001f * i)))
    val r = Similarity.queries("q_knn_ivf_mp")(spark, dir)
      .select("query_id", "rnk", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(r.length == 20 * 3)
    // no duplicated neighbor within a query (the double-probe trap)
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length)
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3))
    }
  }

  test("two opposite half-spaces: exactly two cells, both probed") {
    val dir = writeCorpus((0L until 20L).map { i =>
      val sign = if (i < 10) 1f else -1f
      i -> Seq.fill(64)(sign * (0.1f + 0.001f * i))
    })
    val r = Similarity.queries("q_knn_ivf")(spark, dir)
      .select("query_id", "cell", "rnk", "neighbor_id")
      .as[(Long, Int, Int, Long)].collect()
    assert(r.length == 20 * 3)
    assert(r.map(_._2).distinct.sorted.toSeq == Seq(0, 1)) // re-indexed 0..1
    // nprobe=1: neighbors come from the query's own half-space
    r.foreach { case (q, _, _, n) => assert((q < 10) == (n < 10)) }
  }

  test("composed IVF×ADC survives a single-cell corpus") {
    // sq8 stats on a near-constant corpus give mn == mx on every
    // dimension the jitter doesn't move — the rescale CASE must emit
    // 0 codes, the duplicate probe must collapse, and every query
    // still gets k=3 distinct neighbors.
    val dir = writeCorpus((0L until 20L).map(i =>
      i -> Seq.fill(64)(0.1f + 0.001f * i)))
    val r = Similarity.queries("q_knn_ivf_adc")(spark, dir)
      .select("query_id", "rnk", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(r.length == 20 * 3)
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length)
    }
  }

  test("empty corpus still fails loudly (not an index with zero cells)") {
    val dir = writeCorpus(Seq.empty)
    val e = intercept[IllegalArgumentException] {
      Similarity.queries("q_knn_ivf")(spark, dir).collect()
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
