package graft.llm

import graft.SparkSuite

/** Pins the compression-ratio quality signal: repetitive text
  * compresses far better than varied text, ratios are in (0, ~1.2],
  * and the computation is deterministic across runs. */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (2L, "the quick brown fox jumps over a lazy dog near the riverbank"),
    (3L, "x")).toDF("doc_id", "text")

  test("repetitive text compresses much better than varied text") {
    val r = TextAnalysis.compressionRatio(docs)
      .as[(Long, Int, Int, Double)].collect()
      .map(x => x._1 -> x._4).toMap
    assert(r(1L) < r(2L) * 0.6) // repetition → markedly lower ratio
    assert(r(2L) > 0 && r(2L) < 1.5) // normal prose ≈ ratio < 1.5
    assert(r(3L) > 1.0) // tiny doc: fixed deflate overhead dominates
  }

  test("ratios are deterministic across runs") {
    val a = TextAnalysis.compressionRatio(docs).collect().toSeq.sortBy(_.getLong(0))
    val b = TextAnalysis.compressionRatio(docs).collect().toSeq.sortBy(_.getLong(0))
    assert(a === b)
  }
}
