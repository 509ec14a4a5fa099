package graft.ops

import graft.SparkSuite

/** The PassJoin segment level must emit EXACTLY the plain blocked
  * join's pair set — including on shapes the parquet fixtures never
  * exercise: names shorter than 3 characters (which cannot form 3
  * non-empty segments and route through the short-pair union arm),
  * pairs straddling the short/long boundary, and edits at segment
  * boundaries where the ±τ position shift matters. The driver's
  * shared oracle checks the fixture data every round; this spec is
  * the adversarial complement. */
class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private def compare(rows: Seq[(String, Long, String)]): Unit = {
    val df = rows.toDF("p_brand", "p_partkey", "p_name")
    val plain = Joins.fuzzyPairs(df)
      .as[(String, Long, Long, String, String, Int)].collect().toSet
    val seg = Joins.fuzzyPairsSegmented(df)
      .as[(String, Long, Long, String, String, Int)].collect().toSet
    assert(seg === plain)
  }

  test("segment level matches plain on short, boundary, and shifted names") {
    compare(Seq(
      // short–short pairs (both below the 3-char segment minimum)
      ("b1", 1L, "ab"), ("b1", 2L, "ba"), ("b1", 3L, "a"), ("b1", 4L, ""),
      // short–long pairs across the boundary (ed("ab","abc") = 1)
      ("b1", 5L, "abc"), ("b1", 6L, "abcd"),
      // same-length substitutions and boundary edits
      ("b2", 10L, "quartz"), ("b2", 11L, "quartz"), ("b2", 12L, "quarts"),
      ("b2", 13L, "kuartz"), ("b2", 14L, "quartzy"),
      // leading insert shifts every segment by one — the ±τ window case
      ("b3", 20L, "spinach"), ("b3", 21L, "xspinach"), ("b3", 22L, "xyspinach"),
      ("b3", 23L, "spinachxy"), ("b3", 24L, "spniach"),
      // beyond the threshold (must appear in neither)
      ("b3", 25L, "broccoli"),
      // same name under different brands never pairs across blocks
      ("b4", 30L, "spinach")))
  }

  test("segment level matches plain under a dense single-letter cloud") {
    // every pair within distance ≤ 2 of a 4-char center — saturates
    // segment buckets (many shared segments) and exercises dedup of
    // multi-segment candidate hits
    val base = "abcd"
    val edits = for {
      i <- base.indices; c <- "abcd"
    } yield base.updated(i, c)
    val names = (edits ++ Seq("abcdab", "ab", "abcdef", "dcba")).distinct
    compare(names.zipWithIndex.map { case (n, i) => ("b", i.toLong, n) })
  }
}
