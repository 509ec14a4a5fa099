package graft.llm

import graft.SparkSuite

/** Pins [[Dedup.keepers]] (connected components + keeper election):
  * multi-hop chains collapse to one component, disjoint components
  * stay apart, and every participating doc gets its component min. */
class DedupClusterSpec extends SparkSuite {
  import spark.implicits._

  test("keepers labels every doc with its component minimum") {
    // components: {1,2,3,4} via chain 4-3, 3-2, 2-1; {10,11}; {20,21,22}
    val pairs = Seq((2L, 1L), (3L, 2L), (4L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("d1", "d2")
    val got = Dedup.keepers(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("keepers converges on a long path graph (diameter > 2)") {
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.keepers(pairs).as[(Long, Long)].collect().toMap
    assert(got === (1L to 9L).map(_ -> 1L).toMap)
  }

  test("keepers refuses to return unconverged labels") {
    // 9-node path has diameter 8 — a 2-iteration budget cannot cover
    // it; silent truncation would hand back wrong keepers.
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      Dedup.keepers(pairs, maxIters = 2).count()
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("keepersBigStar matches keepers on random graphs (20 seeds)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val n = 5 + rnd.nextInt(25)
      val edges = (1 to n).flatMap { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a == b) None else Some((math.max(a, b), math.min(a, b)))
      }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("d1", "d2")
        val slow = Dedup.keepers(df).as[(Long, Long)].collect().toMap
        val fast = Dedup.keepersBigStar(df).as[(Long, Long)].collect().toMap
        assert(fast === slow, s"divergence on edge set $edges")
      }
    }
  }

  test("keepersBigStar converges on a long path within a log-size budget") {
    // 64-node path: diameter 63. Min-label propagation covers one hop
    // per round (needs >60 rounds); star contraction is done in ~log.
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      Dedup.keepers(pairs, maxIters = 10).count()
    }
    val got = Dedup.keepersBigStar(pairs, maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 64L).map(_ -> 1L).toMap)
  }

  test("keepersBigStar matches keepers on self-loop-only nodes") {
    // A doc whose only pair is (d, d) participates in `pairs`, so both
    // CC contracts must return it as its own keeper; star contraction
    // drops self-loops up front and re-attaches exactly these nodes
    // (ADVICE r4 divergence). 7 also has a real edge — its self-loop
    // must NOT duplicate or override the component label.
    val pairs = Seq((5L, 5L), (7L, 7L), (7L, 8L), (2L, 1L)).toDF("d1", "d2")
    val slow = Dedup.keepers(pairs).as[(Long, Long)].collect().toMap
    val fast = Dedup.keepersBigStar(pairs).as[(Long, Long)].collect().toMap
    assert(slow === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 7L -> 7L, 8L -> 7L))
    assert(fast === slow)
  }

  test("keepers is insensitive to duplicate and reversed input pairs") {
    // keepers skips an edge-dedup shuffle because min-label propagation
    // is idempotent under multi-edges — this pins that contract.
    val base = Seq((2L, 1L), (3L, 2L), (10L, 11L))
    val noisy = (base ++ base ++ base.map(_.swap)).toDF("d1", "d2")
    val got = Dedup.keepers(noisy).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("forget census classifies all six deletion outcomes") {
    // synthetic before/after keeper frames (tombstone rule: % 17 = 0)
    // exercising every change class, including the two the parquet
    // fixtures' pair-dominated clusters can't produce — split (the
    // tombstoned doc was a bridge) and keeper re-election:
    //   unchanged: {1,2} kb=1, intact
    //   shrunk:    {3,4,34} kb=3, 34 forgotten, keeper survives
    //   reelected: {17,18,19} kb=17 forgotten, 18-19 re-pair under 18
    //   gone:      {51,68} both forgotten
    //   dissolved: {5,85} 85 forgotten, 5 left unpaired
    //   split:     {6,7,8,9,102} kb=6, bridge 102 forgotten,
    //              survivors split into {6,7} and {8,9}
    val before = Seq(
      1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 34L -> 3L,
      17L -> 17L, 18L -> 17L, 19L -> 17L, 51L -> 51L, 68L -> 51L,
      5L -> 5L, 85L -> 5L,
      6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 6L, 102L -> 6L)
      .toDF("doc_id", "kb")
    val after = Seq(
      1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      18L -> 18L, 19L -> 18L,
      6L -> 6L, 7L -> 6L, 8L -> 8L, 9L -> 8L)
      .toDF("doc_id", "ka")
    val got = Dedup.forgetCensus(before, after)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("dissolved", 1L, 2L, 0L),
      ("gone", 1L, 2L, 0L),
      ("keeper_reelected", 1L, 3L, 2L),
      ("shrunk", 1L, 3L, 2L),
      ("split", 1L, 5L, 4L),
      ("unchanged", 1L, 2L, 2L)), s"census: $got")
  }
}
