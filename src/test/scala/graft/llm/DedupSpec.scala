// (cluster/keeper election tests live in DedupClusterSpec)
package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit fixtures for the dedup operators: known duplicates in, known
  * survivors out. Runs the registered queries against a temp parquet
  * dir shaped like the driver tables. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  /** (doc_id, text): 0/1 exact dups; 2/3 near-dups (one token edited);
    * 4 a reordering of 0 (bag-dup but not exact-dup); 5 unrelated. */
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("dedup").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),
      (2L, base + " extra tail words here", "en", "src0", 1L),
      (3L, base + " extra tail words tweak", "en", "src0", 1L),
      (4L, base.split(" ").reverse.mkString(" "), "en", "src0", 1L),
      (5L, "totally different content with no overlap at all whatsoever", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("exact dedup groups identical texts, keeper = min id") {
    val r = Dedup.queries("q_dedup_exact")(spark, dir)
      .select("keeper", "n_copies").as[(Long, Long)].collect().toMap
    assert(r(0L) == 2L)               // docs 0 and 1 collapse
    assert(r.values.sum == 6L)        // nothing lost
    assert(!r.contains(1L))           // 1 is not a keeper
  }

  test("bag dedup also catches the reordered copy") {
    val r = Dedup.queries("q_dedup_bag")(spark, dir)
      .select("keeper", "n_copies").as[(Long, Long)].collect().toMap
    assert(r(0L) == 3L)               // 0, 1, and reordered 4 collapse
  }

  test("jaccard and minhash both find the near-dup pair (2,3)") {
    val jac = Dedup.queries("q_dedup_jaccard")(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(jac.contains((2L, 3L)))
    assert(!jac.exists { case (a, b) => a == 5L || b == 5L })
    val mh = Dedup.queries("q_dedup_minhash")(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(mh.contains((2L, 3L)))
    // exact dups are jaccard-1.0 candidates in both
    assert(jac.contains((0L, 1L)) && mh.contains((0L, 1L)))
  }

  test("jaccard value is exact for the identical pair") {
    val j = Dedup.queries("q_dedup_jaccard")(spark, dir)
      .filter(col("d1") === 0 && col("d2") === 1)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash groups identical docs into one bucket") {
    val pairs = Dedup.queries("q_dedup_simhash")(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical shingle sets → identical simhash
  }

  test("frequency cap kills boilerplate-only pairs, keeps true near-dups") {
    // Docs 0-7: a 10-token boilerplate prefix + one unique token. Any
    // two share 8 of their 9 shingles → uncapped jaccard 0.8 (spurious
    // "near-dups" glued by boilerplate; every boilerplate shingle has
    // df = 8 > 5). Docs 8-9: 11 rare tokens, last one edited → share
    // 8 of 10 shingles via df=2 shingles → survive the cap at 0.8.
    val d = java.nio.file.Files.createTempDirectory("dedupcap").toString
    val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
    val rare = (0 until 11).map(i => s"r$i").mkString(" ")
    ((0L until 8L).map(i => (i, s"$boiler u$i", "en", "src", 1L)) ++ Seq(
      (8L, rare, "en", "src", 1L),
      (9L, rare.split(" ").dropRight(1).mkString(" ") + " redit", "en", "src", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val uncapped = Dedup.queries("q_dedup_jaccard")(spark, d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val capped = Dedup.queries("q_dedup_jaccard_capped")(spark, d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((0L, 1L)))       // boilerplate glues 0-7
    assert(uncapped.contains((8L, 9L)))
    assert(capped.contains((8L, 9L)))         // rare-shingle pair survives
    assert(!capped.exists { case (a, b) => a < 8L && b < 8L }) // boilerplate pairs gone
  }

  test("lsh tuning grid: candidates and recall are monotone in rows-per-band") {
    // banding nesting theorem: a run of 2r consecutive equal slots
    // contains an aligned run of r, so cand(2x8) <= cand(4x4) <=
    // cand(8x2) <= cand(16x1) as SETS -- volumes and recall must both
    // be non-increasing in r, and the truth column constant. Pins the
    // slot-slicing arithmetic on the real sf0.001 corpus.
    val rows = Dedup.queries("q_dedup_lsh_tuning")(spark, "/root/testdata/sf0.001")
      .orderBy("rows_per_band")
      .select("rows_per_band", "n_candidates", "n_true", "n_found", "recall")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) === Seq(1, 2, 4, 8))
    val cands = rows.map(_._2)
    assert(cands === cands.sorted.reverse,
      s"candidate volume must shrink as r grows: $cands")
    val rec = rows.map(_._5)
    assert(rec === rec.sorted.reverse,
      s"recall must not rise as r grows: $rec")
    assert(rows.map(_._3).distinct.size == 1, "truth set differs across rows")
    assert(rows.forall(r => r._4 <= r._3))
  }

  test("substring dedup counts cross-doc duplicated 8-token windows") {
    // docs 0/1 identical (10 tokens -> 3 windows, all shared): ratio 1.
    // doc 2 (14 tokens, 7 windows) shares its first 6 window positions
    // with doc 3 (they diverge only at token 13), window 6 is unique.
    // doc 4 (reversed base) and doc 5 share no window with anyone.
    val r = Dedup.queries("q_dedup_substring")(spark, dir)
      .select("doc_id", "n_win", "n_dup_win", "dup_ratio")
      .as[(Long, Int, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(0L) == ((3, 3L, 1.0)))
    assert(r(1L) == ((3, 3L, 1.0)))
    assert(r(2L) == ((7, 6L, 0.8571)))
    assert(r(3L) == ((7, 6L, 0.8571)))
    assert(r(4L)._2 == 0L)
    assert(r(5L) == ((2, 0L, 0.0)))
  }
}
