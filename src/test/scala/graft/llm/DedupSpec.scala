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
    // with doc 3 (they diverge only at token 14, 'here' vs 'tweak'), so
    // the 7th window (0-based index 6) is each doc's unique one.
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

  test("incremental screen: exact beats near, delta never self-matches") {
    val d = java.nio.file.Files.createTempDirectory("dedupincr").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten eleven"
    Seq(
      // standing corpus (not src1)
      (0L, base, "en", "src0", 1L),
      (2L, other, "en", "src2", 1L),
      // delta
      (10L, base, "en", "src1", 1L),           // exact copy of corpus 0
      (11L, other + " twelve", "en", "src1", 1L), // near-dup of corpus 2
      (12L, base, "en", "src1", 1L),           // second exact copy
      (13L, "totally unrelated content with zero overlap anywhere at all", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Dedup.queries("q_dedup_incremental")(spark, d)
      .select("doc_id", "status")
      .as[(Long, String)].collect().toMap
    assert(r(10L) == "exact_dup")
    assert(r(12L) == "exact_dup") // both delta copies match the CORPUS,
                                  // never each other (no delta self-join)
    assert(r(11L) == "near_dup")
    assert(r(13L) == "new")
  }

  test("streamed incremental screen is row-identical to the batch query (static parity)") {
    // Streams.incrementalScreen computes the minhash signature
    // SCAN-SIDE (per-row array ops) where the batch query uses the
    // explode + groupBy aggregate — this pins that the two signature
    // paths produce identical band keys, statuses and match ids.
    val d = java.nio.file.Files.createTempDirectory("dedupincrpar").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten eleven"
    Seq(
      (0L, base, "en", "src0", 1L),
      (2L, other, "en", "src2", 1L),
      (10L, base, "en", "src1", 1L),
      (11L, other + " twelve", "en", "src1", 1L),
      (12L, "xy", "en", "src1", 1L),            // <3 tokens: no shingles
      (13L, "totally unrelated content with zero overlap anywhere at all", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val corpus = docs.filter(col("source") =!= "src1")
    val exactIdx = corpus.groupBy(md5(col("text")).as("chash"))
      .agg(min(col("doc_id")).as("exact_match"))
    val bandIdx = Dedup.bandsAt(Dedup.shinglesOf(corpus), 4)
      .groupBy(col("band"), col("bkey"))
      .agg(min(col("doc_id")).as("cdoc"))
    val streamed = graft.streaming.Streams
      .incrementalScreen(docs.filter(col("source") === "src1"), exactIdx, bandIdx)
      .select("doc_id", "status", "match_id")
      .as[(Long, String, Option[Long])].collect().toSet
    val batch = Dedup.queries("q_dedup_incremental")(spark, d)
      .select("doc_id", "status", "match_id")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(streamed === batch)
    assert(batch.contains((10L, "exact_dup", Some(0L))))
    assert(batch.contains((11L, "near_dup", Some(2L))))
    assert(batch.contains((12L, "new", None)))
  }

  test("substring spans coalesce adjacent duplicated windows into maximal intervals") {
    // docs 0/1: all 3 windows duplicated -> positions 0..2 -> one span
    // covering the whole 10-token doc: (0, 10). docs 2/3: positions
    // 0..5 duplicated, 6 unique -> one span (0, 5 - 0 + 8) = (0, 13).
    // docs 4/5: no duplicated window -> no row at all.
    val r = Dedup.queries("q_dedup_substring_spans")(spark, dir)
      .select("doc_id", "span_start", "span_len")
      .as[(Long, Int, Int)].collect().toSeq
    assert(r.sorted === Seq(
      (0L, 0, 10), (1L, 0, 10), (2L, 0, 13), (3L, 0, 13)))
  }

  test("substring spans split on a gap between duplicated runs") {
    // Two docs share an 8-token prefix AND an 8-token suffix but differ
    // in the middle -> two islands per doc, not one merged span.
    val d = java.nio.file.Files.createTempDirectory("dedupspan").toString
    val pre = (0 until 8).map(i => s"p$i").mkString(" ")
    val suf = (0 until 8).map(i => s"s$i").mkString(" ")
    Seq(
      (0L, s"$pre mid0a mid0b $suf", "en", "src", 1L),
      (1L, s"$pre mid1a mid1b $suf", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Dedup.queries("q_dedup_substring_spans")(spark, d)
      .select("doc_id", "span_start", "span_len")
      .as[(Long, Int, Int)].collect().toSeq
    // 18 tokens, windows 0..10; only window 0 (= pre) and window 10
    // (= suf) are cross-doc duplicated -> spans (0, 8) and (10, 8).
    assert(r.sorted === Seq((0L, 0, 8), (0L, 10, 8), (1L, 0, 8), (1L, 10, 8)))
  }

  test("total-occurrence variant also counts within-doc repeats") {
    // One doc = the same 8 tokens twice (its 9 interior windows
    // include the repeated start window), another unrelated: the
    // cross-doc query sees NO duplication, the total-occurrence one
    // flags the self-repeated windows. Window 0 (tokens 0-7) and
    // window 8 (tokens 8-15) are the identical repeated block.
    val d = java.nio.file.Files.createTempDirectory("dedupselfrep").toString
    val block = (0 until 8).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, s"$block $block", "en", "src", 1L),
      (1L, (0 until 16).map(i => s"u$i").mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val cross = Dedup.queries("q_dedup_substring")(spark, d)
      .select("doc_id", "n_dup_win").as[(Long, Long)].collect().toMap
    val total = Dedup.queries("q_dedup_substring_rep")(spark, d)
      .select("doc_id", "n_dup_win").as[(Long, Long)].collect().toMap
    assert(cross(0L) == 0L && cross(1L) == 0L) // nothing cross-doc
    assert(total(0L) == 2L)  // the two copies of the repeated window
    assert(total(1L) == 0L)
  }

  test("span excision removes exactly the duplicated ranges and reassembles the rest") {
    // dir fixture: docs 0/1 fully duplicated -> everything excised;
    // docs 2/3 keep only the token past their shared 13-token span;
    // docs 4/5 untouched (no duplicated window).
    val r = Dedup.queries("q_dedup_substring_clean")(spark, dir)
      .select("doc_id", "n_tok", "n_kept", "clean_hash")
      .as[(Long, Int, Long, String)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val md5Empty = "d41d8cd98f00b204e9800998ecf8427e"
    assert(r(0L) == ((10, 0L, md5Empty)) && r(1L) == ((10, 0L, md5Empty)))
    assert(r(2L)._2 == 1L && r(3L)._2 == 1L)   // one surviving token
    assert(r(2L)._3 != r(3L)._3)               // 'here' vs 'tweak'
    assert(r(4L) == ((10, 10L, r(4L)._3)) && r(4L)._3 != md5Empty)
    assert(r(5L)._1 == 9 && r(5L)._2 == 9L)    // short doc kept whole
  }

  test("substring dedup survives docs shorter than the window") {
    // Regression: sequence(0, size(t)-8) with a negative stop DESCENDS
    // in Spark, and slice(t, i+1, 8) at i = -1 throws — so a <8-token
    // doc used to kill the whole query. The guard drops such docs the
    // same way the DuckDB twin's empty generate_series does.
    val d = java.nio.file.Files.createTempDirectory("dedupshort").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (0L, base, "en", "src", 1L),
      (1L, base, "en", "src", 1L),
      (2L, "too short", "en", "src", 1L),            // 2 tokens
      (3L, "a b c d e f g", "en", "src", 1L),        // 7 tokens: still short
      (4L, "a b c d e f g h", "en", "src", 1L))      // exactly 8: 1 window
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Dedup.queries("q_dedup_substring")(spark, d)
      .select("doc_id", "n_win", "n_dup_win")
      .as[(Long, Int, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(!r.contains(2L) && !r.contains(3L))  // no window → no row
    assert(r(4L) == ((1, 0L)))                  // exactly one, unshared
    assert(r(0L) == ((3, 3L)) && r(1L) == ((3, 3L)))
  }

  test("q_dedup_ppjoin is LOSSLESS: identical result set to the unfiltered join") {
    // The prefix filter's whole claim — candidates restricted to the
    // rarest s − ⌈τ·s⌉ + 1 shingles per doc miss NOTHING at τ = 0.8.
    val dir = "/root/testdata/sf0.001"
    val pp = Dedup.queries("q_dedup_ppjoin")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.queries("q_dedup_jaccard")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(full.nonEmpty)
    assert(pp == full)
  }

  test("URL canonicalizer: casing, default ports, utm params, slash, fragment") {
    val urls = Seq(
      // all the collapse arms at once → one canonical form
      "HTTP://EX3.COM:80/p7/?utm_src=x&b=1&a=2#sec",
      "http://ex3.com/p7?a=2&b=1",
      // https keeps :80 (NOT its default port)
      "https://ex3.com:80/p7",
      // non-default port survives; root path keeps its slash
      "http://ex3.com:8080/",
      // empty query after utm_ removal → no '?'
      "http://ex3.com/p7?utm_src=x")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    val got = Dedup.canonicalizeUrl(urls)
      .select("doc_id", "canon").as[(Long, String)].collect().toMap
    assert(got(0L) == "http://ex3.com/p7?a=2&b=1")
    assert(got(1L) == "http://ex3.com/p7?a=2&b=1")
    assert(got(2L) == "https://ex3.com:80/p7")
    assert(got(3L) == "http://ex3.com:8080/")
    assert(got(4L) == "http://ex3.com/p7")
  }

  test("q_dedup_url groups collapse raw variants: n_raw_forms <= n_copies") {
    val got = Dedup.queries("q_dedup_url")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, nc, nr) => nr <= nc && nr >= 1 })
    // the synthesis arms guarantee every canon starts with http(s)://
    assert(got.forall(_._1.matches("^https?://ex[0-7]\\.com.*")))
  }

  test("suffix-automaton census matches brute-force substring enumeration") {
    // independent O(n³) witness: enumerate every (i, l) substring
    def brute(t: String): (Long, Long, Int) = {
      val occ = scala.collection.mutable.Map.empty[String, Int]
      for (i <- 0 until t.length; l <- 1 to t.length - i)
        occ.updateWith(t.substring(i, i + l))(c => Some(c.getOrElse(0) + 1))
      val rep = occ.filter(_._2 >= 2)
      (occ.size.toLong, rep.size.toLong,
        if (rep.isEmpty) 0 else rep.keysIterator.map(_.length).max)
    }
    // crafted shapes: clone-inducing (abcbc), periodic, unary runs,
    // no-repeat, empty, and the fixture corpus' own token style
    val crafted = Seq("", "a", "aa", "aaaa", "ab", "abab", "ababab",
      "abcbc", "banana", "mississippi", "abcabcabcabc",
      "the cat the cat sat", "xyxyxyxzyx")
    val rnd = new scala.util.Random(421)
    val random = Seq.fill(60)(
      (0 until (1 + rnd.nextInt(48))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString) // 3-letter alphabet → dense repeats and clones
    (crafted ++ random).foreach { t =>
      val got = Dedup.samCensus(9L, t)
      val (nd, nr, lrs) = brute(t)
      assert((got.n_chars, got.n_distinct, got.n_rep_distinct, got.lrs_len) ==
        ((t.length, nd, nr, lrs)), s"text '$t'")
    }
  }
}
