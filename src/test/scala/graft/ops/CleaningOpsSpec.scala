package graft.ops

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Crafted-input semantics for the r12 cleaning/alignment operators —
  * the oracle gate proves cross-engine agreement on the fixtures;
  * these pin the DESIGNED behavior on inputs built to exercise it. */
class CleaningOpsSpec extends SparkSuite {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("clean").toString
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_drift_psi flags an engineered length shift and stays stable on identical halves") {
    // Shifted: every even doc is short (bin 0), every odd doc long
    // (bin 3) — disjoint mass, PSI far past 0.25. Stable: identical
    // halves → every per-bin term is exactly 0.
    val shortT = (1 to 5).map(i => s"s$i").mkString(" ")
    val longT = (1 to 60).map(i => s"l$i").mkString(" ")
    val shifted = docsDir((0L until 40L).map(i =>
      (i, if (i % 2 == 0) shortT else longT)))
    val g1 = Analytics.queries("q_drift_psi")(spark, shifted)
      .select("verdict").distinct().as[String].collect().toSeq
    assert(g1 == Seq("shifted"), s"disjoint halves must flag: $g1")
    val stable = docsDir((0L until 40L).map(i => (i, longT)))
    val g2 = Analytics.queries("q_drift_psi")(spark, stable)
      .as[(Long, Long, Long, Double, Double, String)].collect().toSeq
    assert(g2.forall(_._4 == 0.0), s"identical halves must have zero terms: $g2")
    assert(g2.forall(_._6 == "stable"))
  }

  test("pii scrub detects hand-written emails, phones, and IPs in the text") {
    val dir = docsDir(Seq(
      (1L, "contact bob1@mail2.com or 555-0142 at 10.1.2.3 today"),
      (2L, "clean text with no identifiers at all")))
    val got = TextOps.queries("q_pii_scrub")(spark, dir)
      .orderBy("doc_id").collect()
    // doc 1 carries one hand-written instance of each type on top of
    // whatever the md5 arms add; doc 2 carries only the arms
    val r1 = got(0)
    assert(r1.getAs[Int]("n_email") >= 1)
    assert(r1.getAs[Int]("n_phone") >= 1)
    assert(r1.getAs[Int]("n_ip") >= 1)
    // masking is deterministic: same corpus, same masked bytes
    val again = TextOps.queries("q_pii_scrub")(spark, dir)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[String]("masked_md5")).toSeq ==
      again.map(_.getAs[String]("masked_md5")).toSeq)
  }

  test("gopher gate drops a pure-repetition doc and keeps a diverse one") {
    val dir = docsDir(Seq(
      (1L, "spam spam spam spam spam"),
      (2L, "one two three four five six")))
    val got = TextOps.queries("q_gopher_repetition")(spark, dir)
      .orderBy("doc_id").collect()
    val bad = got(0)
    assert(bad.getAs[Double]("top_word_frac") == 1.0)
    assert(bad.getAs[Double]("dup_2gram_frac") == 0.75) // 3 dup of 4 bigrams
    assert(!bad.getAs[Boolean]("keep"))
    val ok = got(1)
    assert(ok.getAs[Double]("top_word_frac") == 0.1667)
    assert(ok.getAs[Double]("dup_2gram_frac") == 0.0)
    assert(ok.getAs[Boolean]("keep"))
  }

  test("span corruption: spans are runs, counts reconcile, 1-token docs survive") {
    val dir = docsDir(Seq(
      (1L, Seq.tabulate(200)(i => s"w$i").mkString(" ")),
      (2L, "solo")))
    val got = TextOps.queries("q_span_corruption")(spark, dir)
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    val big = got(0)
    assert(big.getAs[Long]("n_tokens") == 200L)
    val masked = big.getAs[Long]("n_masked")
    val spans = big.getAs[Long]("n_spans")
    assert(masked >= spans, "every span holds >= 1 masked token")
    assert(spans > 0, "a 200-token doc at 15% must mask something")
    assert(big.getAs[Double]("avg_span_len") ==
      BigDecimal(masked.toDouble / spans)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the 1-token doc must emit a row (the sequence(1,0) guard class)
    assert(got(1).getAs[Long]("n_tokens") == 1L)
  }

  test("nearest as-of picks the smaller gap and breaks ties backward") {
    val dir = java.nio.file.Files.createTempDirectory("asofn").toString
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rows = Seq(
      // user 1: clicks at :10 and :50
      (101L, t(10), 1L, "click", 0.0, ""),
      (102L, t(50), 1L, "click", 0.0, ""),
      (201L, t(20), 1L, "purchase", 1.0, ""), // 10 vs 30 -> back :10
      (202L, t(45), 1L, "purchase", 1.0, ""), // 35 vs 5  -> fwd  :50
      (203L, t(30), 1L, "purchase", 1.0, ""), // 20 vs 20 -> tie: back
      // user 2: only a later click -> forward-only match
      (103L, t(40), 2L, "click", 0.0, ""),
      (204L, t(5), 2L, "purchase", 1.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Joins.queries("q_join_asof_nearest")(spark, dir)
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("click_id"),
        r.getAs[String]("direction"), r.getAs[Long]("gap_us")))
    assert(got.toSeq == Seq(
      (201L, 101L, "back", 600000000L),
      (202L, 102L, "fwd", 300000000L),
      (203L, 101L, "back", 1200000000L),
      (204L, 103L, "fwd", 2100000000L)))
  }

  test("shard-loss accounting identities hold on real data") {
    val r = graft.llm.Dedup.queries("q_dedup_shard_loss")(
      spark, "/root/testdata/sf0.001").head()
    val nDocs = r.getAs[Long]("n_docs")
    val global = r.getAs[Long]("global_removable")
    val local = r.getAs[Long]("local_removable")
    val missed = r.getAs[Long]("missed")
    assert(global >= local, "shard-local dedup can never remove MORE")
    assert(missed == global - local)
    assert(global <= nDocs && local >= 0)
  }
}
