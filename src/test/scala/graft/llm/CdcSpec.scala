package graft.llm

import graft.SparkSuite

/** Independent-model check of the content-defined chunker (the JPEG
  * sweep discipline): recompute the boundary rule here with none of
  * the query's array machinery and compare the chunk multiset, then
  * pin the locality property the operator exists for — an insertion
  * re-chunks O(1) chunks, never the whole doc. */
class CdcSpec extends SparkSuite {
  import spark.implicits._

  /** The reference chunker: 4-word window ending at word i (0-based),
    * boundary after i when the md5-window hash ≡ 0 (mod 16), cuts
    * restricted to i + 1 ≤ n − 1, forced final cut at n. */
  private def modelChunks(text: String): Seq[String] = {
    val t = text.split(" ", -1)
    def h(w: Seq[String]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.mkString(" ").getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val cuts = (3 to t.length - 2).filter(i =>
      h(t.slice(i - 3, i + 1)) % 16 == 0).map(_ + 1) :+ t.length
    cuts.zip(0 +: cuts.init).map { case (c, p) =>
      t.slice(p, c).mkString(" ")
    }
  }

  test("chunker matches the independent model on corpus docs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().take(100)
    val got = Dedup.cdcChunks(
      docs.toSeq.toDF("doc_id", "text"))
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    docs.foreach { case (id, text) =>
      val want = modelChunks(text).sorted
      assert(got(id) == want, s"doc $id: ${got(id)} != $want")
      // chunks partition the word stream: multiset of words survives
      assert(got(id).flatMap(_.split(" ", -1)).sorted.toSeq ==
        text.split(" ", -1).sorted.toSeq)
    }
  }

  test("insertion locality: a prefix word re-chunks O(1) chunks") {
    // distinct words: periodic text would alias chunks and break the
    // set-based survival count
    val words = (0 until 400).map(i => s"w$i")
    val base = words.mkString(" ")
    val bc = modelChunks(base)
    val sc = modelChunks("PAD " + base)
    assert(bc.size > 10, s"fixture too coarse: ${bc.size} chunks")
    // every chunk except a bounded head region survives verbatim
    val surviving = bc.toSet.intersect(sc.toSet).size
    assert(bc.size - surviving <= 3,
      s"insertion disturbed ${bc.size - surviving} of ${bc.size} chunks")
  }

  test("registered shift row: CDC survival strictly beats fixed blocks") {
    val rows = Dedup.queries("q_dedup_cdc_shift")(
      spark, "/root/testdata/sf0.001").collect()
    val bp = rows.map(r =>
      r.getAs[String]("method") -> r.getAs[Long]("survival_bp")).toMap
    assert(bp("cdc") > 5000L, s"cdc survival ${bp("cdc")} bp")
    assert(bp("cdc") > bp("fixed16") + 2000L,
      s"cdc ${bp("cdc")} vs fixed ${bp("fixed16")}")
  }
}
