package graft.sources

import java.nio.file.Files

import graft.{MetricsLog, SparkSuite}
import graft.clients.Search

/** Live-filesystem parity with the reference Search client
  * (SearchMRC.cpp:46-98): list real directories, filter by substring,
  * global sort, duplicates across dirs preserved, non-directories
  * dropped. Also exercises the MetricsLog listener (log-file sink). */
class DirListingSpec extends SparkSuite {

  test("DirListing lists real directories with reference semantics") {
    val root = Files.createTempDirectory("graft_ls")
    val d1 = Files.createDirectory(root.resolve("d1"))
    val d2 = Files.createDirectory(root.resolve("d2"))
    Seq("alpha.txt", "needle_one", "beta").foreach(f => Files.createFile(d1.resolve(f)))
    Seq("needle_one", "gamma_needle", "delta").foreach(f => Files.createFile(d2.resolve(f)))
    Files.createDirectory(d1.resolve("needle_dir")) // subdirs are listed too

    val listing = DirListing(spark,
      Seq(d1.toString, d2.toString,
        root.resolve("missing").toString, // not a dir → dropped
        d1.resolve("alpha.txt").toString)) // a file, not a dir → dropped

    assert(listing.count() === 7)
    val hits = Search.dataframe(listing, "dir", "name", "needle")
      .collect().map(_.getString(0)).toSeq
    // sorted, case-sensitive, duplicate "needle_one" kept once per dir
    assert(hits === Seq("gamma_needle", "needle_dir", "needle_one", "needle_one"))
  }

  test("MetricsLog appends one line per completed action") {
    val log = Files.createTempDirectory("graft_log").resolve("m.log").toString
    val l = MetricsLog.install(spark, log)
    try {
      spark.range(10).count()
      // listener fires asynchronously on the listener bus — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      def lines() =
        if (!new java.io.File(log).exists()) Seq.empty
        else scala.io.Source.fromFile(log).getLines().toSeq
      while (lines().isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(lines().nonEmpty && lines().forall(_.contains(" ok ")))
    } finally spark.listenerManager.unregister(l)
  }
}
