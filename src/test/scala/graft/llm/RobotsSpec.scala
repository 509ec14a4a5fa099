package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Adversarial bodies for the robots.txt section parser — shapes the
  * md5-synthesized fixture can't produce. The parser is a line-state
  * machine; every test pins a way a naive regexp-grep would differ. */
class RobotsSpec extends SparkSuite {
  import spark.implicits._

  private def rules(bodies: Seq[String]): Seq[Seq[String]] =
    bodies.toDF("robots")
      .select(expr(Dedup.robotsParseExpr).as("p"))
      .as[Seq[String]].collect().toSeq

  test("only the star section's Disallow rules are collected") {
    val Seq(a, b, c, d, e) = rules(Seq(
      // decoy agent first: its rule must not leak
      "User-agent: GoodBot\nDisallow: /secret\n" +
        "User-agent: *\nDisallow: /a\nDisallow: /b\nCrawl-delay: 1\n",
      // star first, then another agent whose rules must close the set
      "User-agent: *\nDisallow: /a\nUser-agent: Evil\nDisallow: /z\n",
      // no star section at all: nothing collected
      "User-agent: GoodBot\nDisallow: /secret\n",
      // Disallow before any section header: ignored (no open section)
      "Disallow: /orphan\nUser-agent: *\nDisallow: /a\n",
      // values are trimmed; unknown directives inside the section skip
      "User-agent: *\nDisallow:   /a  \nSitemap: x\nDisallow: /b\n"))
    assert(a == Seq("/a", "/b"), s"decoy leaked: $a")
    assert(b == Seq("/a"), s"post-section rule leaked: $b")
    assert(c == Seq(), s"phantom star section: $c")
    assert(d == Seq("/a"), s"orphan rule collected: $d")
    assert(e == Seq("/a", "/b"), s"trim/skip broke: $e")
  }

  test("a reopened star section keeps accumulating (order-sensitivity)") {
    val Seq(p) = rules(Seq(
      "User-agent: *\nDisallow: /a\nUser-agent: X\nDisallow: /x\n" +
        "User-agent: *\nDisallow: /b\n"))
    assert(p == Seq("/a", "/b"), p.toString)
  }

  test("Crawl-delay parses from the star section only; missing defaults to 1") {
    def delays(bodies: Seq[String]): Seq[Int] =
      bodies.toDF("robots")
        .select(expr(Dedup.robotsDelayExpr).as("d"))
        .as[Int].collect().toSeq
    val Seq(a, b, c, d) = delays(Seq(
      // decoy section's delay must not leak; star's wins
      "User-agent: GoodBot\nCrawl-delay: 9\n" +
        "User-agent: *\nDisallow: /a\nCrawl-delay: 4\n",
      // delay only in a decoy section: the default stands
      "User-agent: GoodBot\nCrawl-delay: 9\nUser-agent: *\nDisallow: /a\n",
      // no delay anywhere: default
      "User-agent: *\nDisallow: /a\n",
      // later star value overrides (last write wins, trimmed)
      "User-agent: *\nCrawl-delay:  2 \nUser-agent: X\nCrawl-delay: 7\n" +
        "User-agent: *\nCrawl-delay: 5\n"))
    assert(a == 4, s"decoy delay leaked: $a")
    assert(b == 1, s"decoy-only delay leaked: $b")
    assert(c == 1, s"default broke: $c")
    assert(d == 5, s"reopened-section override broke: $d")
  }
}
