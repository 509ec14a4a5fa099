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
}
