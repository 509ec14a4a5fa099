package graft.clients

import graft.SparkSuite

/** Search-parity fixture (FIXTURES.md §B): pins the reference client's
  * semantics — case-sensitive bytewise contains (SearchMRC.cpp:87),
  * duplicates preserved across dirs, output sorted by name
  * (MRFCore.cpp:417-420). Both the MapReduce path and the idiomatic
  * DataFrame path must agree with each other and the expectation.
  */
class SearchSpec extends SparkSuite {
  import spark.implicits._

  private val listing = Seq(
    ("/d1", "report_os.txt"), ("/d1", "notes.md"), ("/d1", "OS_upper.txt"),
    ("/d2", "report_os.txt"), // duplicate name in another dir — kept twice
    ("/d2", "the_os_book.pdf"), ("/d2", "misc.bin"),
    ("/d3", "osaka.jpg"), ("/d3", "x"), ("/empty-dir-sentinel", "zzz_no_match"))

  private val expected = Seq(
    "osaka.jpg", "report_os.txt", "report_os.txt", "the_os_book.pdf")

  test("DataFrame path: case-sensitive, duplicates kept, sorted") {
    val got = Search
      .dataframe(listing.toDF("dir", "name"), "dir", "name", "os")
      .as[String].collect().toSeq
    assert(got == expected) // "OS_upper" excluded: match is case-sensitive
  }

  test("MapReduce path agrees with DataFrame path") {
    val got = Search.viaMapReduce(listing.toDS(), "os").collect().toSeq
    assert(got == expected)
  }

  test("no matches yields empty, not error") {
    assert(Search.viaMapReduce(listing.toDS(), "ZZZZ").collect().isEmpty)
  }
}
