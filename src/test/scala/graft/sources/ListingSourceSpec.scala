package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** DSv2 listing source: correctness vs DirListing, filter pushdown
  * (predicate evaluated inside the scan, visible as PushedFilters in
  * the physical plan), and column pruning. */
class ListingSourceSpec extends SparkSuite {

  private lazy val dirs = {
    val root = Files.createTempDirectory("graft_dsv2")
    val d1 = Files.createDirectory(root.resolve("d1"))
    val d2 = Files.createDirectory(root.resolve("d2"))
    Seq("alpha_needle", "beta", "gamma").foreach(f => Files.createFile(d1.resolve(f)))
    Seq("alpha_needle", "delta_needle").foreach(f => Files.createFile(d2.resolve(f)))
    Seq(d1.toString, d2.toString)
  }

  private def read() = spark.read
    .format(classOf[ListingSource].getName)
    .option("paths", dirs.mkString(","))
    .load()

  test("reads (dir, name) rows with reference semantics") {
    val got = read().collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = DirListing(spark, dirs).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === want && got.size === 5)
  }

  test("contains filter is pushed into the scan") {
    val q = read().filter(col("name").contains("needle")).select("name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("StringContains"), s"filter not pushed:\n$plan")
    val names = q.collect().map(_.getString(0)).sorted.toSeq
    assert(names === Seq("alpha_needle", "alpha_needle", "delta_needle"))
  }

  test("column pruning reaches the source") {
    val q = read().select("name")
    assert(q.schema.fieldNames.toSeq === Seq("name"))
    assert(q.count() === 5)
  }
}
