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

  test("pushdown lands in the SCAN NODE and the reader filters, not a post-scan Filter") {
    // Two pins that fail if pushdown silently stops:
    //  1. the pushed filter must appear in the scan node's own
    //     description (ListingScan prints `pushed=…` — a generic
    //     "StringContains somewhere in the plan" would also match a
    //     leftover post-scan Filter node and miss the regression);
    //  2. behaviorally, the scan must EMIT only the matching rows
    //     (numOutputRows == 3 of 5) — the PartitionPruningSpec trick:
    //     if the predicate were re-evaluated above the scan instead,
    //     the scan's own output count reverts to 5.
    val q = read().filter(col("name").contains("needle")).select("name")
    q.collect()
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ListingScan")).getOrElse(fail("no ListingScan node"))
    assert(scanLine.contains("pushed=") && scanLine.contains("StringContains"),
      s"pushed-filters string missing from the scan node: $scanLine")
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .find(_.toString.contains("ListingScan"))
      .getOrElse(fail("no BatchScan leaf"))
    assert(scan.metrics("numOutputRows").value === 3,
      "scan emitted unfiltered rows — the reader is not applying the pushed filter")
  }

  test("pruned read schema reaches the scan node (name only, no dir)") {
    val q = read().filter(col("name").contains("needle")).select("name")
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ListingScan")).getOrElse(fail("no ListingScan node"))
    // DSv2 prints the scan's output attribute list: dir must be gone
    assert(!scanLine.contains("dir#"),
      s"dir survived pruning in the scan node: $scanLine")
  }

  test("count(*) is absorbed into the scan — no listing rows surface") {
    // the engine-native depth step past filter pushdown: the scan node
    // must be the AGGREGATE scan (one partial row per directory, the
    // pushed functions in its description) and its numOutputRows must
    // be the PARTITION count (2 dirs), never the entry count (5) —
    // while the value matches the unpushed plan exactly
    val q = read().agg(count(lit(1)))
    val got = q.collect().head.getLong(0)
    assert(got === 5L, "pushed count disagrees with the listing")
    // the agg plan carries an exchange, so AQE wraps it and the
    // executed tree's leaves are QueryStageExec wrappers — unwrap
    // recursively to reach the BatchScanExec and its metric
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case qs: QueryStageExec => qs +: nodes(qs.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val all = nodes(q.queryExecution.executedPlan)
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ListingAggScan")).getOrElse(
        fail("no ListingAggScan node — aggregate not pushed:\n" +
          q.queryExecution.executedPlan.toString))
    assert(scanLine.contains("PushedAggregates=[count_star()]"), scanLine)
    val scan = all.find(p =>
        p.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] &&
        p.toString.contains("ListingAggScan"))
      .getOrElse(fail("no BatchScan leaf"))
    assert(scan.metrics("numOutputRows").value === 2,
      "scan surfaced listing rows instead of per-partition partials")
  }

  test("pushed min/max/count match the unpushed values, filters compose") {
    val q = read().filter(col("name").contains("needle"))
      .agg(count(lit(1)).as("n"), min(col("name")).as("mn"),
        max(col("name")).as("mx"))
    val r = q.collect().head
    assert((r.getLong(0), r.getString(1), r.getString(2)) ===
      ((3L, "alpha_needle", "delta_needle")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ListingAggScan") && plan.contains("min(name)") &&
      plan.contains("max(name)") && plan.contains("StringContains"),
      s"aggregate + filter must both reach the scan:\n$plan")
  }

  test("limit is pushed into the scan and bounds each partition's walk") {
    // plan pin: the scan node itself must print PushedLimit — and the
    // scan's own output must be bounded per PARTITION (2 dirs × ≤3),
    // never the full 5-row listing, while the global limit still
    // produces exactly 3 rows from the 5-entry listing
    val q = read().limit(3)
    val rows = q.collect()
    assert(rows.length === 3)
    val full = read().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.map(r => (r.getString(0), r.getString(1))).forall(full.contains))
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ListingScan")).getOrElse(fail("no ListingScan node"))
    assert(scanLine.contains("PushedLimit=3"),
      s"limit missing from the scan node: $scanLine")
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .find(_.toString.contains("ListingScan"))
      .getOrElse(fail("no BatchScan leaf"))
    assert(scan.metrics("numOutputRows").value <= 6,
      "scan ignored the pushed per-partition bound")
  }

  test("limit composes with a pushed filter: first-k MATCHES, not k entries") {
    // the filter runs before the take inside the reader — with only 3
    // matching entries across both dirs, limit(2) must return 2
    // genuine matches
    val q = read().filter(col("name").contains("needle")).limit(2)
    val names = q.collect().map(_.getString(1))
    assert(names.length === 2 && names.forall(_.contains("needle")))
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ListingScan")).getOrElse(fail("no ListingScan node"))
    assert(scanLine.contains("PushedLimit=2") &&
      scanLine.contains("StringContains"), scanLine)
  }

  test("a group-by or distinct count falls back to the row scan") {
    // groupBy(dir) and count(DISTINCT) are NOT pushable — the source
    // must refuse and the plain row scan must carry the query
    val q = read().groupBy(col("dir")).agg(count(lit(1)).as("n"))
    assert(q.collect().map(_.getLong(1)).sorted.toSeq === Seq(2L, 3L))
    assert(!q.queryExecution.executedPlan.toString.contains("ListingAggScan"))
    val qd = read().agg(countDistinct(col("name")).as("n"))
    assert(qd.collect().head.getLong(0) === 4L)
    assert(!qd.queryExecution.executedPlan.toString.contains("ListingAggScan"))
  }
}
