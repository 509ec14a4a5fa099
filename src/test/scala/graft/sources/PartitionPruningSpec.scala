package graft.sources

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Pins Hive-style partition pruning — with bucketing, the other half
  * of the 100 TB layout story: data written `partitionBy(key)` must be
  * read back touching ONLY the matching directories, so a key-filtered
  * query scans 1/N of the corpus no matter how big N × corpus gets.
  * The pruning happens at PLANNING time (directory listing), before
  * any row or even any parquet footer of other partitions is read. */
class PartitionPruningSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("a partition-key filter prunes the scan to one directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val src = Tables.events(spark, sf)
    src.write.partitionBy("event_type").parquet(s"$dir/events")

    // explicit schema: no footer sampling at planning time, so the
    // corruption below can only be noticed if the scan READS the
    // non-matching partition
    def read() = spark.read.schema(src.schema).parquet(s"$dir/events")
    val q = read()
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))

    // the filter must appear as a PartitionFilters entry on the scan,
    // not a post-scan Filter over all partitions
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.linesIterator
        .filter(_.contains("PartitionFilters")).exists(_.contains("event_type")),
      s"event_type must be a partition filter:\n$formatted")

    // behavioral proof of pruning: corrupt every OTHER partition's
    // files — the purchase-filtered read must not notice
    val root = java.nio.file.Paths.get(s"$dir/events")
    // Files.walk must be closed (it holds directory handles open)
    scala.util.Using.resource(java.nio.file.Files.walk(root)) { walk =>
      walk.forEach { p =>
        val s = p.toString
        if (s.endsWith(".parquet") && s.contains("event_type=") &&
            !s.contains("event_type=purchase"))
          java.nio.file.Files.write(p, "not a parquet file".getBytes)
      }
    }
    val expected = src.filter(col("event_type") === "purchase").count()
    assert(q.count() === expected,
      "pruned read must succeed and match despite corrupted sibling partitions")

    // sanity: a query that DOES need a corrupted partition fails
    intercept[Exception] {
      read().filter(col("event_type") === "click").count()
    }
  }
}
