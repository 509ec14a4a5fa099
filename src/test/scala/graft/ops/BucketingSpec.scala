package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Pins the co-located (bucketed) join — the 100 TB technique for
  * repeated fact-fact joins: pay the shuffle ONCE at write time
  * (`bucketBy` on the join key), then every subsequent join on that
  * key plans with ZERO exchanges because both scans already report
  * hash-partitioned output. At cluster scale this is the difference
  * between re-shuffling two corpus-sized tables per query and reading
  * co-located buckets. */
class BucketingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("pre-bucketed fact-fact join plans with zero exchanges and matches the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffled-join path: broadcast would trivially have no
    // exchange on the big side and prove nothing about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$dir/orders").saveAsTable("b_orders")
      Tables(spark, sf, "customer")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$dir/customer").saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      val expected = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      // external tables: DROP removes only the catalog entry, so the
      // bucket files need explicit deletion along with the temp dir
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(dir))) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}
