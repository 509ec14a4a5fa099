package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch timer: time named queries from [[SparkEntry.queries]]
  * and/or their lazy twins in [[SparkEntry.plans]] in one JVM.
  * Usage: runMain graft.DevTimer <sfDir> <q|p>:<name> ... */
object DevTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (spec <- args.drop(1)) {
      val Array(kind, name) = spec.split(":", 2)
      val fn = if (kind == "p") SparkEntry.plans(name) else SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[devtimer] $spec rows=$n sec=$dt%.2f")
    }
    spark.stop()
  }
}
