package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: print the formatted physical plan of
  * registered queries (dev/judge aid — `.explain("formatted")` shows
  * PushedFilters, ReadSchema pruning, join strategies, and
  * WholeStageCodegen spans, the 100 TB design checks in SURVEY.md §7.3).
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  * (no names → all queries, alphabetical). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n========== $n ==========")
      try SparkEntry.plans(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
