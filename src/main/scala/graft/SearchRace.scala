package graft

import org.apache.spark.sql.SparkSession

/** Cold/warm timing of the Search pipeline over a live directory tree
  * (the head-to-head vs the reference binary in BASELINE.md).
  * Usage: runMain graft.SearchRace <needle> <rootDir-of-dirs> */
object SearchRace {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: SearchRace <needle> <rootDir>"); sys.exit(1)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Option(new java.io.File(args(1)).listFiles)
      .getOrElse(Array.empty).map(_.toString).toSeq
    def run(): Long = graft.clients.Search.dataframe(
      graft.sources.DirListing(spark, dirs), "dir", "name", args(0)).count()
    val t0 = System.nanoTime(); val n1 = run()
    val t1 = System.nanoTime(); val n2 = run()
    val t2 = System.nanoTime()
    println(f"RACE cold=${(t1-t0)/1e9}%.2f s warm=${(t2-t1)/1e9}%.2f s rows=$n1/$n2")
    spark.stop()
  }
}
