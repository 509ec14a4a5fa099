package graft
import org.apache.spark.sql.SparkSession
object SearchRace {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = new java.io.File("/tmp/searchbench").listFiles.map(_.toString).toSeq
    def run(): Long = graft.clients.Search.dataframe(
      graft.sources.DirListing(spark, dirs), "dir", "name", "needle").count()
    val t0 = System.nanoTime(); val n1 = run()
    val t1 = System.nanoTime(); val n2 = run()
    val t2 = System.nanoTime()
    println(f"RACE cold=${(t1-t0)/1e9}%.2f s warm=${(t2-t1)/1e9}%.2f s rows=$n1/$n2")
    spark.stop()
  }
}
