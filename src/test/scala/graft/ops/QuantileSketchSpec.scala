package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Accuracy contract of the histogram-quantile sketch: the estimate
  * lands inside the bin that contains the true rank-r value, so
  * |est − true| < one bin width — checked against an exact sort at
  * test scale (the registered query deliberately carries no exact
  * pass; a global sort is the thing the sketch replaces at 100 TB). */
class QuantileSketchSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("histogram quantile estimates are within one bin width of exact") {
    val rows = Aggregates.queries("q_quantile_sketch")(spark, dir).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Int]("q_pct")).toSeq == Seq(50, 90, 99))

    val vs = graft.Tables(spark, dir, "lineitem")
      .select(expr("cast(l_extendedprice * 100 as bigint)").as("v"))
      .orderBy("v").collect().map(_.getLong(0))
    val width = (vs.last - vs.head) / 32 + 1
    rows.foreach { row =>
      val r = row.getAs[Long]("r") // ceil-rank, 1-based
      val est = row.getAs[Long]("est_cents")
      val truth = vs((r - 1).toInt)
      assert(math.abs(est - truth) < width,
        s"q_pct=${row.getAs[Int]("q_pct")}: est=$est true=$truth width=$width")
    }
  }

  test("the bin-count frame is bounded at 32 rows") {
    // the sketch's whole exchange payload — the 100 TB property
    val v = graft.Tables(spark, dir, "lineitem")
      .select(expr("cast(l_extendedprice * 100 as bigint)").as("v"))
    val wd = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("width", expr("(hi - lo) div 32 + 1"))
    val nBins = v.crossJoin(broadcast(wd))
      .select(expr("(v - lo) div width").as("bin")).distinct().count()
    assert(nBins <= 32)
  }
}
