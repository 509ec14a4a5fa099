package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("max_k keeps the k largest with duplicates, across partitions") {
    GraftFunctions.register(spark)
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 2.0), ("a", 3.0), ("a", 0.5),
      ("b", 5.0)).toDF("g", "x").repartition(4) // force partial+final merge
    val got = df.groupBy("g").agg(expr("max_k(x, 3)").as("t"))
      .orderBy("g").as[(String, Seq[Double])].collect().toSeq
    assert(got === Seq(
      ("a", Seq(3.0, 3.0, 2.0)), // duplicate max kept twice
      ("b", Seq(5.0)))) // group smaller than k
  }

  test("max_k equals sort-take on arbitrary data and partitioning") {
    GraftFunctions.register(spark)
    val gen = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val rows = Seq.fill(200 + trial * 100)(
        (gen.nextInt(6).toString, (gen.nextInt(50) / 4.0)))
      val df = rows.toDF("g", "x").repartition(1 + trial % 7)
      val got = df.groupBy("g").agg(expr("max_k(x, 4)").as("t"))
        .as[(String, Seq[Double])].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).sorted(Ordering[Double].reverse).take(4)
      }
      assert(got === want, s"trial $trial")
    }
  }

  test("max_k ignores nulls") {
    GraftFunctions.register(spark)
    val df = Seq(Some(1.0), None, Some(2.0)).toDF("x").withColumn("g", lit("z"))
    val got = df.groupBy("g").agg(expr("max_k(x, 2)").as("t"))
      .as[(String, Seq[Double])].collect().head
    assert(got._2 === Seq(2.0, 1.0))
  }
}
