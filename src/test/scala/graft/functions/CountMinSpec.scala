package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private def sketch(rows: Seq[String], parts: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    rows.toDF("w").repartition(parts)
      .agg(expr("cms_sketch(w, 4, 64)").as("sk"))
      .as[Seq[Long]].collect().head
  }

  test("sketch is partition-order independent and counts sum to depth×N") {
    val gen = new scala.util.Random(7)
    val rows = Seq.fill(500)(s"w${gen.nextInt(40)}")
    val a = sketch(rows, 1)
    val b = sketch(rows, 7)
    val c = sketch(gen.shuffle(rows), 5)
    assert(a === b && a === c, "merge must be commutative elementwise add")
    assert(a.sum === 4L * rows.size, "each row lands once per depth row")
  }

  test("point estimate never underestimates and is exact sans collisions") {
    GraftFunctions.register(spark)
    val gen = new scala.util.Random(13)
    val rows = Seq.fill(400)(s"tok${gen.nextInt(30)}")
    val truth = rows.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val sk = sketch(rows, 6)
    // re-derive each word's cells exactly like the aggregate does
    def cell(d: Int, s: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d:$s".getBytes("UTF-8"))
      val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      (u % 64).toInt
    }
    truth.foreach { case (w, n) =>
      val est = (0 to 3).map(d => sk(d * 64 + cell(d, w))).min
      assert(est >= n, s"$w: CMS must never underestimate ($est < $n)")
    }
  }

  test("nulls are ignored") {
    GraftFunctions.register(spark)
    val sk = Seq(Some("a"), None, Some("a")).toDF("w")
      .agg(expr("cms_sketch(w, 2, 16)").as("sk"))
      .as[Seq[Long]].collect().head
    assert(sk.sum === 2L * 2, "two non-null rows × depth 2")
  }
}
