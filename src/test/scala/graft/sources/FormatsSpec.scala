package graft.sources

import java.nio.file.Files

import graft.{SparkSuite, Tables}

/** File-format scan/sink coverage (SURVEY.md §2c "scan: file formats" —
  * Absent in the reference, which only ever reads file *names*,
  * SearchMRC.cpp:55-73; Spark's built-in readers are the rebuild's
  * answer). Round-trips a fixture table through CSV and JSON and
  * checks value-identical recovery, schema supplied on read exactly as
  * a 100 TB ingest would (schema inference is a full extra scan —
  * never on by default here). */
class FormatsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("csv round-trip preserves nation rows") {
    val nation = Tables(spark, sf, "nation")
    val dir = Files.createTempDirectory("graft_csv").toString
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(nation.schema).option("header", "true").csv(dir)
    assert(back.count() === nation.count())
    assert(back.exceptAll(nation).count() === 0)
    assert(nation.exceptAll(back).count() === 0)
  }

  test("json round-trip preserves customer rows") {
    val cust = Tables(spark, sf, "customer")
    val dir = Files.createTempDirectory("graft_json").toString
    cust.write.mode("overwrite").json(dir)
    val back = spark.read.schema(cust.schema).json(dir)
    assert(back.count() === cust.count())
    assert(back.exceptAll(cust).count() === 0)
    assert(cust.exceptAll(back).count() === 0)
  }

  test("in-memory collection scan matches parquet scan") {
    val region = Tables(spark, sf, "region")
    val mem = spark.createDataFrame(region.collect().toSeq.asJava, region.schema)
    assert(mem.exceptAll(region).count() === 0)
    assert(region.exceptAll(mem).count() === 0)
  }

  private implicit class SeqAsJava[T](s: Seq[T]) {
    def asJava: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add); l
    }
  }
}
