package graft

import java.sql.Timestamp

/** Crash-path sweep: EVERY registered query must execute (not
  * necessarily return rows) on a minimal, edge-shaped corpus — the
  * class of latent failure the r7 advisor found (a <8-token document
  * crashing q_dedup_substring) made systematic. Edge shapes included:
  * 1- and 2-token documents, an exact duplicate pair, a 2-character
  * part name (the fuzzy join's short arm), a zero embedding vector
  * (NaN cosines must rank, not throw), single-row dimension tables,
  * and a 3-vector ANN corpus (fewer vectors than the qmax=50 query
  * batch; IVF trains with empty seed cells). */
class DegenerateSweepSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_degen").toString
    def w(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$d/$name.parquet")
    def ts(s: String) = Timestamp.valueOf(s)

    w(Seq((0, "AMERICA")).toDF("r_regionkey", "r_name"), "region")
    w(Seq((0, "BRAZIL", 0)).toDF("n_nationkey", "n_name", "n_regionkey"),
      "nation")
    w(Seq(
      (0L, "Customer#0", 0, 100.5, "BUILDING"),
      (1L, "Customer#1", 0, -5.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "customer")
    w(Seq((0L, "Supplier#0", 0, 50.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "supplier")
    w(Seq(
      (0L, "ab", "Brand#1", "TYPE A", 1, 10.0),       // 2 chars: short arm
      (1L, "axcdefg", "Brand#1", "TYPE B", 2, 20.0),  // distance-1 pair
      (2L, "aycdefg", "Brand#1", "TYPE C", 3, 30.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"), "part")
    w(Seq(
      (0L, 0L, "O", 100.0, ts("2024-01-01 00:00:00"), "1-URGENT"),
      (1L, 1L, "F", 200.0, ts("2024-01-02 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"), "orders")
    w(Seq(
      (0L, 0L, 0L, 1, 1.0, 100.0, 0.1, 0.02, "N", "O", ts("2024-01-03 00:00:00")),
      (0L, 1L, 0L, 2, 2.0, 200.0, 0.0, 0.00, "R", "F", ts("2024-01-04 00:00:00")),
      (1L, 0L, 0L, 1, 3.0, 300.0, 0.2, 0.04, "A", "F", ts("2024-01-05 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"), "lineitem")
    // ts is NANOS-as-long, exactly how the driver fixture reads
    // through Tables.events (nanosAsLong → div 1000 → micros)
    val ns0 = 1704067200L * 1000000000L // 2024-01-01 00:00 UTC
    w(Seq(
      (0L, ns0, 0L, "click", 1.0, "free text 123"),
      (1L, ns0 + 600L * 1000000000L, 0L, "view", 2.0, """{"k":1}"""),
      (2L, ns0 + 86400L * 1000000000L, 1L, "purchase", 3.0, "x"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events")
    w(Seq(
      (0L, "hello", "en", "src0", 5L),                               // 1 token
      (1L, "a b", "en", "src0", 3L),                                 // 2 tokens
      (2L, "the a of and is one two eight", "en", "src0", 1L),       // exactly 8
      (3L, "the a of and is one two eight", "en", "src0", 1L),       // exact dup
      (4L, (0 until 20).map(i => s"tok$i").mkString(" "), "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")
    w(Seq(
      (0L, Seq.fill(64)(0.1f), 0),
      (1L, Seq.fill(64)(0.12f), 1),
      (2L, Seq.fill(64)(0.0f), 0))                                   // zero vector
      .toDF("vec_id", "embedding", "label"), "embeddings")
    d
  }

  test("every registered query executes on the degenerate corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crashed:\n${failures.mkString("\n")}")
  }
}
