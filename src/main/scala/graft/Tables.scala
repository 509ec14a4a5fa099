package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated fixture schema
  * (TESTDATA.md / FIXTURES.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize `events.ts` to a session-zoned microsecond TIMESTAMP
    * regardless of how the fixture generation wrote it. Two layouts
    * exist in the wild: parquet TIMESTAMP(NANOS), which Spark only
    * reads as a long (`nanosAsLong` — normalize by flooring to micros,
    * exactly what DuckDB does on the same file), and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4 infers
    * as TIMESTAMP_NTZ (cast to LTZ — identity under the UTC session
    * timezone every entrypoint pins). Either way downstream event-time
    * queries see one `ts` type and hash-match the oracle. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}

/** Cross-engine-exact numeric helpers.
  *
  * The DuckDB oracle hash-compares values, so floating-point aggregates
  * must be bit-identical despite different partial-aggregation orders.
  * Strategy (SURVEY.md §7.3): route every double sum through
  * DECIMAL(38,6) (exact, order-independent), round, and cast back to
  * DOUBLE so the output schema stays `double` in both engines.
  *
  * SIGNED-ZERO TRAP: Spark's `round` (BigDecimal-based) normalizes a
  * tiny-negative double to +0.0, but DuckDB's C `round` preserves the
  * sign (-0.00003 -> -0.0). The driver hash-compares BITS, so the two
  * zeros mismatch even though they compare `==` everywhere else. Any
  * ORACLE twin whose rounded double can be slightly negative must
  * canonicalize with `round(...) + 0.0` (IEEE: -0.0 + 0.0 = +0.0;
  * identity for every other value). The Spark side needs nothing —
  * these helpers can never emit -0.0. scripts/check.py fails on any
  * signed-zero divergence so the trap can't pass pre-flight silently.
  */
object Num {
  private val Dec = DecimalType(38, 6)

  /** Exact sum of a double column; emits DOUBLE rounded to 4 dp.
    * Oracle twin: `CAST(round(sum(CAST(x AS DECIMAL(38,6))), 4) AS DOUBLE)` */
  def dsum(c: Column): Column = round(sum(c.cast(Dec)), 4).cast(DoubleType)

  /** Exact-numerator average: exact decimal sum → double → double
    * division (matching DuckDB, whose `/` on decimal yields double);
    * emits DOUBLE rounded to 4 dp. Oracle twin:
    * `CAST(round(CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(x), 4) AS DOUBLE)` */
  def davg(c: Column): Column =
    round(sum(c.cast(Dec)).cast(DoubleType) / count(c), 4).cast(DoubleType)

  /** Round a scalar double expression to `s` dp (post-arithmetic). */
  def r(c: Column, s: Int = 4): Column = round(c, s).cast(DoubleType)
}
