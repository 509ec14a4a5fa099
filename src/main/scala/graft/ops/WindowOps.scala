package graft.ops

import graft.{Num, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Sort, top-k, and window-function library (SURVEY.md §2c "sort",
  * "limit / top-k", "window functions").
  *
  * The reference only has the global key sort (MRFCore.cpp:417-420);
  * per-group top-k is its textbook bounded-heap Reduce derivation —
  * here expressed as `row_number()` over a window so Catalyst plans a
  * single sort-per-partition, and global top-k as `orderBy().limit(k)`
  * which Spark executes as TakeOrderedAndProject: each partition keeps
  * only k rows, the driver merges N×k — no global sort at any SF.
  *
  * Determinism: every window ORDER BY ends in a unique key so rank and
  * frame contents are total; windowed double sums go through DECIMAL
  * because DuckDB's segment-tree window aggregation adds in a different
  * order than Spark's running accumulation (SURVEY.md §7.3).
  */
object WindowOps {
  private val Dec = DecimalType(38, 6)

  val queries: Map[String, Q] = Map(
    // Global top-k: TakeOrderedAndProject, deterministic tiebreak.
    "q_topk" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(15)
    }),

    // Per-group top-k via ranking window (row_number ≤ k).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      Tables(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
        .orderBy("l_returnflag", "rn")
    }),

    // Per-group top-k AS AN AGGREGATE: graft's native max_k
    // TypedImperativeAggregate (functions/TopK.scala) — a k-bounded
    // heap with partial+final merge, so the exchange carries k doubles
    // per (group, map task) instead of sorting every row like the
    // window form above. The window form is kept as the row-level
    // variant; this is the 100 TB shape.
    "q_topk_agg" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("max_k(o_totalprice, 3)").as("top3"))
        // flattened to scalars: the compare harness hashes flat columns
        // try_: a group with <3 rows yields NULLs exactly like the
        // oracle's out-of-range list index — plain element_at THROWS
        // under ANSI (DegenerateSweepSpec)
        .select(col("o_orderpriority"),
          expr("try_element_at(top3, 1)").as("t1"),
          expr("try_element_at(top3, 2)").as("t2"),
          expr("try_element_at(top3, 3)").as("t3"))
        .orderBy("o_orderpriority")
    }),

    // Ranking family: rank / dense_rank / ntile over one pass.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rnk") <= 5)
        .orderBy("c_nationkey", "rnk", "c_custkey")
    }),

    // Running (cumulative) aggregate over an explicit frame.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(sum(col("o_totalprice").cast(Dec)).over(w), 4)
            .cast(DoubleType).as("running_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // lag/lead across event time per user (nulls at partition edges
    // coalesced; sort key unique → stable).
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"),
          coalesce(lag(col("value"), 1).over(w), lit(0.0)).as("prev_value"),
          coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_event"))
        .orderBy("user_id", "event_id")
    }),

    // RANGE-frame window — the trailing-24h rolling aggregate (rate
    // limiting, rolling quotas, trend features). Unlike a ROWS frame,
    // the frame is bounded by the ORDER-BY VALUE (event time in µs), so
    // tied timestamps are all peers and the result is deterministic
    // without a tiebreak column. One exchange on user_id; the window
    // sum rides DECIMAL for cross-engine exactness (SURVEY §7.3).
    "q_window_range_frame" -> ((s, dir) => {
      val dayUs = 86400L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-dayUs, 0)
      Tables.events(s, dir)
        .filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("n_24h", count(lit(1)).over(w))
        .withColumn("sum_24h",
          round(sum(col("value").cast(Dec)).over(w), 4).cast(DoubleType))
        .select(col("user_id"), col("event_id"), col("us"),
          col("n_24h"), col("sum_24h"))
        .orderBy("user_id", "event_id")
    }),

    // Frame-navigation completeness: first/last/nth over the FULL
    // partition frame (default last_value frame stops at the current
    // row — a classic silent-wrongness trap, so the unbounded frame is
    // explicit) + cume_dist. One exchange on nation; every output is
    // either a raw parquet double (bit-identical pass-through) or an
    // exact small-integer ratio, so no rounding is needed.
    "q_window_first_last" -> ((s, dir) => {
      val ord = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val full = ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "customer")
        .filter(col("c_nationkey") < 5)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          first_value(col("c_acctbal")).over(full).as("top_bal"),
          last_value(col("c_acctbal")).over(full).as("bottom_bal"),
          nth_value(col("c_acctbal"), 2).over(full).as("second_bal"),
          Num.r(cume_dist().over(ord)).as("cd"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    // Batch sessionization — the classic gaps-and-islands derivation
    // every behavioral pipeline needs (the streaming twin is
    // q_stream_session): a session breaks when the same-user gap
    // exceeds 30 min. Two window passes over ONE partitioning (lag →
    // running sum of break flags), so Spark plans a single exchange on
    // user_id and both Window operators ride it; the aggregate then
    // re-uses the same key prefix. Event time is integer microseconds
    // end to end — no FP, hash-exact across engines.
    "q_sessionize" -> ((s, dir) => {
      val gapUs = 1800L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"))
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_idx")
    }))

  val oracles: Map[String, String] = Map(
    "q_topk" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""",
    "q_topk_per_group" -> """
      SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
      FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
          CAST(row_number() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INT) AS rn
        FROM lineitem)
      WHERE rn <= 3 ORDER BY l_returnflag, rn""",
    "q_topk_agg" -> """
      WITH t AS (SELECT o_orderpriority,
                        list_sort(list(o_totalprice), 'DESC') AS top3
                 FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, top3[1] AS t1, top3[2] AS t2, top3[3] AS t3
      FROM t ORDER BY o_orderpriority""",
    "q_window_rank" -> """
      SELECT c_nationkey, c_custkey, c_acctbal, rnk, drnk, quartile
      FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
          CAST(rank() OVER w AS INT) AS rnk,
          CAST(dense_rank() OVER w AS INT) AS drnk,
          CAST(ntile(4) OVER w AS INT) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC))
      WHERE rnk <= 5 ORDER BY c_nationkey, rnk, c_custkey""",
    "q_window_running" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
          AS running_total
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "q_window_lag" -> """
      SELECT user_id, event_id, value,
        coalesce(lag(value, 1) OVER w, 0.0) AS prev_value,
        coalesce(lead(event_id, 1) OVER w, -1) AS next_event
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      ORDER BY user_id, event_id""",
    "q_window_first_last" -> """
      SELECT c_nationkey, c_custkey, c_acctbal,
        first_value(c_acctbal) OVER wfull AS top_bal,
        last_value(c_acctbal) OVER wfull AS bottom_bal,
        nth_value(c_acctbal, 2) OVER wfull AS second_bal,
        CAST(round(cume_dist() OVER ord, 4) AS DOUBLE) AS cd
      FROM customer WHERE c_nationkey < 5
      WINDOW
        ord AS (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey ASC),
        wfull AS (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_nationkey, c_custkey""",
    "q_window_range_frame" -> """
      SELECT user_id, event_id, epoch_us(ts) AS us,
        count(*) OVER w AS n_24h,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))) OVER w, 4) AS DOUBLE) AS sum_24h
      FROM events WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",
    "q_sessionize" -> """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      f AS (SELECT user_id, event_id, us,
              CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS new_sess
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
      s AS (SELECT user_id, us,
              CAST(sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY us ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS session_idx
            FROM f)
      SELECT user_id, session_idx, count(*) AS n_events,
             min(us) AS start_us, max(us) AS end_us,
             max(us) - min(us) AS duration_us
      FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""")
}
