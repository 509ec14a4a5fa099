package graft.ops

import graft.{Num, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Group-by aggregation library — the canonical Reduce-side derivations
  * of the reference pipeline (SURVEY.md §2c "aggregation" rows; the
  * reference's shuffle *is* a sort-based grouping, MRFCore.cpp:162-164,
  * and every aggregate below is "Reduce over V2_VEC" re-expressed so
  * Catalyst gets partial (map-side) + final aggregation instead of the
  * reference's whole-group materialization).
  *
  * Scale notes: every query here is a single hash-aggregate over a
  * parquet scan — one shuffle on the group keys, partial aggregation
  * before the exchange, no driver-side collection. Low-cardinality
  * group keys (returnflag × linestatus = 6 groups) make the exchange a
  * few bytes per partition at any SF.
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-style pricing summary: the flagship scan→agg→sort.
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Num.dsum(col("l_quantity")).as("sum_qty"),
          Num.dsum(col("l_extendedprice")).as("sum_base_price"),
          Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Num.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Exact min/max/count-distinct battery (all order-independent).
    "q_agg_funcs" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          sum(col("l_linenumber").cast("long")).as("sum_line"))
        .orderBy("l_returnflag")
    }),

    // DISTINCT as an operator (the "group by value, emit once" derivation).
    "q_distinct" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // HAVING (post-aggregation filter).
    "q_having" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          Num.dsum(col("c_acctbal")).as("sum_bal"))
        .filter(col("n_cust") >= 5)
        .orderBy("c_nationkey")
    }),

    // CASE WHEN bucketing + conditional aggregation.
    "q_case_when" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.select(
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 300000, "medium")
            .otherwise("large").as("band"),
          col("o_orderstatus"), col("o_totalprice"))
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          Num.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("band")
    }),

    // ROLLUP region → nation hierarchy (grouping-set nulls coalesced so
    // the sort order is engine-independent).
    "q_rollup" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"))
        .orderBy("region", "nation")
    }),

    // CUBE over two independent dims.
    "q_cube" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority")
    }),

    // Explicit GROUPING SETS (SQL form; the DSL only exposes rollup/cube).
    "q_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")
    }),

    // Scalar subquery: orders above the global average price. The
    // average is computed through DECIMAL so the threshold is exact and
    // identical in both engines (SURVEY.md §7.3 determinism rule).
    "q_scalar_subquery" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val avgPrice = o.agg(
        (sum(col("o_totalprice").cast("decimal(38,6)")).cast("double") /
          count(lit(1))).as("a"))
      o.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("a"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy("o_orderpriority")
    }),

    // Correlated scalar subquery: orders more than 2× their own
    // customer's average. Catalyst decorrelates this into an aggregate
    // + join — no per-row re-execution (the naive reading would be
    // O(rows × groups) at 100 TB). Average through exact decimal sums.
    "q_corr_subquery" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_cs")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_cs o
        WHERE o_totalprice > 2 * (
          SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*)
          FROM orders_cs o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    }),

    // UDAF: quantity-weighted mean price via a typed Aggregator
    // (functions/WeightedMean.scala) — partial+final aggregation, the
    // idiomatic upgrade of the reference's whole-group Reduce
    // (MapReduceClient.h:50). Inputs pre-cast to DECIMAL(38,6) per the
    // Num convention so both engines sum exactly.
    "q_udaf_wavg" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          Num.r(expr("""wmean(cast(l_extendedprice as decimal(38,6)),
                               cast(l_quantity as decimal(38,6)))"""))
            .as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // PIVOT: order counts by priority × status. Explicit pivot-value
    // list (no extra distinct-scan pass to discover columns — mandatory
    // at scale); empty cells coalesced to 0 to match conditional-agg
    // semantics.
    "q_pivot" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")
    }),

    // Exact discrete percentiles (p25/p50/p90 of order price per
    // priority) at rank ceil(p·n), computed with INTEGER arithmetic
    // ((a·n + a) div b) — float p·n differs between engines' literal
    // typing (decimal vs double) exactly at integer boundaries, the
    // one place ceil flips. One window sort per group + one aggregate.
    "q_percentile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("o_orderpriority"))))
        .groupBy(col("o_orderpriority"))
        .agg(
          min(when(expr("rn = (n + 3) div 4"), col("o_totalprice"))).as("p25"),
          min(when(expr("rn = (n + 1) div 2"), col("o_totalprice"))).as("p50"),
          min(when(expr("rn = (9 * n + 9) div 10"), col("o_totalprice"))).as("p90"),
          max(col("n")).as("n"))
        .orderBy("o_orderpriority")
    }),

    // Moment statistics (stddev, correlation) from exact decimal sums:
    // the five power sums are order-independent DECIMAL(38,6) partial
    // aggregates; the closed-form variance/corr arithmetic then runs in
    // IEEE double identically in any engine. Built-in stddev/corr use
    // streaming update formulas whose result depends on partition
    // order — unusable under a hash-compare oracle.
    "q_stats" -> ((s, dir) => {
      val d = "decimal(38,6)"
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(d)).cast("double").as("sx"),
          sum((col("l_quantity") * col("l_quantity")).cast(d)).cast("double").as("sx2"),
          sum(col("l_extendedprice").cast(d)).cast("double").as("sy"),
          sum((col("l_extendedprice") * col("l_extendedprice")).cast(d)).cast("double").as("sy2"),
          sum((col("l_quantity") * col("l_extendedprice")).cast(d)).cast("double").as("sxy"))
        // Degenerate groups follow standard SQL semantics: stddev of a
        // 1-row group and corr of a constant series are NULL (nullif'd
        // denominators — under ANSI the raw division would throw on
        // one such group and kill the query; DegenerateSweepSpec).
        .select(col("l_returnflag"), col("n"),
          Num.r(sqrt((col("n") * col("sx2") - col("sx") * col("sx")) /
            nullif(col("n") * (col("n") - 1), lit(0)))).as("stddev_qty"),
          Num.r((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
              sqrt(col("n") * col("sy2") - col("sy") * col("sy")), lit(0.0)))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // Ordinary-least-squares trend line per group — the drift/trend
    // fit a metrics pipeline runs (price-per-quantity slope here).
    // Same discipline as q_stats: every sum is exact DECIMAL(38,6)
    // (order-independent, no partial-aggregation drift), converted to
    // double ONCE, then the closed-form slope/intercept are a few IEEE
    // ops rounded at the end; degenerate groups (constant x) get NULL
    // via the nullif'd denominator rather than an ANSI throw.
    "q_linreg" -> ((s, dir) => {
      val d = "decimal(38,6)"
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(d)).cast("double").as("sx"),
          sum((col("l_quantity") * col("l_quantity")).cast(d)).cast("double").as("sx2"),
          sum(col("l_extendedprice").cast(d)).cast("double").as("sy"),
          sum((col("l_extendedprice") * col("l_extendedprice")).cast(d)).cast("double").as("sy2"),
          sum((col("l_quantity") * col("l_extendedprice")).cast(d)).cast("double").as("sxy"))
        .withColumn("slope_raw",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(col("n") * col("sx2") - col("sx") * col("sx"), lit(0.0)))
        .select(col("l_returnflag"), col("n"),
          Num.r(col("slope_raw"), 6).as("slope"),
          Num.r((col("sy") - col("slope_raw") * col("sx")) / col("n"), 6)
            .as("intercept"),
          Num.r(
            ((col("n") * col("sxy") - col("sx") * col("sy")) *
              (col("n") * col("sxy") - col("sx") * col("sy"))) /
              nullif((col("n") * col("sx2") - col("sx") * col("sx")) *
                (col("n") * col("sy2") - col("sy") * col("sy")), lit(0.0)), 6)
            .as("r2"))
        .orderBy("l_returnflag")
    }),

    // Conversion funnel — first-occurrence ordering semantics (a user
    // converts a stage when min(view) < min(click) < min(purchase); the
    // common funnel-tool definition, stated here because stricter
    // "first click AFTER first view" variants exist). Two aggregates:
    // per-user conditional-min timestamps (one shuffle on user_id),
    // then a scalar rollup — at 100 TB the second agg input is one row
    // per user, and everything is integer µs.
    "q_funnel" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("us"))).as("v"),
          min(when(col("event_type") === "click", col("us"))).as("c"),
          min(when(col("event_type") === "purchase", col("us"))).as("p"))
        .agg(count(lit(1)).as("n_users"),
          count(col("v")).as("n_view"),
          sum(when(col("v") < col("c"), 1L).otherwise(0L)).as("n_view_click"),
          sum(when(col("v") < col("c") && col("c") < col("p"), 1L)
            .otherwise(0L)).as("n_funnel"))
    }),

    // Approximate distinct (HLL++), QUANTITATIVELY gated since r16: the
    // engine-internal estimate can never hash-match DuckDB's (different
    // sketch implementations), so the emitted columns are the exact
    // distinct plus `approx_ok` — whether the HLL++ estimate landed
    // inside the 3σ envelope of its configured accuracy (default
    // rsd = 0.05 → |err| ≤ 0.15·exact; the same bound discipline
    // q_hll_tuning proves for the from-scratch family, where the
    // m = 1024 row measures ~1.04/√m). The oracle asserts approx_ok =
    // true, so the gate FAILS if the estimate ever leaves its envelope
    // — a real check, not schema theater: HLL++ is deterministic, so a
    // violation is a genuine accuracy bug, not flakiness. The fully
    // bit-gated approximate-distinct lives beside this:
    // q_hll_registers / q_hll_estimate, graft's own HyperLogLog whose
    // every register both engines derive identically.
    "q_approx_distinct" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("n_exact"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("approx_parts") - col("n_exact")).cast("double")
            <= lit(0.15) * col("n_exact").cast("double")).as("approx_ok"))
        .orderBy("l_returnflag")
    }),

    // HyperLogLog register vector, built from scratch (Flajolet et al.
    // 2007) with CROSS-ENGINE-EXACT hashing so the whole sketch is
    // oracle-gated — unlike q_approx_distinct, whose engine-internal HLL++
    // can only be rows-checked. Register j = top 8 md5 bits (the CMS cell
    // trick: both engines parse the same hex prefix), rho = 1 + leading
    // zeros of the next 52 bits, derived via length(bin(x)) — exact
    // integer/string ops only. max(rho) per register is order-independent
    // AND mergeable: at 100 TB the exchange carries ≤256 (reg, max) pairs
    // per task — the entire reason sketches beat count(DISTINCT), whose
    // shuffle carries every distinct value.
    "q_hll_registers" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("w"))
        .select(
          expr(s"cast($hllReg as int)").as("reg"),
          expr(s"cast($hllRho as int)").as("rho"))
        .groupBy(col("reg")).agg(max(col("rho")).as("m"))
        .orderBy("reg")
    }),

    // The HLL raw estimate alpha·m²/Σ2^(−M_j) from those registers, next
    // to the exact distinct — the quality row a pipeline tunes register
    // count against. All 256 registers (a sequence-literal grid fills the
    // empties) feed an EXACT DECIMAL(38,0) harmonic sum (terms 2^(53−M)
    // are integers; decimal addition is order-independent). The estimate
    // itself is EXACT INTEGER arithmetic to the last emitted digit:
    // `round(double, 4)` is NOT cross-engine-stable (Spark's BigDecimal
    // HALF_UP vs DuckDB's C round disagree within half an ULP of the
    // 4th decimal — bitten at sf0.1), and Spark's double→decimal cast
    // goes through Double.toString (17 significant digits), so big
    // power-of-two constants must be built by integer multiplication
    // (2⁵³·2²⁴), never cast from power(). est·10⁴ is one decimal
    // integer `div` (exact in Spark; the DuckDB twin must use HUGEINT —
    // its `//` on DECIMAL is double-backed and off-by-one here); the
    // only doubles are final /10⁴ re-scalings of <2⁵³ integers —
    // bit-identical everywhere.
    "q_hll_estimate" -> ((s, dir) => {
      val toks = Tables(s, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("w"))
      val regs = toks
        .select(expr(s"cast($hllReg as int)").as("reg"),
          expr(s"cast($hllRho as int)").as("rho"))
        .groupBy(col("reg")).agg(max(col("rho")).as("m"))
      val grid = s.range(0, 256).select(col("id").cast("int").as("reg"))
      val est = grid.join(regs, Seq("reg"), "left")
        .select(coalesce(col("m"), lit(0)).as("m"))
        .agg(
          sum(expr("cast(power(2, 53 - m) as decimal(38,0))")).as("hsum"),
          sum(when(col("m") === 0, 1L).otherwise(0L)).as("zero_regs"))
        .select(col("zero_regs"),
          expr(s"cast(($hllEstNum) div (2570790 * hsum) as bigint)").as("est4"))
      val exact = toks.agg(countDistinct(col("w")).as("exact_distinct"))
      est.crossJoin(broadcast(exact))
        .select(col("exact_distinct"), col("zero_regs"),
          (col("est4").cast("double") / 10000.0).as("est"),
          (expr("est4 div exact_distinct").cast("double") / 10000.0)
            .as("ratio"))
    }),

    // Sketch-based SET INTERSECTION — the audience-overlap /
    // cross-shard-vocabulary question sketches exist to answer at
    // 100 TB: |A∩B| ≈ est(A) + est(B) − est(A∪B) (inclusion-
    // exclusion), where the UNION sketch is the register-wise max —
    // the SAME mergeability that carries one sketch across the
    // exchange composes two sketches into their union for free. A is the
    // urgent-order customer set, B the low-priority one — a genuinely
    // PARTIAL data-driven overlap (customers with both); ONE tag-exploded scan builds
    // both register vectors AND the exact three-way census (the
    // ≤2·256-row sketch exchange vs the distinct-scale exact one —
    // the trade the estimate row quantifies). est arithmetic is the
    // q_hll_estimate exact-integer chain ×3; the intersection
    // estimate can be legitimately negative on tiny overlaps — it is
    // reported signed, as the raw inclusion-exclusion value.
    "q_hll_intersect" -> ((s, dir) => {
      val tagged = Tables(s, dir, "orders")
        .select(col("o_custkey").cast("string").as("w"),
          explode(expr(
            "filter(array(CASE WHEN o_orderpriority = '1-URGENT' " +
              "THEN 'a' END, " +
              "CASE WHEN o_orderpriority = '5-LOW' THEN 'b' END), " +
              "x -> x is not null)")).as("tag"))
      val regs = tagged
        .select(col("tag"), expr(s"cast($hllReg as int)").as("reg"),
          expr(s"cast($hllRho as int)").as("rho"))
        .groupBy(col("tag"), col("reg")).agg(max(col("rho")).as("m"))
        .localCheckpoint() // ≤512 rows; three est consumers below
      def estOf(rf: org.apache.spark.sql.DataFrame, out: String) = {
        val grid = s.range(0, 256).select(col("id").cast("int").as("reg"))
        grid.join(rf, Seq("reg"), "left")
          .select(coalesce(col("m"), lit(0)).as("m"))
          .agg(sum(expr("cast(power(2, 53 - m) as decimal(38,0))")).as("hsum"))
          .select(expr(s"cast(($hllEstNum) div (2570790 * hsum) as bigint)")
            .as(out))
      }
      val ea = estOf(regs.filter(col("tag") === "a").select("reg", "m"), "ea4")
      val eb = estOf(regs.filter(col("tag") === "b").select("reg", "m"), "eb4")
      val eu = estOf(regs.groupBy(col("reg")).agg(max(col("m")).as("m")), "eu4")
      val exact = tagged.groupBy(col("w"))
        .agg(max(when(col("tag") === "a", 1L).otherwise(0L)).as("ia"),
          max(when(col("tag") === "b", 1L).otherwise(0L)).as("ib"))
        .agg(sum(col("ia")).as("exact_a"), sum(col("ib")).as("exact_b"),
          sum(col("ia") * col("ib")).as("exact_intersect"))
      exact.crossJoin(broadcast(ea)).crossJoin(broadcast(eb))
        .crossJoin(broadcast(eu))
        .select(col("exact_a"), col("exact_b"), col("exact_intersect"),
          (col("ea4").cast("double") / 10000.0).as("est_a"),
          (col("eb4").cast("double") / 10000.0).as("est_b"),
          ((col("ea4") + col("eb4") - col("eu4")).cast("double") / 10000.0)
            .as("est_intersect"))
    }),

    // HLL register-count tuning row: the estimate at m = 64/256/1024
    // from ONE register build — the error-vs-exchange-size trade a
    // pipeline tunes against (same pattern as q_knn_recall for nprobe).
    // Because 64 | 256 | 1024, register j at a smaller m is EXACTLY
    // reg₁₀₂₄ mod m ((x mod 1024) mod m = x mod m) and max-of-max
    // folds the registers — the same mergeability that carries the
    // sketch across the 100 TB exchange carries it across register
    // granularities, so ONE register build feeds all three rows. Per-m
    // alpha stays exact-integer: alpha₆₄ = 709/1000 (the paper's small-m
    // constant), alpha_m = 7213·m/(10000·(m+1.079)) for m ≥ 128 — each
    // numerator is assembled by integer multiplication (never
    // cast(power()) — the q_hll_estimate Double.toString lesson).
    "q_hll_tuning" -> ((s, dir) => {
      import s.implicits._
      val toks = Tables(s, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("w"))
      // The m=1024 register vector IS the whole sketch — ≤1024 (reg, rh)
      // rows whatever the data scale — so it is built once and collected
      // (the Clustering K-row pattern). Keeping it lazy instead triples
      // the lineitem scan: a union's arms re-plan a shared subtree with
      // fresh attribute IDs and neither ReuseExchange nor AQE stage
      // reuse dedupes them (verified on the executed plan).
      val regs1024 = toks
        .select(expr(s"cast(${hllRegAt(1024)} as int)").as("reg"),
          expr(s"cast($hllRho as int)").as("rho"))
        .groupBy(col("reg")).agg(max(col("rho")).as("rh"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
        .toDF("reg", "rh")
      def estRow(m: Int, aNum: String, aDen: String) = {
        val folded = regs1024.groupBy((col("reg") % m).as("reg"))
          .agg(max(col("rh")).as("rh"))
        val grid = s.range(0, m).select(col("id").cast("int").as("reg"))
        grid.join(folded, Seq("reg"), "left")
          .select(coalesce(col("rh"), lit(0)).as("rh"))
          .agg(
            sum(expr("cast(power(2, 53 - rh) as decimal(38,0))")).as("hsum"),
            sum(when(col("rh") === 0, 1L).otherwise(0L)).as("zero_regs"))
          .select(lit(m).as("m"), col("zero_regs"),
            expr(s"cast(($aNum) div ($aDen * hsum) as bigint)").as("est4"))
      }
      val rows = estRow(64,
          "cast(709 as decimal(38,0)) * 4096 * 10000 * 9007199254740992",
          "1000")
        .unionByName(estRow(256, hllEstNum, "2570790"))
        .unionByName(estRow(1024,
          "cast(7213 as decimal(38,0)) * 1073741824 * 10000 * 9007199254740992",
          "10250790"))
      val exact = toks.agg(countDistinct(col("w")).as("exact_distinct"))
      rows.crossJoin(broadcast(exact))
        .select(col("m"), col("exact_distinct"), col("zero_regs"),
          (col("est4").cast("double") / 10000.0).as("est"),
          (expr("est4 div exact_distinct").cast("double") / 10000.0)
            .as("ratio"))
        .orderBy("m")
    }),

    // Mergeable HISTOGRAM-QUANTILE sketch — the third constant-payload
    // sketch next to CMS and HLL: p50/p90/p99 of l_extendedprice (in
    // exact cents) estimated from a 32-bin equi-width histogram. Two
    // scan-shaped passes (exact min/max/count, then bin counts) whose
    // exchange payload is ≤ 32 rows at ANY scale — bin counts are
    // trivially mergeable (partial aggregation sums them map-side), so
    // at 100 TB every executor ships 32 longs where an exact quantile
    // ships a global sort. The estimate is all-integer (ceil-rank +
    // within-bin linear interpolation via truncating division over
    // non-negative operands), so the twin is hash-exact; the accuracy
    // contract (|est − true| < one bin width by construction) is pinned
    // in AggregatesSpec rather than here — keeping the registered
    // query free of the global sort it exists to avoid.
    // The GROUPED form of the histogram-quantile sketch — per-group
    // p50/p99 is the monitoring workhorse (latency per endpoint, price
    // per segment). Same two scan-shaped passes keyed by the group:
    // exact per-group min/max/count, then per-(group, bin) counts —
    // the exchange carries ≤ 32·|groups| rows at any SF. Bin geometry
    // is per group (each group's own [lo, hi] range), the estimate is
    // the same all-integer ceil-rank + interpolation, and the ≤32-row
    // per-group cumulative window is partitioned by group.
    "q_quantile_sketch_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("g"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
      val wd = v.groupBy(col("g")).agg(min(col("v")).as("lo"),
          max(col("v")).as("hi"), count(lit(1)).as("n"))
        .withColumn("width", expr("(hi - lo) div 32 + 1"))
      val bins = v.join(wd.hint("shuffle_hash"), "g")
        .groupBy(col("g"), expr("(v - lo) div width").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val cum = bins.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("g")).orderBy(col("bin"))))
      val ranks = wd.select(col("g"), col("lo"), col("width"), explode(expr(
        "array(named_struct('q_pct', 50, 'r', (n + 1) div 2), " +
          "named_struct('q_pct', 99, 'r', (99 * n + 99) div 100))")).as("s"))
        .select(col("g"), col("lo"), col("width"), col("s.q_pct"), col("s.r"))
      ranks.join(cum, Seq("g"))
        .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
        .select(col("g"), col("q_pct"), col("r"), col("bin"), col("cnt"),
          expr("lo + bin * width + ((r - (cum - cnt)) * width) div cnt")
            .as("est_cents"))
        .orderBy("g", "q_pct")
    }),

    "q_quantile_sketch" -> ((s, dir) => {
      val v = Tables(s, dir, "lineitem")
        .select(expr("cast(l_extendedprice * 100 as bigint)").as("v"))
      val wd = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
          count(lit(1)).as("n"))
        .withColumn("width", expr("(hi - lo) div 32 + 1"))
      val bins = v.crossJoin(broadcast(wd))
        .groupBy(expr("(v - lo) div width").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val cum = bins.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("bin")))) // ≤ 32 rows
      val ranks = wd.select(col("lo"), col("width"), explode(expr(
        "array(named_struct('q_pct', 50, 'r', (n + 1) div 2), " +
          "named_struct('q_pct', 90, 'r', (9 * n + 9) div 10), " +
          "named_struct('q_pct', 99, 'r', (99 * n + 99) div 100))")).as("s"))
        .select(col("lo"), col("width"), col("s.q_pct"), col("s.r"))
      ranks.join(cum, col("cum") >= col("r") &&
          col("cum") - col("cnt") < col("r"))
        .select(col("q_pct"), col("r"), col("bin"), col("cnt"),
          expr("lo + bin * width + ((r - (cum - cnt)) * width) div cnt")
            .as("est_cents"))
        .orderBy("q_pct")
    }))

  /** HLL register index at m registers: top 32 md5 bits mod m (shared
    * hex-prefix trick with CountMin — BloomSpec/CMS pin the Spark↔DuckDB
    * agreement). */
  private def hllRegAt(m: Int): String =
    s"cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % $m"

  private val hllReg = hllRegAt(256)

  /** rho = 1 + leading zeros of the 52-bit suffix x (md5 hex chars 9-21):
    * leading zeros = 52 − length(bin(x)); x = 0 (P = 2⁻⁵²) caps at 53. */
  private val hllRho =
    "case when cast(conv(substring(md5(w), 9, 13), 16, 10) as bigint) = 0 then 53 " +
      "else 53 - length(bin(cast(conv(substring(md5(w), 9, 13), 16, 10) as bigint))) end"

  /** est·10⁴ numerator: alpha_256·256²·2⁵³·10⁴ as EXACT integers, with
    * alpha_256 = 0.7213/(1 + 1.079/256) = 7213·256/2570790 — so
    * numerator = 7213·2²⁴·10⁴·2⁵³ and denominator carries the 2570790.
    * 2⁷⁷ is assembled by decimal multiplication of two ≤16-digit exact
    * factors; `cast(power(2,77) as decimal)` would silently round in
    * Spark (Double.toString keeps 17 significant digits). */
  private val hllEstNum =
    "cast(7213 as decimal(38,0)) * 16777216 * 10000 * 9007199254740992"

  val oracles: Map[String, String] = Map(
    // Asserts the HLL++ estimate stayed inside its 3σ accuracy
    // envelope (approx_ok = true); the exact distinct hash-gates.
    "q_approx_distinct" -> """
      SELECT l_returnflag,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
             CAST(1 AS BOOLEAN) AS approx_ok
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    // Twin of the histogram-quantile sketch: identical integer bin
    // geometry, ceil-ranks, and within-bin interpolation; DuckDB's //
    // floor-division equals Spark's truncating `div` because every
    // operand is non-negative by construction (v ≥ lo, cum ≥ r).
    "q_quantile_sketch_group" -> """
      WITH v AS (SELECT o_orderpriority AS g,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS v
                 FROM orders),
      wd AS (SELECT g, min(v) AS lo, max(v) AS hi, count(*) AS n,
                    (max(v) - min(v)) // 32 + 1 AS width
             FROM v GROUP BY 1),
      b AS (SELECT v.g AS g, (v.v - wd.lo) // wd.width AS bin,
                   count(*) AS cnt
            FROM v JOIN wd ON v.g = wd.g GROUP BY 1, 2),
      c AS (SELECT g, bin, cnt,
                   sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum
            FROM b),
      r AS (SELECT g, q_pct, CASE q_pct WHEN 50 THEN (n + 1) // 2
                   ELSE (99 * n + 99) // 100 END AS r, lo, width
            FROM wd, (VALUES (50), (99)) t(q_pct))
      SELECT r.g AS g, CAST(q_pct AS INT) AS q_pct, CAST(r.r AS BIGINT) AS r,
             CAST(bin AS BIGINT) AS bin, CAST(cnt AS BIGINT) AS cnt,
             CAST(lo + bin * width + ((r.r - (cum - cnt)) * width) // cnt
               AS BIGINT) AS est_cents
      FROM r JOIN c ON c.g = r.g AND c.cum >= r.r AND c.cum - c.cnt < r.r
      ORDER BY g, q_pct""",
    "q_quantile_sketch" -> """
      WITH v AS (SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v
                 FROM lineitem),
      wd AS (SELECT min(v) AS lo, max(v) AS hi, count(*) AS n,
                    (max(v) - min(v)) // 32 + 1 AS width FROM v),
      b AS (SELECT (v.v - wd.lo) // wd.width AS bin, count(*) AS cnt
            FROM v, wd GROUP BY 1),
      c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM b),
      r AS (SELECT q_pct, CASE q_pct WHEN 50 THEN (n + 1) // 2
                   WHEN 90 THEN (9 * n + 9) // 10
                   ELSE (99 * n + 99) // 100 END AS r, lo, width
            FROM wd, (VALUES (50), (90), (99)) t(q_pct))
      SELECT CAST(q_pct AS INT) AS q_pct, CAST(r.r AS BIGINT) AS r,
             CAST(bin AS BIGINT) AS bin, CAST(cnt AS BIGINT) AS cnt,
             CAST(lo + bin * width + ((r.r - (cum - cnt)) * width) // cnt
               AS BIGINT) AS est_cents
      FROM r JOIN c ON c.cum >= r.r AND c.cum - c.cnt < r.r
      ORDER BY q_pct""",
    "q_funnel" -> """
      WITH m AS (SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
               min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
             FROM events GROUP BY 1)
      SELECT count(*) AS n_users, count(v) AS n_view,
        CAST(sum(CASE WHEN v < c THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        CAST(sum(CASE WHEN v < c AND c < p THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel
      FROM m""",
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_qty,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_base_price,
        CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_disc_price,
        CAST(round(CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount), 4) AS DOUBLE) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-12-31'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q_agg_funcs" -> """
      SELECT l_returnflag,
        min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        count(DISTINCT l_suppkey) AS n_supp,
        CAST(sum(l_linenumber) AS BIGINT) AS sum_line
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_distinct" -> """
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      ORDER BY c_mktsegment, c_nationkey""",
    "q_having" -> """
      SELECT c_nationkey, count(*) AS n_cust,
        CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_bal
      FROM customer GROUP BY c_nationkey HAVING count(*) >= 5
      ORDER BY c_nationkey""",
    "q_case_when" -> """
      SELECT band, count(*) AS n,
        count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_price
      FROM (
        SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                    WHEN o_totalprice < 300000 THEN 'medium'
                    ELSE 'large' END AS band,
               o_orderstatus, o_totalprice
        FROM orders)
      GROUP BY band ORDER BY band""",
    "q_rollup" -> """
      SELECT coalesce(r_name, 'ALL') AS region,
             coalesce(n_name, 'ALL') AS nation,
             count(*) AS n_cust
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation""",
    "q_cube" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",
    "q_grouping_sets" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""",
    "q_pivot" -> """
      SELECT o_orderpriority,
        count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_percentile" -> """
      WITH t AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority,
        min(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS p25,
        min(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50,
        min(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90,
        max(n) AS n
      FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_stats" -> """
      WITH s AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
          CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy2,
          CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        CAST(round(sqrt((n * sx2 - sx * sx) / nullif(n * (n - 1), 0)), 4) AS DOUBLE) AS stddev_qty,
        CAST(round((n * sxy - sx * sy) /
          nullif(sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy), 0), 4) AS DOUBLE) AS corr_qty_price
      FROM s ORDER BY l_returnflag""",
    "q_linreg" -> """
      WITH s AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
          CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy2,
          CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag),
      sl AS (
        SELECT *, (n * sxy - sx * sy) /
                  nullif(n * sx2 - sx * sx, 0.0) AS slope_raw
        FROM s)
      SELECT l_returnflag, n,
        CAST(round(slope_raw, 6) AS DOUBLE) AS slope,
        CAST(round((sy - slope_raw * sx) / n, 6) AS DOUBLE) AS intercept,
        CAST(round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
          nullif((n * sx2 - sx * sx) * (n * sy2 - sy * sy), 0.0), 6)
          AS DOUBLE) AS r2
      FROM sl ORDER BY l_returnflag""",
    "q_corr_subquery" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > 2 * (
        SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               / count(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""",
    "q_udaf_wavg" -> """
      SELECT l_returnflag,
        CAST(round(
          CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)) * CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) /
          CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4) AS DOUBLE) AS wavg_price,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_scalar_subquery" -> """
      SELECT o_orderpriority, count(*) AS n_above
      FROM orders
      WHERE o_totalprice >
        (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_hll_registers" -> """
      WITH t AS (SELECT CAST(l_partkey AS VARCHAR) AS w FROM lineitem),
      h AS (SELECT CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % 256 AS INT) AS reg,
                   ('0x' || substr(md5(w), 9, 13))::BIGINT AS x
            FROM t)
      SELECT reg, CAST(max(CASE WHEN x = 0 THEN 53
                                ELSE 53 - length(bin(x)) END) AS INT) AS m
      FROM h GROUP BY reg ORDER BY reg""",
    "q_hll_estimate" -> """
      WITH t AS (SELECT CAST(l_partkey AS VARCHAR) AS w FROM lineitem),
      h AS (SELECT CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % 256 AS INT) AS reg,
                   ('0x' || substr(md5(w), 9, 13))::BIGINT AS x
            FROM t),
      r AS (SELECT reg, max(CASE WHEN x = 0 THEN 53
                                 ELSE 53 - length(bin(x)) END) AS m
            FROM h GROUP BY reg),
      grid AS (SELECT unnest(generate_series(0, 255)) AS reg),
      filled AS (SELECT coalesce(r.m, 0) AS m
                 FROM grid LEFT JOIN r ON grid.reg = r.reg),
      agg AS (SELECT sum(CAST(power(2, 53 - m) AS DECIMAL(38,0))) AS hsum,
                     CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_regs
              FROM filled),
      e AS (SELECT zero_regs,
              CAST((7213::HUGEINT * 16777216 * 10000 * 9007199254740992)
                   // (2570790::HUGEINT * CAST(hsum AS HUGEINT)) AS BIGINT) AS est4
            FROM agg),
      ex AS (SELECT count(DISTINCT w) AS exact_distinct FROM t)
      SELECT exact_distinct, zero_regs,
             CAST(est4 AS DOUBLE) / 10000.0 AS est,
             CAST(est4 // exact_distinct AS DOUBLE) / 10000.0 AS ratio
      FROM e CROSS JOIN ex""",
    "q_hll_intersect" -> """
      WITH t AS (SELECT CAST(o_custkey AS VARCHAR) AS w, o_orderpriority
                 FROM orders),
      tg AS (SELECT w, tag FROM (
               SELECT w, unnest([
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' END,
                 CASE WHEN o_orderpriority = '5-LOW' THEN 'b' END])
                 AS tag
               FROM t) WHERE tag IS NOT NULL),
      h AS (SELECT tag,
                   CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % 256 AS INT) AS reg,
                   ('0x' || substr(md5(w), 9, 13))::BIGINT AS x
            FROM tg),
      r AS (SELECT tag, reg, max(CASE WHEN x = 0 THEN 53
                                      ELSE 53 - length(bin(x)) END) AS m
            FROM h GROUP BY tag, reg),
      grid AS (SELECT unnest(generate_series(0, 255)) AS reg),
      fa AS (SELECT coalesce(r.m, 0) AS m FROM grid
             LEFT JOIN (SELECT reg, m FROM r WHERE tag = 'a') r
               ON grid.reg = r.reg),
      ea AS (SELECT CAST((7213::HUGEINT * 16777216 * 10000 * 9007199254740992)
               // (2570790::HUGEINT * CAST(sum(CAST(power(2, 53 - m)
               AS DECIMAL(38,0))) AS HUGEINT)) AS BIGINT) AS ea4
             FROM fa),
      fb AS (SELECT coalesce(r.m, 0) AS m FROM grid
             LEFT JOIN (SELECT reg, m FROM r WHERE tag = 'b') r
               ON grid.reg = r.reg),
      eb AS (SELECT CAST((7213::HUGEINT * 16777216 * 10000 * 9007199254740992)
               // (2570790::HUGEINT * CAST(sum(CAST(power(2, 53 - m)
               AS DECIMAL(38,0))) AS HUGEINT)) AS BIGINT) AS eb4
             FROM fb),
      ru AS (SELECT reg, max(m) AS m FROM r GROUP BY reg),
      fu AS (SELECT coalesce(ru.m, 0) AS m FROM grid
             LEFT JOIN ru ON grid.reg = ru.reg),
      eu AS (SELECT CAST((7213::HUGEINT * 16777216 * 10000 * 9007199254740992)
               // (2570790::HUGEINT * CAST(sum(CAST(power(2, 53 - m)
               AS DECIMAL(38,0))) AS HUGEINT)) AS BIGINT) AS eu4
             FROM fu),
      ex AS (SELECT CAST(sum(ia) AS BIGINT) AS exact_a,
                    CAST(sum(ib) AS BIGINT) AS exact_b,
                    CAST(sum(ia * ib) AS BIGINT) AS exact_intersect
             FROM (SELECT w,
                     max(CASE WHEN tag = 'a' THEN 1 ELSE 0 END) AS ia,
                     max(CASE WHEN tag = 'b' THEN 1 ELSE 0 END) AS ib
                   FROM tg GROUP BY w))
      SELECT exact_a, exact_b, exact_intersect,
             CAST(ea4 AS DOUBLE) / 10000.0 AS est_a,
             CAST(eb4 AS DOUBLE) / 10000.0 AS est_b,
             CAST(ea4 + eb4 - eu4 AS DOUBLE) / 10000.0 AS est_intersect
      FROM ex CROSS JOIN ea CROSS JOIN eb CROSS JOIN eu""",
    // Per-m twin of q_hll_tuning: register index recomputed directly as
    // hb % m (identical to folding — (x mod 1024) mod m = x mod m);
    // HUGEINT division mirrors the Spark decimal `div` exactly.
    "q_hll_tuning" -> {
      def block(m: Int, num: String, den: String) = s"""
      r$m AS (SELECT CAST(hb % $m AS INT) AS reg, max(rho) AS rh FROM hr GROUP BY 1),
      g$m AS (SELECT CAST(unnest(generate_series(0, ${m - 1})) AS INT) AS reg),
      f$m AS (SELECT coalesce(rh, 0) AS rh FROM g$m LEFT JOIN r$m ON g$m.reg = r$m.reg),
      a$m AS (SELECT sum(CAST(power(2, 53 - rh) AS DECIMAL(38,0))) AS hsum,
                     CAST(sum(CASE WHEN rh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_regs
              FROM f$m),
      e$m AS (SELECT $m AS m, zero_regs,
                CAST(($num) // ($den * CAST(hsum AS HUGEINT)) AS BIGINT) AS est4
              FROM a$m)"""
      s"""
      WITH t AS (SELECT CAST(l_partkey AS VARCHAR) AS w FROM lineitem),
      h AS (SELECT ('0x' || substr(md5(w), 1, 8))::BIGINT AS hb,
                   ('0x' || substr(md5(w), 9, 13))::BIGINT AS x
            FROM t),
      hr AS (SELECT hb, CASE WHEN x = 0 THEN 53
                             ELSE 53 - length(bin(x)) END AS rho
             FROM h),
      ex AS (SELECT count(DISTINCT w) AS exact_distinct FROM t),
      ${block(64, "709::HUGEINT * 4096 * 10000 * 9007199254740992", "1000::HUGEINT")},
      ${block(256, "7213::HUGEINT * 16777216 * 10000 * 9007199254740992", "2570790::HUGEINT")},
      ${block(1024, "7213::HUGEINT * 1073741824 * 10000 * 9007199254740992", "10250790::HUGEINT")},
      u AS (SELECT * FROM e64 UNION ALL SELECT * FROM e256 UNION ALL SELECT * FROM e1024)
      SELECT m, exact_distinct, zero_regs,
             CAST(est4 AS DOUBLE) / 10000.0 AS est,
             CAST(est4 // exact_distinct AS DOUBLE) / 10000.0 AS ratio
      FROM u CROSS JOIN ex ORDER BY m"""
    })
}
