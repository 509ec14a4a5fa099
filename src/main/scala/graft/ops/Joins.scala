package graft.ops

import graft.{Num, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join library — every join flavor the reference model can derive
  * (SURVEY.md §2c): repartition (reduce-side) join, broadcast (map-side)
  * join, semi/anti/outer variants, and multi-way star joins.
  *
  * Scale strategy, stated per query below. The rule of thumb encoded
  * here for the 100 TB case:
  *  - dimension tables (region 5, nation 25, supplier, part) are
  *    `broadcast()` explicitly — a broadcast hash join costs zero
  *    shuffle of the fact side;
  *  - fact-fact joins (orders ⋈ lineitem, customer ⋈ orders) are left
  *    to Catalyst's sort-merge/shuffled-hash choice on the join key —
  *    both sides exchange once on the key, AQE handles skew;
  *  - aggregate *before* joining where the join is only needed for
  *    dimension attributes (classic partial-agg pushdown), shrinking
  *    the exchanged side by orders of magnitude.
  */
object Joins {

  val queries: Map[String, Q] = Map(
    // Map-side (broadcast) join: fact lineitem ⋈ dim part. The
    // reference's analog is the `g_substring` global visible to every
    // map thread (Search.cpp:9) — a broadcast variable in miniature.
    // (part grows with SF; the forced broadcast is this query's POINT —
    // demonstrating the operator — not a universal recommendation: past
    // executor memory you drop the hint and AQE picks the strategy.)
    "q_join_broadcast" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // Reduce-side (repartition) join: customer ⋈ orders, both scale
    // with SF → shuffle both on the key; partial-agg orders first so
    // the exchange carries one row per customer, not per order.
    "q_join_shuffle" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val perCust = o.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          Num.dsum(col("o_totalprice")).as("sum_price"))
      c.join(perCust, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("n_orders")).as("n_orders"),
          Num.dsum(col("sum_price")).as("sum_price"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // Left outer join preserving empty groups (count(col) skips nulls).
    "q_join_left" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      n.join(c, col("n_nationkey") === col("c_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
        .orderBy("n_name")
    }),

    // Left-semi: customers with ≥1 order in 2001 (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // Left-anti: parts never shipped in 2001 (NOT EXISTS).
    "q_join_anti" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      p.join(l, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")
    }),

    // Full outer: per-nation customer counts vs supplier counts —
    // either side may be absent; nulls coalesced away for determinism.
    "q_join_full_outer" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sp = Tables(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    // TPC-H Q3-style: 3-way join + agg + top-k with total tiebreak.
    "q_join_q3" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Bloom-filter semi-join reduction: the selective dim side builds
    // graft's mergeable bitset aggregate (functions/Bloom.scala — one
    // bitset per map task, OR-merged, a few KB total), the 1-row
    // bitset broadcasts, and the FACT side drops non-matching rows at
    // the scan with built-in codegen'd xxhash64 arithmetic — BEFORE
    // paying its shuffle. At 100 TB a 90%-selective dim predicate cuts
    // the fact exchange ~90% for the cost of k hashes per row; false
    // positives are removed by the real join, so the result is
    // EXACTLY the plain join's — which is what the oracle checks (the
    // bloom is a plan property, not a semantics change; BloomSpec pins
    // no-false-negatives bit-for-bit vs the SQL probe).
    // TPC-H Q8-shaped market share: the DEEP multi-join (lineitem ×
    // part × supplier × nation ×2 × orders × customer × region — 8
    // relations) whose whole point is leaving join ORDER to Catalyst:
    // the declared tree is lineitem-first, but CBO/AQE reorders and
    // broadcasts the dimension chain from runtime sizes — exactly the
    // freedom a hand-scheduled engine doesn't have. Money stays exact:
    // volume = price_cents × (100 − discount_pct) is pure BIGINT per
    // row, summed in DECIMAL(38,0); the yearly market share is the one
    // double, rounded after exact inputs.
    "q_join_q8" -> ((s, dir) => {
      val volCents =
        expr("cast(round(l_extendedprice * 100) as bigint)") *
          (lit(100L) - expr("cast(round(l_discount * 100) as bigint)"))
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val region = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          volCents.as("vol"))
        .join(Tables(s, dir, "part").filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n2, col("s_nationkey") === col("s_nk"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("c_nk"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(year(col("o_orderdate")).as("yr"), col("supp_nation"),
          col("vol"))
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("supp_nation") === "NATION_3", col("vol"))
            .otherwise(0L).cast("decimal(38,0)")).as("num"),
          sum(col("vol").cast("decimal(38,0)")).as("den"))
        .select(col("yr"), col("n_rows"),
          Num.r(col("num").cast("double") / col("den").cast("double"), 6)
            .as("mkt_share"))
        .orderBy("yr")
    }),

    "q_join_bloom" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val dim = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val bloom = dim.agg(expr("bloom_agg(o_orderkey, 8192, 3)").as("bl"))
      val facts = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .crossJoin(broadcast(bloom))
        .filter(expr(graft.functions.Bloom.containsSql(
          "bl", "l_orderkey", 8192, 3)))
      facts
        .join(dim.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("month")
    }),

    // TPC-H Q5-style: 6-way star join, revenue per nation. Dims
    // broadcast; facts sort-merge on their keys.
    "q_join_q5" -> ((s, dir) => {
      val r = Tables(s, dir, "region")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val sp = Tables(s, dir, "supplier")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // NOT IN subquery — null-aware anti join. NOT IN is NOT the same
    // operator as NOT EXISTS (q_join_anti): one NULL in the subquery
    // result empties the output under three-valued logic, so Spark
    // plans a dedicated BroadcastNestedLoopJoin/NullAwareAntiJoin.
    // Column chosen is non-null here, so results align with anti join —
    // the point is exercising the null-aware plan + SQL semantics.
    "q_not_in" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_ni")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_ni")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_ni
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_ni)
        ORDER BY c_custkey""")
    }),

    // Gap-fill / resample: daily order counts per priority with
    // zero-filled missing days over the GLOBAL date span. The calendar
    // is generated (sequence + explode — a few KB regardless of SF) and
    // broadcast against the aggregated counts: the fact table is
    // aggregated BEFORE the calendar join, so the join input is
    // O(days × priorities), never O(rows).
    "q_gapfill" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .withColumn("day", date_trunc("day", col("o_orderdate")))
      val counts = o.groupBy(col("day"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val span = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val calendar = span.select(explode(expr(
        "sequence(d0, d1, interval 1 day)")).as("day"))
      val prios = o.select(col("o_orderpriority")).distinct()
      calendar.crossJoin(prios)
        .join(counts, Seq("day", "o_orderpriority"), "left")
        .select(col("day"), col("o_orderpriority"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("day", "o_orderpriority")
    }),

    // As-of join (event-time point lookup): each purchase matched to
    // the same user's latest click at-or-before its timestamp.
    // Implementation is the scale path for as-of: tag both sides, union,
    // ONE shuffle on the key, and a per-key ordered scan carrying the
    // right side forward with last(ignoreNulls) — no range cross join,
    // no per-row probe. Right side is pre-deduped per (user, ts) with a
    // max(event_id) tiebreak so the matched row is well-defined in both
    // engines (DuckDB ASOF leaves equal-ts ties unspecified).
    "q_join_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(null).cast("bigint").as("event_id"),
          col("click_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id"),
          lit(null).cast("bigint").as("click_id"),
          lit(null).cast("timestamp").as("click_ts"))
      // side 0 < 1 sorts a click before purchases at the same instant,
      // so ts-equality counts as "before" (ASOF's >= semantics).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("m_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("m_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("side") === 1 && col("m_click_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("m_click_ts").as("click_ts"), col("m_click_id").as("click_id"))
        .orderBy("event_id")
    }),

    // Fuzzy (edit-distance) join — the entity-resolution primitive:
    // same-brand part pairs whose names are within Levenshtein 2.
    // Scale shape: the equality BLOCKING key (brand) turns the fuzzy
    // theta join into an equi join whose per-block candidate set is
    // |block|², never |table|² — the same bucketing idea as
    // q_join_range, with the expensive distance evaluated only inside
    // blocks, and a free length-band prefilter first (edit distance ≥
    // length difference, and the cheap predicate short-circuits the
    // conjunction). The second blocking level for when a block
    // outgrows the |block|² budget is q_join_fuzzy_seg below; the
    // oracle is the same blocked join, so blocking is checked as
    // semantics, not just as a plan shape.
    "q_join_fuzzy" -> ((s, dir) =>
      fuzzyPairs(Tables(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_name")))),

    // The SAME pair set through the PassJoin-style second blocking
    // level ([[fuzzyPairsSegmented]]) — oracle-identical to
    // q_join_fuzzy, so the candidate-pruning level is verified as
    // semantics (a lost pair fails the hash compare), not trusted as
    // a plan shape.
    "q_join_fuzzy_seg" -> ((s, dir) =>
      fuzzyPairsSegmented(Tables(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_name")))),

    // FORWARD as-of: each purchase matched to the NEXT click at or
    // after it — the other half of the as-of family (backward above).
    // Same merged-stream shape mirrored: purchases sort BEFORE a
    // same-instant click (side 0 < 1, so ts-equality counts as
    // "after"), and the match is FIRST-ignoreNulls over the
    // current-row→unbounded-following frame. Still one user_id
    // exchange, no join node.
    "q_join_asof_fwd" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id"),
          lit(null).cast("bigint").as("click_id"),
          lit(null).cast("timestamp").as("click_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("bigint").as("event_id"),
          col("click_id"), col("ts").as("click_ts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      purchases.unionByName(clicks)
        .withColumn("m_click_id", first(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("m_click_ts", first(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("side") === 0 && col("m_click_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("m_click_ts").as("click_ts"), col("m_click_id").as("click_id"))
        .orderBy("event_id")
    }),

    // NEAREST as-of: each purchase matched to its closest click in
    // TIME, either direction, ties to the backward click (classic
    // sensor/trade alignment — pandas merge_asof direction='nearest').
    // Same join-free merged-stream shape as q_join_asof/_fwd, but BOTH
    // candidates come out of ONE sorted pass: clicks sort before
    // purchases at equal ts, the backward frame takes last(click) up
    // to the row, the forward frame takes first(click) after it (an
    // equal-ts click lands in the backward frame with gap 0, which
    // always wins — so the frames never double-count), and a
    // three-way CASE elects the winner. One user-keyed exchange, one
    // sort, two frames — never a join, never |p|×|c|.
    "q_join_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(null).cast("bigint").as("event_id"),
          col("click_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id"),
          lit(null).cast("bigint").as("click_id"),
          lit(null).cast("timestamp").as("click_ts"))
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
      val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      clicks.unionByName(purchases)
        .withColumn("b_id", last(col("click_id"), ignoreNulls = true).over(back))
        .withColumn("b_ts", last(col("click_ts"), ignoreNulls = true).over(back))
        .withColumn("f_id", first(col("click_id"), ignoreNulls = true).over(fwd))
        .withColumn("f_ts", first(col("click_ts"), ignoreNulls = true).over(fwd))
        .filter(col("side") === 1 &&
          (col("b_id").isNotNull || col("f_id").isNotNull))
        .withColumn("g_b", unix_micros(col("ts")) - unix_micros(col("b_ts")))
        .withColumn("g_f", unix_micros(col("f_ts")) - unix_micros(col("ts")))
        .withColumn("take_back", col("f_id").isNull ||
          (col("b_id").isNotNull && col("g_b") <= col("g_f")))
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("take_back"), col("b_ts")).otherwise(col("f_ts")).as("click_ts"),
          when(col("take_back"), col("b_id")).otherwise(col("f_id")).as("click_id"),
          when(col("take_back"), col("g_b")).otherwise(col("g_f")).as("gap_us"),
          when(col("take_back"), lit("back")).otherwise(lit("fwd")).as("direction"))
        .orderBy("event_id")
    }),

    // Interval (range) self-join: pairs of same-user events ≤ 10 min
    // apart. Scale path: a theta join is made equi by time-bucketing —
    // the probe side explodes to its bucket ±1 (3 rows), the build side
    // keeps 1 row, the join shuffles on (user, bucket), and the exact
    // band predicate filters after. Pair count per key is bounded by
    // bucket density, never |user|² — the classic range-join rewrite
    // Catalyst doesn't do automatically.
    "q_join_range" -> ((s, dir) =>
      rangePairs(Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us")))
        .orderBy("user_id", "e1", "e2")),

    // INTERVAL-OVERLAP join — the missing temporal-join shape beside
    // as-of (nearest event) and range (proximity pairs): two interval
    // SETS joined where they overlap, the sessions×incidents /
    // spans×annotations alignment every observability or labeling
    // pipeline runs. Brute force is |A|×|B|; the rewrite explodes each
    // interval to its covered 1-hour buckets (bounded: sessions max
    // ~1.1 h ⇒ ≤ 3 buckets, incident windows ±5 min ⇒ ≤ 2) and joins
    // on bucket equality + the exact overlap predicate. The DEDUPE
    // TRICK: a pair sharing k buckets would emit k times — instead of
    // a distinct, a pair is emitted ONLY in the first bucket both
    // intervals cover (bucket = greatest of the two start buckets), so
    // each overlapping pair arises exactly once and no dedup exchange
    // exists. Per-bucket pair count is bounded by temporal density,
    // never |A|×|B|; the oracle is the BRUTE overlap join, so the
    // bucketed rewrite is checked row-identical to the naive
    // semantics (the rangePairs discipline).
    "q_join_interval" -> ((s, dir) => {
      val W = 3600L * 1000000L
      val gapUs = 1800L * 1000000L
      val ext = 300L * 1000000L
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val sess = ev
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("s"), max(col("us")).as("e"))
      val sb = sess.withColumn("bucket",
        explode(expr(s"sequence(s div $W, e div $W)")))
      val inc = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"),
          (col("us") - ext).as("i_s"), (col("us") + ext).as("i_e"))
      val ib = inc.withColumn("bucket",
        explode(expr(s"sequence(i_s div $W, i_e div $W)")))
      sb.join(ib.hint("shuffle_hash"),
          sb("bucket") === ib("bucket") &&
            col("s") <= col("i_e") && col("i_s") <= col("e") &&
            sb("bucket") === greatest(expr(s"s div $W"), expr(s"i_s div $W")))
        .groupBy(col("incident_id"))
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"),
          max(least(col("e"), col("i_e")) - greatest(col("s"), col("i_s")))
            .as("max_overlap_us"))
        .orderBy("incident_id")
    }),

    // Salted skew join (SkewJoin.salted): events ⋈ per-type stats on
    // event_type — a handful of distinct values, so an unsalted shuffle
    // join sends each type's entire row population to ONE task (the
    // canonical hot-key shape AQE can't always split). Salting fans
    // each hot key over 8 buckets; the oracle is the PLAIN join — the
    // salted rewrite must be row-identical to it by construction.
    "q_join_skew_salted" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      val dim = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_total"))
      SkewJoin.salted(ev, dim, "event_type", 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("type_total")).as("type_total"),
          Num.dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    }))

  /** Bucketed range-join core over (user_id, event_id, us): same-user
    * event pairs within `windowUs`, unsorted. Public so the scale probe
    * can drive it on replicated inputs.
    *
    * The `shuffle_hash` hint is load-bearing at scale: Catalyst's
    * size estimate for the exploded probe side ignores the 3× fan-out,
    * so without it the planner happily BROADCASTS the fan-out side
    * once the pre-explode estimate sits under the threshold — measured
    * 272 s vs 18.6 s at the 100× probe (ScaleProbe `range_100x`), a
    * 1.7 GB "broadcast". With the hint the plan is a shuffled hash
    * join (no per-partition sort, unlike `merge`; same 100× wall,
    * faster at small scale) driven by RUNTIME sizes: AQE can still
    * re-plan from actual exchanged bytes, which is the only size
    * signal you can trust below a fan-out operator. The hint sits on
    * the UN-exploded side: the hinted side becomes the SHJ build side,
    * and its per-partition hash map should be the 1-row-per-event
    * side, not the 3× fan-out. */
  /** Brand-blocked edit-distance(≤2) self-join over (p_brand,
    * p_partkey, p_name): every same-brand pair k1 < k2 within the
    * length band, banded 3-arg levenshtein evaluated once per
    * candidate. Candidates per block are |block|² — fine while blocks
    * are bounded; [[fuzzyPairsSegmented]] is the second level for when
    * they are not. ScaleProbe drives both on replicated parts. */
  def fuzzyPairs(part: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val a = part.select(col("p_brand"), col("p_partkey").as("k1"),
      col("p_name").as("n1"))
    val b = part.select(col("p_brand"), col("p_partkey").as("k2"),
      col("p_name").as("n2"))
    a.join(b, Seq("p_brand"))
      .filter(col("k1") < col("k2") &&
        abs(length(col("n1")) - length(col("n2"))) <= 2)
      // 3-arg levenshtein runs the BANDED O(n·k) DP and early-exits
      // past the bound (returns -1) — one eval per candidate, ~2×
      // cheaper than the unbounded distance at threshold 2
      .withColumn("dist", expr("levenshtein(n1, n2, 2)"))
      .filter(col("dist") >= 0)
      .select(col("p_brand"), col("k1"), col("k2"), col("n1"), col("n2"),
        col("dist"))
      .orderBy("p_brand", "k1", "k2")
  }

  /** The second blocking level: PassJoin-style pigeonhole segmenting
    * (Li, Deng, Feng, VLDB 2011 idea at τ = 2). Split every BUILD name
    * into τ+1 = 3 contiguous segments — ≤ 2 edits cannot touch all
    * three, so for any pair within distance 2 at least one build
    * segment occurs VERBATIM in the probe name, displaced by at most
    * τ positions. Candidates are therefore an EQUALITY join on
    * (brand, build-length, segment-index, segment-text): the build
    * side emits 3 keys per name; the probe side enumerates its
    * substrings of the matching segment length within the ±τ position
    * window (≤ ~45 keys for 7–12-char names after clipping+dedup) —
    * per-key bucket sizes replace the |block|² blowup, which is the
    * whole point when one brand floods (ScaleProbe's fuzzy_hot rows
    * measure exactly that). A candidate pair can match several
    * segments, so pairs are deduplicated before the one banded
    * levenshtein eval. The length band is implied: only build lengths
    * within ±2 of the probe length are enumerated. Output is
    * row-identical to [[fuzzyPairs]] (q_join_fuzzy_seg shares
    * q_join_fuzzy's oracle), so losslessness of the pigeonhole is
    * hash-checked, not assumed.
    *
    * Names SHORTER than 3 characters cannot form 3 non-empty segments,
    * so any pair touching one routes through the plain blocked path
    * instead (the `short` union arm) — a bounded set in any real
    * corpus (strings of length ≤ 2 have tiny cardinality), and on this
    * dataset (name lengths 7–12) an empty one; FuzzyJoinSpec pins the
    * equality on synthetic data where the arm is non-empty. */
  def fuzzyPairsSegmented(part: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // pairs with a <3-char name on either side: plain path on the tiny
    // short-name slice (length band bounds the other side to ≤ 4)
    val shortA = part.filter(length(col("p_name")) < 3)
      .select(col("p_brand"), col("p_partkey").as("ka"),
        col("p_name").as("na"))
    val anyB = part.filter(length(col("p_name")) <= 4)
      .select(col("p_brand"), col("p_partkey").as("kb"),
        col("p_name").as("nb"))
    val short = shortA.join(anyB, Seq("p_brand"))
      .filter(col("ka") =!= col("kb") &&
        abs(length(col("na")) - length(col("nb"))) <= 2)
      // canonicalize so (short, long≥3) pairs keep k1 < k2 regardless
      // of which side carried the short name, then dedupe the
      // (short, short) pairs that arrive in both orientations
      .select(col("p_brand"),
        least(col("ka"), col("kb")).as("k1"),
        greatest(col("ka"), col("kb")).as("k2"),
        when(col("ka") < col("kb"), col("na")).otherwise(col("nb")).as("n1"),
        when(col("ka") < col("kb"), col("nb")).otherwise(col("na")).as("n2"))
      .distinct()
    // build: name → its 3 segments, keyed by (brand, own length, j, text)
    val build = part.filter(length(col("p_name")) >= 3)
      .select(col("p_brand"), col("p_partkey").as("k2"),
        col("p_name").as("n2"))
      .withColumn("lb", length(col("n2")))
      .withColumn("j", explode(expr("sequence(0, 2)")))
      .withColumn("pj", expr("(j * lb) div 3"))
      .withColumn("lj", expr("((j + 1) * lb) div 3 - (j * lb) div 3"))
      .select(col("p_brand"), col("k2"), col("n2"), col("lb"), col("j"),
        expr("substring(n2, pj + 1, lj)").as("seg"))
    // probe: for each candidate build length lb in ±2 and segment j,
    // every substring of that segment's length starting within ±2 of
    // the segment's home position (clipped to the string). The join
    // key includes (lb, j), so duplicate candidates only MATTER within
    // one (lb, j) group — and there they only arise from nearby start
    // positions yielding the same substring (k1 is the table's key, so
    // this per-group dedup ≡ the old global .distinct()). Dedup is
    // therefore an `array_distinct` over the ≤5-element STRING array
    // of one segment's windows, map-side inside the generator chain:
    // the full exchange of the ~45×-fanned-out probe rows that
    // `.distinct()` paid (the r7 verdict's suspect) is gone, and the
    // string fast path costs ~nothing (a struct-array distinct here
    // measured 3× worse than the exchange it replaced). The start
    // range is always non-empty: pj + lj = ((j+1)·lb) div 3 ≤ lb ≤
    // la + 2 gives hi ≥ lo, so no empty-sequence guard is needed.
    val probe = part.filter(length(col("p_name")) >= 3)
      .select(col("p_brand"), col("p_partkey").as("k1"),
        col("p_name").as("n1"))
      .withColumn("la", length(col("n1")))
      .withColumn("lb", explode(expr("sequence(greatest(la - 2, 3), la + 2)")))
      .withColumn("j", explode(expr("sequence(0, 2)")))
      .withColumn("pj", expr("(j * lb) div 3"))
      .withColumn("lj", expr("((j + 1) * lb) div 3 - (j * lb) div 3"))
      .withColumn("lo", greatest(lit(0), col("pj") - 2))
      .withColumn("hi", least(col("la") - col("lj"), col("pj") + 2))
      .withColumn("seg", explode(expr(
        "array_distinct(transform(sequence(lo, hi), p -> substring(n1, p + 1, lj)))")))
      .select(col("p_brand"), col("k1"), col("n1"), col("lb"), col("j"),
        col("seg"))
    // The segment join follows the repo's runtime-size rule (see the
    // Dedup header): BOTH sides sit under generators, so Catalyst's
    // estimates are garbage — unhinted, it broadcast the ~45×-fanned
    // probe side (measured: seg_10x probe 27 → 82 s, hot10x 63 →
    // 325 s). The hinted side is the BOUNDED one (3 segments/name);
    // AQE sizes the exchanges from actual bytes.
    probe.join(build.hint("shuffle_hash"), Seq("p_brand", "lb", "j", "seg"))
      .filter(col("k1") < col("k2"))
      .select(col("p_brand"), col("k1"), col("k2"), col("n1"), col("n2"))
      .distinct()
      .unionByName(short)
      .withColumn("dist", expr("levenshtein(n1, n2, 2)"))
      .filter(col("dist") >= 0)
      .select(col("p_brand"), col("k1"), col("k2"), col("n1"), col("n2"),
        col("dist"))
      .orderBy("p_brand", "k1", "k2")
  }

  def rangePairs(e: org.apache.spark.sql.DataFrame,
      windowUs: Long = 600L * 1000000L): org.apache.spark.sql.DataFrame = {
    val W = windowUs
    val probe = e.withColumn("bucket",
      explode(expr(s"array(us div $W - 1, us div $W, us div $W + 1)")))
    val build = e.withColumn("bucket", expr(s"us div $W"))
    probe.as("a")
      .join(build.as("b").hint("shuffle_hash"),
        col("a.user_id") === col("b.user_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("b.us") - col("a.us")) <= W)
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("e1"), col("b.event_id").as("e2"),
        abs(col("b.us") - col("a.us")).as("gap_us"))
  }

  private val fuzzyOracle = """
      SELECT a.p_brand, a.p_partkey AS k1, b.p_partkey AS k2,
             a.p_name AS n1, b.p_name AS n2,
             CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
       AND abs(length(a.p_name) - length(b.p_name)) <= 2
       AND levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY a.p_brand, k1, k2"""

  val oracles: Map[String, String] = Map(
    "q_join_broadcast" -> """
      SELECT p_brand,
        CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",
    "q_join_shuffle" -> """
      SELECT c_mktsegment,
        CAST(sum(n_orders) AS BIGINT) AS n_orders,
        CAST(round(sum(CAST(sum_price AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_price,
        count(*) AS n_cust
      FROM customer JOIN (
        SELECT o_custkey, count(*) AS n_orders,
          CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_join_left" -> """
      SELECT n_name, count(c_custkey) AS n_cust
      FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "q_join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
      ORDER BY c_custkey""",
    "q_join_anti" -> """
      SELECT p_partkey, p_name FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
        WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01')
      ORDER BY p_partkey""",
    "q_join_full_outer" -> """
      SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
      FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
        ON c_nationkey = s_nationkey
      ORDER BY nationkey""",
    "q_join_q3" -> """
      SELECT o_orderkey, o_orderdate,
        CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 10""",
    "q_join_q8" -> """
      WITH v AS (
        SELECT l.l_orderkey, l.l_partkey, l.l_suppkey,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) *
                 (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol
        FROM lineitem l)
      SELECT CAST(date_part('year', o.o_orderdate) AS INT) AS yr,
             count(*) AS n_rows,
             CAST(round(
               CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                 THEN CAST(vol AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0))
                 END) AS DOUBLE) /
               CAST(sum(CAST(vol AS DECIMAL(38,0))) AS DOUBLE), 6)
               AS DOUBLE) AS mkt_share
      FROM v
      JOIN part p ON v.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      JOIN supplier s ON v.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      JOIN orders o ON v.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      GROUP BY 1 ORDER BY 1""",
    "q_join_bloom" -> """
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
          AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1 ORDER BY month""",
    "q_join_q5" -> """
      SELECT r_name, n_name,
        CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_not_in" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      ORDER BY c_custkey""",
    "q_gapfill" -> """
      WITH o AS (SELECT date_trunc('day', o_orderdate) AS day, o_orderpriority
                 FROM orders),
      counts AS (SELECT day, o_orderpriority, count(*) AS n FROM o GROUP BY 1, 2),
      span AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
      calendar AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                   FROM span),
      prios AS (SELECT DISTINCT o_orderpriority FROM o)
      SELECT c.day, p.o_orderpriority, coalesce(n, 0) AS n
      FROM calendar c CROSS JOIN prios p
      LEFT JOIN counts ON counts.day = c.day
        AND counts.o_orderpriority = p.o_orderpriority
      ORDER BY c.day, p.o_orderpriority""",
    "q_join_asof" -> """
      WITH p AS (SELECT user_id, event_id, ts FROM events
                 WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.user_id, p.event_id, p.ts, c.click_ts, c.click_id
      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY event_id""",
    "q_join_fuzzy" -> fuzzyOracle,
    // Same oracle on purpose: the segmented plan must reproduce the
    // plain blocked join's pair set exactly.
    "q_join_fuzzy_seg" -> fuzzyOracle,
    "q_join_asof_fwd" -> """
      WITH p AS (SELECT user_id, event_id, ts FROM events
                 WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.user_id, p.event_id, p.ts, c.click_ts, c.click_id
      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts <= c.click_ts
      ORDER BY event_id""",
    // brute nearest as the oracle: every (purchase, click) pair ranked
    // by absolute gap with the backward tiebreak — the semantics the
    // merged-stream plan must reproduce without the |p|×|c| join
    "q_join_asof_nearest" -> """
      WITH p AS (SELECT user_id, event_id, ts FROM events
                 WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      j AS (SELECT p.user_id, p.event_id, p.ts, c.click_ts, c.click_id,
              abs(epoch_us(p.ts) - epoch_us(c.click_ts)) AS gap_us,
              CASE WHEN c.click_ts <= p.ts THEN 'back' ELSE 'fwd' END AS direction,
              row_number() OVER (PARTITION BY p.event_id
                ORDER BY abs(epoch_us(p.ts) - epoch_us(c.click_ts)),
                         CASE WHEN c.click_ts <= p.ts THEN 0 ELSE 1 END) AS rn
            FROM p JOIN c ON p.user_id = c.user_id)
      SELECT user_id, event_id, ts, click_ts, click_id, gap_us, direction
      FROM j WHERE rn = 1 ORDER BY event_id""",
    "q_join_range" -> """
      SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
             abs(epoch_us(b.ts) - epoch_us(a.ts)) AS gap_us
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
       AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 600000000
      ORDER BY a.user_id, e1, e2""",
    // BRUTE interval-overlap join — the bucketed rewrite must match
    // the naive overlap semantics row for row
    "q_join_interval" -> """
      WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                  FROM events),
      sf AS (SELECT user_id, us, event_id,
               CASE WHEN lag(us) OVER w IS NULL
                      OR us - lag(us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
             FROM ev
             WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      sg AS (SELECT user_id, us,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
             FROM sf),
      iv AS (SELECT user_id, sid, min(us) AS s, max(us) AS e
             FROM sg GROUP BY 1, 2),
      inc AS (SELECT event_id AS incident_id,
                us - 300000000 AS i_s, us + 300000000 AS i_e
              FROM ev WHERE event_type = 'error')
      SELECT incident_id, count(*) AS n_sessions,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(max(least(e, i_e) - greatest(s, i_s)) AS BIGINT)
               AS max_overlap_us
      FROM iv JOIN inc ON s <= i_e AND i_s <= e
      GROUP BY 1 ORDER BY 1""",
    // plain (unsalted) join — the salted rewrite must match it exactly
    "q_join_skew_salted" -> """
      WITH dim AS (SELECT event_type, count(*) AS type_total
                   FROM events GROUP BY 1)
      SELECT e.event_type, count(*) AS n, max(type_total) AS type_total,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY 1 ORDER BY e.event_type""")
}
