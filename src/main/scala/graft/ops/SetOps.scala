// (see also Aggregates for pivot; unpivot lives here with the
// shape-changing operators)
package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Set operations + scan/filter/projection (SURVEY.md §2c "set ops",
  * "projection", "filter"). Union is the reference's input-vector
  * concatenation (Search.cpp:25-33); intersect/except are its
  * tag-group-inspect derivation — Spark plans both as a single
  * aggregate/join over the union, no driver involvement.
  */
object SetOps {

  val queries: Map[String, Q] = Map(
    // UNION ALL (bag semantics — duplicates preserved, like the
    // reference's vector concat).
    "q_union_all" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey").as("nk"), lit("customer").as("side"))
      val sp = Tables(s, dir, "supplier")
        .select(col("s_nationkey").as("nk"), lit("supplier").as("side"))
      c.union(sp).groupBy(col("nk"), col("side"))
        .agg(count(lit(1)).as("n"))
        .orderBy("nk", "side")
    }),

    // INTERSECT (set semantics): nations having both customers and
    // suppliers.
    "q_intersect" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sp = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(sp).orderBy("nk")
    }),

    // EXCEPT (set semantics): nations with customers but no suppliers.
    "q_except" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sp = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.except(sp).orderBy("nk")
    }),

    // UNPIVOT (melt): wide per-row metrics to long (metric, value)
    // rows — the inverse of q_pivot, a scan-side generator with no
    // shuffle before the sort.
    "q_unpivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    // Deterministic hash sample: ~1/16 of orders chosen by a content
    // hash (md5 first hex digit), NOT rand()/TABLESAMPLE — at scale a
    // sample must be reproducible across engines, retries, and stages,
    // which only content hashing gives. One pushed scan + filter.
    "q_sample_hash" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "7")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          graft.Num.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Sampling ERROR BOUND — the statistical-guarantee row that makes
    // a hash sample trustworthy at 100 TB (the "is a 1/16 scan enough
    // to estimate this" answer, priced): the 1-in-16 q_sample_hash
    // slice estimates the mean order price, the CLT 95% half-width
    // 1.96·s/√n rides beside it, and within_ci verifies the exact
    // full-scan mean falls inside. Numerics: prices as exact integer
    // CENTS (the quantile-sketch idiom), so n·Σx² − (Σx)² is exact
    // DECIMAL(38,0); the only doubles are the final sqrt/divide chain
    // rounded once, and the 1.96 enters as CAST(196)/10⁴ (a bare 1.96
    // literal is DECIMAL(3,2) in DuckDB). Degenerate-guarded at
    // n < 2. Scale: two aggregates over one pushed scan each — the
    // sample side reads 1/16 of the data at any SF.
    "q_sample_ci" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
      val samp = o
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "7")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).as("sx"),
          sum(expr("cast(v * v as decimal(38,0))")).as("sx2"))
      val exact = o.agg(count(lit(1)).as("na"),
        sum(col("v").cast("decimal(38,0)")).as("sxa"))
      samp.crossJoin(broadcast(exact))
        .withColumn("est_c", expr(
          "CASE WHEN n = 0 THEN cast(0.0 as double) " +
            "ELSE cast(sx as double) / cast(n as double) END"))
        .withColumn("exact_c", expr(
          "CASE WHEN na = 0 THEN cast(0.0 as double) " +
            "ELSE cast(sxa as double) / cast(na as double) END"))
        .withColumn("hw_c", expr(
          "CASE WHEN n < 2 THEN cast(0.0 as double) " +
            "ELSE cast(196 as double) * " +
            "sqrt(cast(cast(n as decimal(38,0)) * sx2 - sx * sx as double) " +
            "/ cast(n * (n - 1) as double)) / sqrt(cast(n as double)) " +
            "/ cast(100 as double) END")) // /100: the 1.96 rode in as 196
        .select(col("n").as("n_sample"), col("na").as("n_total"),
          expr("cast(round(est_c / 100, 4) as double)").as("est_mean"),
          expr("cast(round(hw_c / 100, 4) as double)").as("half_width"),
          expr("cast(round(exact_c / 100, 4) as double)").as("exact_mean"),
          expr("CASE WHEN n < 2 THEN false " +
            "ELSE abs(est_c - exact_c) <= hw_c END").as("within_ci"))
    }),

    // Mixture weighting — per-source sampling RATES (the data-mixing
    // knob of a pre-training recipe: upsample books, downsample web).
    // Keep rate per source via a deterministic hash threshold: the
    // first two md5 hex chars compare LEXICOGRAPHICALLY like their
    // numeric value, so "< '80'" is an exact 128/256 rate in both
    // engines with no hex→int conversion. One scan-side projection +
    // one conditional aggregate; retry/engine-stable like
    // q_sample_hash.
    "q_sample_weighted" -> ((s, dir) => {
      val thr = expr(
        """CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'zz'
          |     WHEN source IN ('src5','src6','src7','src8','src9') THEN '80'
          |     ELSE '40' END""".stripMargin)
      Tables(s, dir, "documents")
        .withColumn("keep",
          substring(md5(col("doc_id").cast("string")), 1, 2) < thr)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("keep").cast("long")).as("n_kept"))
        .orderBy("source")
    }),

    // TEMPERATURE mixing — q_sample_weighted with the rates LEARNED
    // from the data instead of hard-coded: w_s = n_s^α (α = 0.5, the
    // published multilingual/data-mixing temperature knob — raising
    // low-resource sources, flattening the head), p_s = w_s / Σw,
    // quota = p_s · B for a budget of half the corpus, per-source keep
    // rate = min(1, quota/n_s). Membership stays the deterministic
    // hash threshold, but against a COMPUTED bound: the rate (exact
    // DECIMAL(38,6) after one rounded IEEE division each step — Σw is
    // an order-independent decimal sum, never a float accumulation)
    // scales to a 32-bit integer threshold rendered as 8 lowercase
    // hex chars, compared lexicographically against the doc's first 8
    // md5 chars — fixed-width lowercase hex is order-isomorphic to
    // the numeric value (the LSH signature lesson), so no hex→int
    // conversion on the corpus side. Plan: two bounded aggregates
    // (sources × counts), the 20-row rate frame broadcast onto one
    // corpus scan — at 100 TB this is a scan plus dimension joins.
    // The data RECIPE table — q_mix_temperature's other half: that
    // query DOWNSAMPLES to hit the mixture (rate ≤ 1); this one fixes
    // a token BUDGET (2× the corpus) and reports how many EPOCHS of
    // each source the temperature mixture implies — the
    // repeats-per-source number a LLaMA-style data card publishes
    // (sources above their natural share repeat, epochs > 1; below,
    // they are subsampled, epochs < 1). Token-weighted (not docs):
    // one tokenize scan, a |sources|-row aggregate, a broadcast 1-row
    // total; exact decimal weights, one rounding per ratio.
    "q_mix_epochs" -> ((s, dir) => {
      val src = Tables(s, dir, "documents")
        .select(col("source"),
          expr("size(filter(split(text, ' '), x -> x <> ''))").as("tk"))
        .groupBy(col("source")).agg(sum(col("tk")).as("n_tokens"))
        .withColumn("wgt", expr(
          "cast(round(sqrt(cast(n_tokens as double)), 6) as decimal(38,6))"))
      val tot = src.agg(expr("cast(sum(wgt) as decimal(38,6))").as("wtot"),
        sum(col("n_tokens")).as("ntot"))
      src.crossJoin(broadcast(tot))
        .withColumn("p_mix", expr(
          "cast(round(cast(wgt as double) / cast(wtot as double), 6) as decimal(38,6))"))
        .withColumn("quota_tokens",
          expr("cast(p_mix * (2 * ntot) as decimal(38,6))"))
        .withColumn("epochs", expr(
          "cast(round(cast(quota_tokens as double) / cast(n_tokens as double), 4) as double)"))
        .select(col("source"), col("n_tokens"),
          col("p_mix").cast("double").as("p_mix"),
          expr("cast(floor(quota_tokens) as bigint)").as("quota_tokens"),
          col("epochs"))
        .orderBy("source")
    }),

    "q_mix_temperature" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val src = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("wgt",
          expr("cast(round(sqrt(cast(n as double)), 6) as decimal(38,6))"))
      val tot = src.agg(expr("sum(wgt)").as("wtot"),
        sum(col("n")).as("ntot"))
      val rates = src.crossJoin(broadcast(tot))
        .withColumn("p_mix", expr(
          "cast(round(cast(wgt as double) / cast(wtot as double), 6) as decimal(38,6))"))
        .withColumn("quota", expr("p_mix * (ntot div 2)"))
        .withColumn("rate", expr(
          "cast(round(least(cast(1.0 as double), cast(quota as double) / cast(n as double)), 6) as decimal(38,6))"))
        .withColumn("thr_hex", expr(
          "lower(lpad(hex(cast(floor(rate * 4294967296) as bigint)), 8, '0'))"))
      val kept = docs
        .join(broadcast(rates.select(col("source"), col("rate"), col("thr_hex"))),
          "source")
        .filter(expr(
          "rate >= 1.0 or substring(md5(cast(doc_id as string)), 1, 8) < thr_hex"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("n").as("n_docs"),
          col("p_mix").cast("double").as("p_mix"),
          col("rate").cast("double").as("rate"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("source")
    }),

    // WEIGHTED sampling WITHOUT replacement (Efraimidis & Spirakis,
    // IPL 2006 — the weighted-reservoir key trick): each doc draws a
    // deterministic uniform u ∈ (0, 1] from its md5 and exposes the
    // order key u^(1/w) (w = n_chars: longer docs proportionally more
    // likely); the global top-20 by key IS a weighted sample without
    // replacement. This is THE distributed shape for weighted
    // sampling: no sequential reservoir, no rejection loop — one
    // scan-side key projection and one top-k (TakeOrdered), trivially
    // mergeable across partitions, which is why it appears in every
    // map-reduce sampling library. Keys round to 6 dp before ranking
    // (pow is transcendental — the established cross-engine
    // discipline) with doc_id as the total-order tiebreak.
    "q_sample_es" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("es_key").desc, col("doc_id").asc)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("u", expr(
          "(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) + 1) / 4294967296.0"))
        .withColumn("es_key", expr("round(pow(u, 1.0 / n_chars), 6)"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("rk"), col("doc_id"), col("source"), col("n_chars"),
          col("es_key"))
        .orderBy("rk")
    }),

    // Stratified sample: a fixed quota per stratum (20 docs per lang),
    // chosen by content-hash rank — the data-mixing primitive of a
    // training pipeline (per-language/source quotas), deterministic
    // across engines and retries like q_sample_hash. Plan shape: the
    // rank filter becomes WindowGroupLimit, so each partition keeps at
    // most 20 rows per stratum BEFORE the exchange — the shuffle
    // carries O(strata × quota) rows per partition, not the corpus.
    "q_sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("hk"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string")).as("hk"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    }),

    // Pure scan + pushed filter + pruned projection: the plan must show
    // PushedFilters + a 3-column ReadSchema at any SF.
    "q_filter_project" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp") &&
          col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    }))

  val oracles: Map[String, String] = Map(
    "q_union_all" -> """
      SELECT nk, side, count(*) AS n FROM (
        SELECT c_nationkey AS nk, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nk, 'supplier' AS side FROM supplier)
      GROUP BY nk, side ORDER BY nk, side""",
    "q_intersect" -> """
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nk""",
    "q_except" -> """
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nk""",
    "q_unpivot" -> """
      SELECT l_orderkey, l_linenumber, metric, value
      FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber, metric""",
    "q_sample_ci" -> """
      WITH o AS (SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS v
                 FROM orders),
      sp AS (SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(v AS HUGEINT)) AS sx,
               sum(CAST(v * v AS HUGEINT)) AS sx2
             FROM o
             WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '7'),
      ex AS (SELECT CAST(count(*) AS BIGINT) AS na,
               sum(CAST(v AS HUGEINT)) AS sxa
             FROM o),
      m AS (SELECT n, na,
              CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) END AS est_c,
              CASE WHEN na = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) END AS exact_c,
              CASE WHEN n < 2 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(196 AS DOUBLE) *
                  sqrt(CAST(CAST(n AS HUGEINT) * sx2 - sx * sx AS DOUBLE)
                    / CAST(n * (n - 1) AS DOUBLE))
                  / sqrt(CAST(n AS DOUBLE)) / CAST(100 AS DOUBLE) END AS hw_c
            FROM sp CROSS JOIN ex)
      SELECT n AS n_sample, na AS n_total,
             CAST(round(est_c / 100, 4) AS DOUBLE) AS est_mean,
             CAST(round(hw_c / 100, 4) AS DOUBLE) AS half_width,
             CAST(round(exact_c / 100, 4) AS DOUBLE) AS exact_mean,
             CASE WHEN n < 2 THEN false
               ELSE abs(est_c - exact_c) <= hw_c END AS within_ci
      FROM m""",
    "q_sample_hash" -> """
      SELECT o_orderstatus, count(*) AS n,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_price
      FROM orders
      WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '7'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_sample_weighted" -> """
      SELECT source, count(*) AS n_docs,
        CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          (CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'zz'
                WHEN source IN ('src5','src6','src7','src8','src9') THEN '80'
                ELSE '40' END)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM documents GROUP BY source ORDER BY source""",
    "q_mix_epochs" -> """
      WITH tk AS (SELECT source,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
             FROM documents),
      src AS (SELECT source, CAST(sum(tk) AS BIGINT) AS n_tokens
              FROM tk GROUP BY source),
      sw AS (SELECT source, n_tokens,
               CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wgt
             FROM src),
      tot AS (SELECT CAST(sum(wgt) AS DECIMAL(38,6)) AS wtot,
                CAST(sum(n_tokens) AS BIGINT) AS ntot
              FROM sw),
      r AS (SELECT source, n_tokens,
              CAST(round(CAST(wgt AS DOUBLE) / CAST(wtot AS DOUBLE), 6)
                AS DECIMAL(38,6)) AS p_mix, ntot
            FROM sw CROSS JOIN tot),
      q AS (SELECT source, n_tokens, p_mix,
              CAST(p_mix * (2 * ntot) AS DECIMAL(38,6)) AS quota_tokens
            FROM r)
      SELECT source, n_tokens,
             CAST(p_mix AS DOUBLE) AS p_mix,
             CAST(floor(quota_tokens) AS BIGINT) AS quota_tokens,
             CAST(round(CAST(quota_tokens AS DOUBLE) /
               CAST(n_tokens AS DOUBLE), 4) AS DOUBLE) AS epochs
      FROM q ORDER BY source""",
    "q_mix_temperature" -> """
      WITH src AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      sw AS (SELECT source, n,
               CAST(round(sqrt(CAST(n AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wgt
             FROM src),
      tot AS (SELECT CAST(sum(wgt) AS DECIMAL(38,6)) AS wtot,
                CAST(sum(n) AS BIGINT) AS ntot
              FROM sw),
      rates AS (SELECT source, n,
          CAST(round(CAST(wgt AS DOUBLE) / CAST(wtot AS DOUBLE), 6)
            AS DECIMAL(38,6)) AS p_mix,
          CAST(round(least(1.0,
              CAST(CAST(round(CAST(wgt AS DOUBLE) / CAST(wtot AS DOUBLE), 6)
                     AS DECIMAL(38,6)) * (ntot // 2) AS DOUBLE)
              / CAST(n AS DOUBLE)), 6) AS DECIMAL(38,6)) AS rate
        FROM sw CROSS JOIN tot),
      thr AS (SELECT *,
                lower(lpad(to_hex(CAST(floor(rate * 4294967296) AS BIGINT)),
                  8, '0')) AS thr_hex
              FROM rates),
      kept AS (SELECT d.source, count(*) AS n_kept
               FROM documents d JOIN thr t ON d.source = t.source
               WHERE t.rate >= 1.0
                  OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr_hex
               GROUP BY d.source)
      SELECT t.source, t.n AS n_docs,
             CAST(t.p_mix AS DOUBLE) AS p_mix,
             CAST(t.rate AS DOUBLE) AS rate,
             coalesce(k.n_kept, 0) AS n_kept
      FROM thr t LEFT JOIN kept k ON t.source = k.source
      ORDER BY t.source""",
    "q_sample_es" -> """
      WITH hx AS (SELECT doc_id, source, n_chars,
                    md5(CAST(doc_id AS VARCHAR)) AS h
                  FROM documents),
      uu AS (SELECT doc_id, source, n_chars,
               (CAST(list_sum(list_transform(generate_series(1, 8), i ->
                  (ascii(substr(h, i, 1))
                   - CASE WHEN substr(h, i, 1) >= 'a' THEN 87 ELSE 48 END)
                  * power(16, 8 - i))) AS BIGINT) + 1) / 4294967296.0 AS u
             FROM hx),
      ky AS (SELECT doc_id, source, n_chars,
               round(power(u, 1.0 / n_chars), 6) AS es_key
             FROM uu),
      rk AS (SELECT *, CAST(row_number() OVER
               (ORDER BY es_key DESC, doc_id ASC) AS INT) AS rk
             FROM ky)
      SELECT rk, doc_id, source, n_chars, es_key
      FROM rk WHERE rk <= 20 ORDER BY rk""",
    "q_sample_stratified" -> """
      WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hk
                 FROM documents),
      r AS (SELECT doc_id, lang,
              CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS INT) AS rk
            FROM h)
      SELECT lang, rk, doc_id FROM r WHERE rk <= 20
      ORDER BY lang, rk""",
    "q_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2001-06-01' AND l_quantity > 45
      ORDER BY l_orderkey, l_linenumber""")
}
