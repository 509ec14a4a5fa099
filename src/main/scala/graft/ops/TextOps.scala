package graft.ops

import graft.{Num, Tables}
import graft.clients.Search
import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text/token operators over `documents` — the reference model's home
  * turf (Map-emitting-tokens is its canonical generator, SURVEY.md §2c
  * "UDTF / generator"), plus the Search client query itself.
  *
  * Scale notes: tokenization is `explode(split(...))` — a generator
  * inside whole-stage codegen, no shuffle until the aggregate; the
  * inverted index is one groupBy(token) exchange carrying (token,
  * doc_id) pairs, the minimum possible.
  */
object TextOps {

  /** Hex digit i (1-based) of the md5 column `h` as 0–15, in the
    * shared ascii/CASE dialect (the urlSynthSql idiom). */
  private def hd(i: Int): String =
    s"(ascii(substr(h, $i, 1)) - (CASE WHEN substr(h, $i, 1) >= 'a' THEN 87 ELSE 48 END))"

  /** PII-bearing text synthesized from the doc's md5 — VERBATIM-shared
    * between the Spark query and the DuckDB twin: the original text
    * plus md5-armed injections of an email (~50%, doubled ~25% of the
    * time), a 555-prefix phone (~50%), and a 10.x.y.z IP (~50%). */
  private[graft] val piiSynthSql: String = s"""concat(text,
      CASE WHEN ${hd(11)} % 2 = 0 THEN
        concat(' user', ${hd(12)}, '@mail', ${hd(13)} % 4, '.com') ELSE '' END,
      CASE WHEN ${hd(11)} % 2 = 0 AND ${hd(19)} % 4 = 0 THEN
        concat(' user', ${hd(20)}, '@mail', ${hd(21)} % 4, '.com') ELSE '' END,
      CASE WHEN ${hd(14)} % 2 = 0 THEN
        concat(' 555-01', ${hd(15)} % 10, ${hd(16)} % 10) ELSE '' END,
      CASE WHEN ${hd(17)} % 2 = 0 THEN
        concat(' 10.', ${hd(18)}, '.', ${hd(22)}, '.', ${hd(23)}) ELSE '' END)"""

  /** The three detector regexes — written with `[.]` classes instead of
    * backslash escapes so the SAME pattern string parses identically
    * under Java regex (Spark) and RE2 (DuckDB), and single-quoted SQL
    * literals need no engine-specific escaping. */
  private[graft] val piiEmailRe = "[a-z]+[0-9]+@mail[0-9][.]com"
  private[graft] val piiPhoneRe = "555-01[0-9][0-9]"
  private[graft] val piiIpRe = "10[.][0-9]+[.][0-9]+[.][0-9]+"

  /** The three-stage masking chain over an arbitrary column — Spark
    * regexp_replace is global by default; the DuckDB twin passes 'g'.
    * Shared by q_pii_scrub and the crawl pipeline. */
  private[graft] def piiMaskExpr(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($c, " +
      s"'$piiEmailRe', '<EMAIL>'), '$piiPhoneRe', '<PHONE>'), " +
      s"'$piiIpRe', '<IP>')"

  private[graft] def piiMaskSqlDuck(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($c, " +
      s"'$piiEmailRe', '<EMAIL>', 'g'), '$piiPhoneRe', '<PHONE>', 'g'), " +
      s"'$piiIpRe', '<IP>', 'g')"

  /** The span-corruption mask bit for token `i` of `doc_id` — shared
    * by q_span_corruption and the cleaning report. */
  private val spanMaskBit = "cast(conv(substring(md5(concat(" +
    "cast(doc_id as string), ':', cast(i as string))), 1, 4), " +
    "16, 10) as bigint) % 20 < 3"

  /** The Gopher repetition gate as a frame-taking projection —
    * (doc_id, n_tokens, fractions, keep) for every non-empty doc;
    * shared by q_gopher_repetition and the cleaning report. Pure
    * higher-order array functions: zero exchanges (PlanSpec-pinned). */
  /** DuckDB twin of [[gopherFlags]] as reusable CTEs ending in `gkp`
    * (doc_id, ratios, keep) — shared by the q_gopher_repetition twin
    * and the LR-vs-Gopher agreement twin in TextAnalysis. */
  private[graft] lazy val gopherCtes: String = """
      gd AS (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
                 FROM documents),
      gf AS (SELECT doc_id, t FROM gd WHERE len(t) > 0),
      gg AS (SELECT doc_id, t,
              CASE WHEN len(t) >= 2 THEN
                list_transform(generate_series(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i + 1]) ELSE [] END AS g2,
              CASE WHEN len(t) >= 3 THEN
                list_transform(generate_series(1, len(t) - 2),
                  i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) ELSE [] END AS g3
            FROM gf),
      gsel AS (SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
                CAST(round(CAST(list_max(list_transform(list_distinct(t),
                  w -> len(list_filter(t, x -> x = w)))) AS DOUBLE) /
                  CAST(len(t) AS DOUBLE), 4) AS DOUBLE) AS top_word_frac,
                CAST(CASE WHEN len(t) >= 3 THEN
                  round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) /
                    CAST(len(g2) AS DOUBLE), 4)
                  ELSE 0.0 END AS DOUBLE) AS dup_2gram_frac,
                CAST(CASE WHEN len(t) >= 4 THEN
                  round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) /
                    CAST(len(g3) AS DOUBLE), 4)
                  ELSE 0.0 END AS DOUBLE) AS dup_3gram_frac
              FROM gg),
      gkp AS (SELECT doc_id, n_tokens, top_word_frac, dup_2gram_frac,
                dup_3gram_frac,
                (top_word_frac <= 0.2 AND dup_2gram_frac <= 0.2
                  AND dup_3gram_frac <= 0.2) AS keep
              FROM gsel)"""

  private[graft] def gopherFlags(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    gopherFlagsOn(
        docs.select(col("doc_id"),
          expr("filter(split(text, ' '), x -> x <> '')").as("t"))
          .filter(size(col("t")) > 0))
      .select(col("doc_id"), col("n_tokens"), col("top_word_frac"),
        col("dup_2gram_frac"), col("dup_3gram_frac"), col("keep"))

  /** Column-retaining form over a frame already carrying a nonempty
    * token array `t`: ADDS the ratio/keep columns (and drops the
    * g2/g3 scratch) so a composed pipeline can gate mid-stream
    * without a join back. */
  /** The C4 LINE-RULE stage as an IN-ROW projection (no explode, no
    * aggregate): line split, both line rules, and the page arm
    * re-expressed with higher-order array functions so the gate is a
    * pure scan-side pass — the form [[graft.streaming.Streams.c4Gate]]
    * streams unchanged (the span dedup stays batch-only: it is a
    * GLOBAL window, the same reasoning as the funnel's keeper swap).
    * Rule arithmetic is IDENTICAL to q_c4_clean's exploded form;
    * StreamsSpec pins per-doc agreement and the exchange-free plan. */
  private[graft] def c4LineGateOn(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val lineRule = "(ascii(substr(md5(l), 1, 1)) - " +
      "(CASE WHEN substr(md5(l), 1, 1) >= 'a' THEN 87 ELSE 48 END)) % 4 != 0" +
      " AND size(split(l, ' ')) >= 5"
    docs
      .withColumn("h", md5(col("text")))
      .withColumn("t", expr("filter(split(text, ' '), x -> x <> '')"))
      .withColumn("n_lines",
        expr("cast(ceil(size(t) / cast(10 as double)) as int)"))
      .withColumn("lines", expr(
        "CASE WHEN n_lines >= 1 THEN transform(sequence(0, n_lines - 1), " +
          "i -> concat_ws(' ', slice(t, i * 10 + 1, 10))) " +
          "ELSE array() END"))
      .withColumn("page_bad", expr(s"${hd(24)} = 0"))
      .withColumn("kept", expr(s"filter(lines, l -> $lineRule)"))
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - size(col("kept"))).cast("long").as("n_drop_rule"),
        col("page_bad"),
        md5(concat_ws(" ", col("kept"))).as("keep_hash"))
  }


  /** Frame-taking q_c4_clean body (ScaleProbe's c4 section replicates
    * the corpus through it: every replica's 3-line spans duplicate
    * the original's, so span-dedup removals EXPLODE by design — the
    * mirror-heavy-crawl behavior C4's global dedup exists for). */
  private[graft] def c4CleanOn(
      src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val L = 10
      def lhd(i: Int) =
        s"(ascii(substr(lh, $i, 1)) - (CASE WHEN substr(lh, $i, 1) >= 'a' THEN 87 ELSE 48 END))"
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("ridx"))
      val docs = src
        .select(col("doc_id"), md5(col("text")).as("h"),
          expr("filter(split(text, ' '), x -> x <> '')").as("t"))
        .withColumn("n_lines",
          expr(s"cast(ceil(size(t) / cast($L as double)) as int)"))
        .withColumn("page_bad", expr(s"${hd(24)} = 0"))
      val lines = docs
        .select(col("doc_id"), col("page_bad"), col("n_lines"),
          posexplode(expr(s"CASE WHEN n_lines >= 1 THEN " +
            s"transform(sequence(0, n_lines - 1), " +
            s"i -> concat_ws(' ', slice(t, i * $L + 1, $L))) " +
            s"ELSE array() END")))
        .select(col("doc_id"), col("page_bad"), col("n_lines"),
          col("pos").as("lno"), col("col").as("ltext"))
        .withColumn("nw", size(split(col("ltext"), " ")))
        .withColumn("lh", md5(col("ltext")))
        .withColumn("rule_ok",
          expr(s"${lhd(1)} % 4 != 0") && col("nw") >= 5)
      // the span-dedup flows as ONE LINEAR window chain — no self-join
      // back, no removal-set materialization: the duplicate-START flag
      // computed under the global span-hash window is carried back to
      // the doc window, where "this line is covered by a duplicated
      // span" is just dup OR lag(dup,1) OR lag(dup,2). A line with no
      // complete span gets a per-line unique hash (rn = 1, harmless)
      // instead of a NULL span key — NULLs would funnel every tail
      // line in the corpus through one window partition.
      val surv = lines.filter(!col("page_bad") && col("rule_ok"))
        .withColumn("ridx", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("lno"))))
        .select(col("doc_id"), col("ridx"), col("ltext"))
      val chain = surv
        .withColumn("l2", lead(col("ltext"), 1).over(wDoc))
        .withColumn("l3", lead(col("ltext"), 2).over(wDoc))
        .withColumn("sh", when(col("l3").isNotNull,
            md5(concat_ws(" ", col("ltext"), col("l2"), col("l3"))))
          .otherwise(concat(lit("tail:"), col("doc_id"), lit(":"), col("ridx"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("sh")).orderBy(col("doc_id"), col("ridx"))))
        .withColumn("dup", col("l3").isNotNull && col("rn") > 1)
        .withColumn("removed", col("dup") ||
          lag(col("dup"), 1, false).over(wDoc) ||
          lag(col("dup"), 2, false).over(wDoc))
      val kept = chain.filter(!col("removed"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          md5(concat_ws(" ", expr(
            "transform(sort_array(collect_list(struct(ridx, ltext))), x -> x.ltext)")))
            .as("ch"))
      lines.groupBy(col("doc_id"))
        .agg(max(col("n_lines")).as("n_lines"),
          max(col("page_bad").cast("int")).as("pb"),
          sum(when(!col("page_bad") && !col("rule_ok"), 1L).otherwise(0L))
            .as("n_drop_rule"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"), col("n_drop_rule"),
          when(col("pb") === 1, 0L).otherwise(
            col("n_lines") - col("n_drop_rule") - coalesce(col("n_kept"), lit(0L)))
            .cast("long").as("n_drop_span"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("pb") === 0 && coalesce(col("n_kept"), lit(0L)) >= 3)
            .as("page_kept"),
          when(col("pb") === 0 && coalesce(col("n_kept"), lit(0L)) >= 3,
            col("ch")).otherwise(md5(lit(""))).as("clean_hash"))
        .orderBy("doc_id")
  }

  private[graft] def gopherFlagsOn(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def dupFrac(n: Int) =
      s"""CASE WHEN size(t) >= $n + 1 THEN round(
         |  cast(size(g$n) - size(array_distinct(g$n)) as double) /
         |  cast(size(g$n) as double), 4)
         |ELSE cast(0.0 as double) END""".stripMargin
    df
      // guard the construction, not just the ratio: Spark's
      // sequence(1, 0) is a DESCENDING [1, 0], not empty
      .withColumn("g2", expr(
        "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), " +
          "i -> concat_ws(' ', slice(t, i, 2))) ELSE array() END"))
      .withColumn("g3", expr(
        "CASE WHEN size(t) >= 3 THEN transform(sequence(1, size(t) - 2), " +
          "i -> concat_ws(' ', slice(t, i, 3))) ELSE array() END"))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("top_word_frac",
        expr("round(cast(array_max(transform(array_distinct(t), " +
          "w -> size(filter(t, x -> x = w)))) as double) / " +
          "cast(size(t) as double), 4)"))
      .withColumn("dup_2gram_frac", expr(dupFrac(2)))
      .withColumn("dup_3gram_frac", expr(dupFrac(3)))
      .withColumn("keep", col("top_word_frac") <= 0.2 &&
        col("dup_2gram_frac") <= 0.2 && col("dup_3gram_frac") <= 0.2)
      .drop("g2", "g3")
  }

  val queries: Map[String, Q] = Map(
    // The reference's Search, idiomatic form: pushed Contains filter +
    // projection + sort (SearchMRC.cpp:78-98 semantics — case-sensitive,
    // duplicates preserved).
    "q_search" -> ((s, dir) =>
      Search.dataframe(Tables(s, dir, "part"), "p_brand", "p_name", "wid")),

    // Wordcount — the canonical MapReduce derivation.
    "q_wordcount" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy("word")
    }),

    // Inverted index: token → sorted distinct posting list (serialized
    // to a string so the oracle compare is schema-stable).
    "q_inverted_index" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .distinct()
        .groupBy(col("word"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",", sort_array(collect_set(col("doc_id"))))
            .as("postings"))
        .orderBy("word")
    }),

    // TF-IDF: term frequency per (doc, word) × ln(N/df). Corpus-wide
    // stats (df, N) are computed over ALL docs; the reported rows are a
    // 1-in-20 doc sample purely to bound the compare size. Scale shape:
    // two hash-aggregates (on (doc,word) and word) + one shuffle join
    // on word + a broadcast scalar for N — the tf side is pre-filtered
    // before the join so only sampled docs pay the exchange.
    // Lazy and cache-free: tf and df are identical aggregate subtrees
    // over termFreqs, so the tokenize+agg exchange plans ONCE
    // (ReusedExchange) — measured faster at sf0.1 than persisting
    // termFreqs (columnar cache write + non-fused reads) and than
    // checkpointing the result (~2 s RDD-materialization overhead).
    "q_tfidf" -> ((s, dir) => tfidfTree(s, dir, termFreqs(s, dir))),

    // Okapi BM25 ranked retrieval (Robertson & Spärck Jones; the
    // Lucene `+1` idf variant, k1=1.2, b=0.75) — the classic
    // full-text-search scoring pass over the inverted index. The
    // query set is data-derived (every 61st doc contributes its 3
    // lexicographically-first distinct words of length ≥ 4), so the
    // whole operator stays relational and oracle-twinned. Scale
    // shape — the POSTING-LIST join, never query×corpus: the bounded
    // query-term table (|queries|×3 rows) first picks up df through
    // one vocab-sized SHJ (build = the hinted df side, same rule as
    // tf-idf), then BROADCASTS into the corpus tf scan, so only
    // postings of query terms survive the map side; doc lengths
    // attach by one doc-keyed SHJ; corpus stats ride a broadcast
    // scalar. Scores follow the nb_classify cross-engine discipline:
    // each per-term double rounds to 6 dp, sums exactly in
    // decimal(38,6), and the final rank is over the exact decimal.
    "q_bm25" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rw = Window.partitionBy(col("query_id"))
        .orderBy(col("s6").desc, col("doc_id"))
      bm25Scored(s, dir).withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
          round(col("s6"), 4).cast("double").as("score"))
        .orderBy("query_id", "rank")
    }),

    // Hybrid retrieval by RECIPROCAL RANK FUSION (Cormack, Clarke &
    // Büttcher 2009, k = 60) — the modern search stack's default way
    // to combine lexical and dense rankers: BM25 top-10 and dense
    // top-10 (documents ↔ vectors share ids in the fixtures, the
    // usual doc-store layout), fused as Σ 1/(60 + rank) over the
    // systems that returned the doc, re-ranked on the EXACT decimal
    // fusion score. PRODUCTION configuration (r17): the dense leg is
    // the PERSISTED trained-IVF index (IndexStore — the same flat-
    // parquet artifact every q_knn_ivf consumer loads), probed
    // nprobe = 2, and the query panel is ABSOLUTELY bounded (≤ 50
    // rows at ANY corpus size, the recall-panel discipline), so the
    // ivfTopBetween query broadcast is fixed-size and the candidate
    // work is panel × probed-cells — never panel × corpus. The twin
    // renders the identical trained cells via ivfIndexCtes, so the
    // row stays hash-gated; the EXACT brute dense leg survives as
    // truth inside q_rrf_fusion_recall. The fusion itself is one
    // (query, doc)-keyed full outer join and a WindowGroupLimit, the
    // cheap part by design. in_bm25/in_knn make each system's
    // contribution visible in the hash gate.
    "q_rrf_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val aw = Window.partitionBy(col("query_id"))
        .orderBy(col("s6").desc, col("doc_id"))
      val ranksA = bm25Scored(s, dir)
        .filter(col("query_id") < 3050)
        .withColumn("rank_a", row_number().over(aw))
        .filter(col("rank_a") <= 10)
        .select(col("query_id"), col("doc_id"), col("rank_a"))
      val cells = graft.llm.Similarity.ivfCells(s, dir)
      val ranksB = graft.llm.Similarity.ivfTopBetween(
          cells.filter(col("vec_id") % 61 === 0 && col("vec_id") < 3050),
          cells, k = 10, nprobe = 2)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rnk").as("rank_b"))
      val fused = ranksA
        .join(ranksB, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          expr("cast(coalesce(round(1.0 / (60 + rank_a), 6), 0.0) as decimal(38,6))") +
            expr("cast(coalesce(round(1.0 / (60 + rank_b), 6), 0.0) as decimal(38,6))"))
      val fw = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      fused.withColumn("rank", row_number().over(fw))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          expr("cast(rank_a is not null as int)").as("in_bm25"),
          expr("cast(rank_b is not null as int)").as("in_knn"),
          col("rrf").cast("double").as("rrf"))
        .orderBy("query_id", "rank")
    }),

    // RRF fusion QUALITY row — the metric q_rrf_fusion itself cannot
    // show (its dense leg is exact brute cosine, so fused ≤ knn by
    // construction there). Here the dense leg is the PRODUCTION
    // configuration — the SRP single-probe ANN (the 16× candidate
    // cut) — and ground truth is the exact brute cosine top-3 on the
    // same % 61 query panel. Three recall@3 rows make each system's
    // contribution measurable: lexical-only (bm25), approximate-dense-
    // only (knn_ann), and RRF(bm25 top-10, ann top-10) (Cormack et
    // al. 2009). On these fixtures the text and embedding columns are
    // statistically INDEPENDENT, so the lexical leg scores 0 against
    // cosine truth and the row demonstrates RRF's robustness property
    // rather than its lift: fused recall equals the dense leg — the
    // k=60 damping keeps ten noise docs per query from displacing the
    // informative leg's top-3 (on real corpora, where the legs
    // correlate, the same three rows surface the fusion lift). Scale
    // shape: every leg reuses its production plan (posting-list
    // probe; broadcast panel × bucketed corpus); the metric itself is
    // three broadcast-sized (query, doc) joins and 1-row aggregates.
    "q_rrf_fusion_recall" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pred = col("vec_id") % 61 === 0
      val truth = graft.llm.Similarity.bruteTopWhere(s, dir, pred, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val aw = Window.partitionBy(col("query_id"))
        .orderBy(col("s6").desc, col("doc_id"))
      val bm10 = bm25Scored(s, dir)
        .withColumn("rank_a", row_number().over(aw))
        .filter(col("rank_a") <= 10)
        .select(col("query_id"), col("doc_id"), col("rank_a"))
      val ann10 = graft.llm.Similarity.annTopWhere(s, dir, pred, k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rnk").as("rank_b"))
      val fw = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      val fused = bm10
        .join(ann10, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          expr("cast(coalesce(round(1.0 / (60 + rank_a), 6), 0.0) as decimal(38,6))") +
            expr("cast(coalesce(round(1.0 / (60 + rank_b), 6), 0.0) as decimal(38,6))"))
        .withColumn("rank", row_number().over(fw))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("doc_id"))
      // One metric join, not three: predictions union under a system
      // tag, the truth set explodes the same three tags, and recall
      // reduces to a single (system, query, doc) equi join + a 3-row
      // aggregate — the brute truth leg plans (and scans) ONCE instead
      // of once per metric branch.
      val preds = bm10.filter(col("rank_a") <= 3)
        .select(col("query_id"), col("doc_id"))
        .withColumn("system", lit("bm25"))
        .unionByName(ann10.filter(col("rank_b") <= 3)
          .select(col("query_id"), col("doc_id"))
          .withColumn("system", lit("knn_ann")))
        .unionByName(fused.withColumn("system", lit("rrf_fused")))
      truth
        .withColumn("system",
          explode(array(lit("bm25"), lit("knn_ann"), lit("rrf_fused"))))
        .join(preds.select(col("system").as("ps"),
            col("query_id").as("aq"), col("doc_id").as("an")),
          col("system") === col("ps") && col("query_id") === col("aq") &&
            col("neighbor_id") === col("an"), "left")
        .groupBy(col("system"))
        .agg(count(lit(1)).as("n_true"), count(col("an")).as("n_found"))
        .select(col("system"), col("n_true"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true").cast("double"), 4)
            .as("recall_at_3"))
        .orderBy("system")
    }),

    // Late-interaction MaxSim ranking — see [[maxsimScored]] (the
    // ColBERT scoring shape over hash token embeddings). Top-3 per
    // query on the exact integer score, doc_id tiebreak.
    "q_maxsim" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rw = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      maxsimScored(s, dir).withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("n_qtok"), col("score"))
        .orderBy("query_id", "rank")
    }),

    // TWO-STAGE retrieval — see [[maxsimTwoStage]] (IVF candidates →
    // MaxSim rerank, the ColBERTv2/PLAID production shape; the
    // exhaustive q_maxsim grid is the thing this plan never builds).
    "q_maxsim_twostage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rw = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      maxsimTwoStage(s, dir, cand = 20)
        .withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("n_qtok"), col("score"))
        .orderBy("query_id", "rank")
    }),

    // What the candidate cut COSTS in MaxSim order: overlap@3 of the
    // two-stage top-3 against the exhaustive q_maxsim top-3 on the
    // queries the two-stage leg answers (panel ∩ embedded vectors) —
    // the ColBERTv2 quality-vs-cost number. n_short counts two-stage
    // queries answered with < 3 docs (a 20-candidate shortlist can
    // run short only when the probed cells hold < 20 scoreable docs).
    // On these fixtures text and embeddings are INDEPENDENT (the
    // q_maxsim_recall note), so the dense candidate stage barely
    // intersects the text-derived MaxSim order (measured 0.037) — on a
    // real corpus, where the doc's single vector summarizes its token
    // vectors, this is the high-overlap number that licenses the cut.
    "q_maxsim_twostage_agree" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rw = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      def top3(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rank", row_number().over(rw))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("doc_id"))
      val ts = top3(maxsimTwoStage(s, dir, cand = 20))
      val ex = top3(maxsimScored(s, dir))
      val qs = ts.select(col("query_id")).distinct()
      val short = qs.join(ts.groupBy(col("query_id")).count(),
          Seq("query_id"), "left")
        .agg(sum(when(coalesce(col("count"), lit(0L)) < 3, 1L)
          .otherwise(0L)).as("n_short"))
      ex.join(qs, "query_id")
        .join(ts.select(col("query_id").as("aq"), col("doc_id").as("an")),
          col("query_id") === col("aq") && col("doc_id") === col("an"),
          "left")
        .agg(count(lit(1)).as("n_true"), count(col("an")).as("n_found"))
        .crossJoin(broadcast(short))
        // n_true can be 0 on a degenerate corpus where the two-stage leg
        // answers no queries — ANSI Divide would raise (the q_lr_auc
        // one-class failure class); NULL is the defined no-data answer.
        .select(col("n_true"), col("n_found"),
          when(col("n_true") > 0,
            round(col("n_found").cast("double") / col("n_true").cast("double"),
              4)).otherwise(lit(null).cast("double")).as("overlap_at_3"),
          col("n_short"))
    }),

    // MaxSim QUALITY row — the three-way shoot-out on the shared %61
    // truth panel (the q_rrf_fusion_recall pattern): recall@3 of
    // lexical BM25, late-interaction MaxSim, and RRF(bm25 top-10,
    // maxsim top-10) against the exact brute-cosine truth. On these
    // fixtures text and embeddings are independent, so both text legs
    // score ~0 against cosine truth and the row demonstrates the same
    // RRF robustness property as q_rrf_fusion_recall — on real
    // corpora the identical three rows surface the late-interaction
    // lift over bag-of-words. Every leg reuses its production plan;
    // the metric is one tag-exploded (system, query, doc) join.
    "q_maxsim_recall" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // truth panel bounded like the maxsim leg's (≤ 50 queries at
      // any SF) — the %-only panel made the MaxSim grid quadratic
      val pred = col("vec_id") % 61 === 0 && col("vec_id") < 3050
      val truth = graft.llm.Similarity.bruteTopWhere(s, dir, pred, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val aw = Window.partitionBy(col("query_id"))
        .orderBy(col("s6").desc, col("doc_id"))
      val bm10 = bm25Scored(s, dir)
        .withColumn("rank_a", row_number().over(aw))
        .filter(col("rank_a") <= 10)
        .select(col("query_id"), col("doc_id"), col("rank_a"))
      val mw = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      val mx10 = maxsimScored(s, dir)
        .withColumn("rank_b", row_number().over(mw))
        .filter(col("rank_b") <= 10)
        .select(col("query_id"), col("doc_id"), col("rank_b"))
      val fw = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      val fused = bm10
        .join(mx10, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          expr("cast(coalesce(round(1.0 / (60 + rank_a), 6), 0.0) as decimal(38,6))") +
            expr("cast(coalesce(round(1.0 / (60 + rank_b), 6), 0.0) as decimal(38,6))"))
        .withColumn("rank", row_number().over(fw))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("doc_id"))
      val preds = bm10.filter(col("rank_a") <= 3)
        .select(col("query_id"), col("doc_id"))
        .withColumn("system", lit("bm25"))
        .unionByName(mx10.filter(col("rank_b") <= 3)
          .select(col("query_id"), col("doc_id"))
          .withColumn("system", lit("maxsim")))
        .unionByName(fused.withColumn("system", lit("rrf_fused")))
      truth
        .withColumn("system",
          explode(array(lit("bm25"), lit("maxsim"), lit("rrf_fused"))))
        .join(preds.select(col("system").as("ps"),
            col("query_id").as("aq"), col("doc_id").as("an")),
          col("system") === col("ps") && col("query_id") === col("aq") &&
            col("neighbor_id") === col("an"), "left")
        .groupBy(col("system"))
        .agg(count(lit(1)).as("n_true"), count(col("an")).as("n_found"))
        .select(col("system"), col("n_true"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true").cast("double"), 4)
            .as("recall_at_3"))
        .orderBy("system")
    }),

    // Distinct-n n-gram diversity (the distinct-1/2/3 metric of Li et
    // al. 2016) per source — the generation-quality / memorization
    // screen a corpus report carries: a crawl slice whose trigram
    // diversity collapses is template boilerplate. One tokenize scan
    // per n-level feeding a count + count-distinct aggregate; the
    // ratio is the only double and rounds after exact integer counts.
    "q_ngram_diversity" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("source"),
          expr("filter(split(text, ' '), x -> x <> '')").as("t"))
      def level(n: Int) = toks.filter(size(col("t")) >= n)
        .select(col("source"), explode(expr(
          s"transform(sequence(0, size(t) - $n), " +
            s"i -> concat_ws(' ', slice(t, i + 1, $n)))")).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("g")).as("n_distinct"))
        .withColumn("n", lit(n))
      level(1).unionByName(level(2)).unionByName(level(3))
        .select(col("source"), col("n"), col("total_ngrams"), col("n_distinct"),
          Num.r(col("n_distinct").cast("double") /
            col("total_ngrams").cast("double")).as("diversity"))
        .orderBy("source", "n")
    }),

    // Length-bucket manifest for batch packing: docs grouped by the
    // power-of-two token-length bucket a length-grouped data loader
    // pads to, with the exact padding-waste fraction per bucket — the
    // number that decides bucketed vs packed batching. Integer-only
    // bucket assignment (1 << length(bin(len − 1)) — the hllRho
    // bin-length idiom, cross-engine exact); one scan, one ≤log₂(max)
    // -row aggregate.
    "q_length_buckets" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(expr("size(filter(split(text, ' '), x -> x <> ''))").as("len"))
        .filter(col("len") > 0)
        .withColumn("bucket", expr("CASE WHEN len <= 1 THEN 1L " +
          "ELSE shiftleft(1L, length(bin(cast(len - 1 as bigint)))) END"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_tokens"))
        .withColumn("padded_tokens", col("bucket") * col("n_docs"))
        .withColumn("pad_waste", Num.r(
          (col("padded_tokens") - col("sum_tokens")).cast("double") /
            col("padded_tokens").cast("double")))
        .orderBy("bucket")
    }),

    // Bigram collocations by pointwise mutual information — the n-gram
    // statistics pass of a corpus-analysis pipeline. Scale shape: two
    // hash-aggregates (unigrams, adjacent-pair bigrams from the SAME
    // per-row token array — a codegen transform, no second corpus
    // explode), two joins on word (the unigram side is vocabulary-
    // sized; AQE re-broadcasts it from runtime bytes at small SF), and
    // two broadcast scalars for the normalizers. PMI goes through one
    // ln over exact-integer ratios, rounded — cross-engine-stable the
    // same way q_tfidf's idf is.
    "q_ngram_pmi" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
      val uni = toks.select(explode(col("t")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val bi = toks.filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2), " +
            "i -> struct(t[i] as w1, t[i+1] as w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      val nUni = uni.agg(sum(col("c")).as("n_uni"))
      val nBi = bi.agg(sum(col("c_xy")).as("n_bi"))
      bi.filter(col("c_xy") >= 5)
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
        .select(col("w1"), col("w2"), col("c_xy"),
          Num.r(log((col("c_xy").cast("double") / col("n_bi").cast("double")) /
            ((col("c1").cast("double") / col("n_uni").cast("double")) *
              (col("c2").cast("double") / col("n_uni").cast("double")))))
            .as("pmi"))
        .orderBy("w1", "w2")
    }),

    // Exact triangle counting on the word co-occurrence graph — the
    // canonical graph-analytics MapReduce benchmark (Suri &
    // Vassilvitskii, WWW 2011). The skew-proof formulation: orient
    // every edge from its lower-(degree, id) endpoint to the higher
    // one, so each node's OUT-degree is O(√m) whatever its raw degree
    // — a celebrity hub generates √m-bounded wedge lists instead of
    // degree² — then a triangle is one wedge (src→x, src→y) whose
    // closing edge x→y exists in the same oriented set, counted
    // exactly once. Three hash joins, one explode, one aggregate; the
    // oracle runs the identical algorithm, so the orientation trick is
    // value-checked, not just asserted.
    "q_triangles" -> ((s, dir) => {
      val bi = Tables(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2), " +
            "i -> struct(t[i] as w1, t[i+1] as w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "" && col("w1") =!= col("w2"))
        .select(least(col("w1"), col("w2")).as("a"),
          greatest(col("w1"), col("w2")).as("b"))
        .distinct()
      val deg = bi.select(col("a").as("n")).union(bi.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val withDeg = bi
        .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      val oriented = withDeg.select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("db"))
          .otherwise(col("da")).as("ddst"))
      val o1 = oriented.select(col("src"), col("dst").as("x"), col("ddst").as("dx"))
      val o2 = oriented.select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
      val wedges = o1.join(o2, "src")
        .filter(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")))
      val tri = wedges.join(
        oriented.select(col("src").as("x"), col("dst").as("y")),
        Seq("x", "y"))
      tri.select(explode(array(col("src"), col("x"), col("y"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n_tri"))
        .orderBy("w")
    }),

    // Count-Min sketch of the token stream (Cormode & Muthukrishnan
    // 2005) — the fixed-memory frequency summary for streams/corpora
    // whose exact counts don't fit. The sketch is graft's native
    // mergeable aggregate (functions/CountMin.scala): each task folds
    // its partition into 4×256 counters, the exchange carries ONE 8 KB
    // buffer per task (vs the token stream), partial+final merge is
    // elementwise add. Counters are multiset sums — order-independent,
    // so the whole sketch hash-matches a GROUP BY oracle that builds
    // the same cells. Output: the non-empty cells, row-major index.
    "q_cms_sketch" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .agg(expr("cms_sketch(w, 4, 256)").as("sk"))
        .select(posexplode(col("sk")).as(Seq("idx", "cnt")))
        .filter(col("cnt") > 0)
        .select(col("idx").cast("long").as("idx"), col("cnt"))
        .orderBy("idx")
    }),

    // Point-estimate quality of the same sketch: for the 20 most
    // frequent tokens, the CMS estimate min_d sk[d·256 + cell_d(w)]
    // next to the true count — est ≥ true always (the CMS guarantee),
    // and the margin shows the collision cost at this width. The
    // 1-row sketch broadcasts; cell indices are computed in-plan with
    // md5/conv so both engines derive identical cells.
    "q_cms_estimate" -> ((s, dir) => {
      GraftFunctions.register(s)
      val toks = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val sketch = toks.agg(expr("cms_sketch(w, 4, 256)").as("sk"))
      val top = toks.groupBy(col("w")).agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("w").asc).limit(20)
      val ests = (0 to 3).map(d => expr(
        s"sk[$d * 256 + cast(cast(conv(substring(md5(concat('$d', ':', w)), 1, 8), 16, 10) as bigint) % 256 as int)]"))
      top.crossJoin(broadcast(sketch))
        .select(col("w"), col("true_cnt"), least(ests: _*).as("est"))
        .orderBy(col("true_cnt").desc, col("w").asc)
    }),

    // Hashing-trick bag-of-words vectorizer (Weinberger et al. 2009):
    // each token hashes to one of 16 dims with a ±1 sign from a second
    // hash — the fixed-width featurizer that needs NO vocabulary pass,
    // which is why it's the 100 TB-friendly text encoder (one scan,
    // no dictionary shuffle, collisions priced by the signed sum).
    // All-integer; reported for the 1-in-20 doc sample to bound rows.
    // PII detect + MASK — the redaction pass every training-data
    // pipeline runs before anything else sees the text (emails, phone
    // numbers, IPs → typed placeholders). PII is synthesized into the
    // docs from their md5 (piiSynthSql, shared verbatim with the twin)
    // so a known fraction of rows genuinely carries each type; the
    // detectors and the three-stage masking chain are plain regexp
    // built-ins, codegen'd in the scan projection — at 100 TB this is
    // a map-only pass with zero exchanges besides the output sort. The
    // masked text ships as its md5: the hash gate then proves the two
    // engines produced IDENTICAL redacted bytes, not just identical
    // counts (Spark's regexp_replace is global; the twin passes 'g').
    // C4 cleaning recipe (Raffel et al. 2020 §2.2) — the NAMED
    // line-rule pipeline, run end-to-end with per-rule attribution:
    // (1) line split (10-word pseudo-lines; the fixture has no
    // newlines, so line structure and the terminal-punctuation signal
    // are synthesized from each line's md5 — the piiSynthSql
    // discipline: both engines derive identical structure), (2) line
    // RULES — the punctuation arm (~25% drop) and the ≥5-word rule
    // (the genuinely-short last line), (3) page rule — the brace/
    // lorem-ipsum arm off the doc hash (1/16 of pages), (4) C4's
    // distinctive GLOBAL dedup at THREE-LINE-SPAN grain: any 3
    // consecutive surviving lines whose concatenation repeats
    // anywhere in the corpus keeps its first occurrence only
    // (doc_id, position order), later occurrences excised line-wise,
    // (5) the ≥3-surviving-lines page gate, (6) reassembly with the
    // content pinned by md5. Scale: line explode is a scan-side
    // generator; the ONLY global exchange is the span-hash window
    // (WindowGroupLimit-friendly rn=1 shape); removal is a keyed
    // left-anti self-join on (doc, position); everything else is
    // doc-keyed. Output: the per-doc funnel — the cleaning-ops
    // artifact C4's §2.2 describes in prose.
    "q_c4_clean" -> ((s, dir) => c4CleanOn(Tables(s, dir, "documents"))),

    "q_pii_scrub" -> ((s, dir) => {
      val masked = piiMaskExpr("pii")
      Tables(s, dir, "documents")
        .withColumn("h", md5(col("text")))
        .withColumn("pii", expr(piiSynthSql))
        .select(col("doc_id"),
          expr(s"cast(size(regexp_extract_all(pii, '$piiEmailRe', 0)) as int)")
            .as("n_email"),
          expr(s"cast(size(regexp_extract_all(pii, '$piiPhoneRe', 0)) as int)")
            .as("n_phone"),
          expr(s"cast(size(regexp_extract_all(pii, '$piiIpRe', 0)) as int)")
            .as("n_ip"),
          expr(s"md5($masked)").as("masked_md5"))
        .orderBy("doc_id")
    }),

    // T5/UL2-style SPAN-CORRUPTION mask manifest (Raffel et al. 2020,
    // §3.1.4 denoising objective): every token draws a deterministic
    // ~15% mask decision from the hash of its (doc, position), and
    // adjacent masked tokens coalesce into SPANS — the per-doc
    // manifest a denoising data loader consumes (how many sentinel
    // spans, how much of the budget is masked, mean span length).
    // Mask decisions depend only on (doc_id, pos), and a span start
    // only on (mask[i], mask[i−1]) — so the WHOLE op is higher-order
    // array functions inside the scan projection (the gopher-gate
    // shape): ZERO exchanges except the output sort. The first cut
    // exploded positions through a doc-keyed window — correct, but it
    // shuffled the entire token stream; at 100 TB that exchange IS
    // the cost, and nothing here needs cross-row context. The
    // window-based form survives as the DuckDB twin, so the gate
    // cross-checks two independent span constructions. The
    // hash-to-rate trick is the feature_hash/DSIR hex-prefix idiom.
    "q_span_corruption" -> ((s, dir) => {
      val maskBit = spanMaskBit
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          expr("size(filter(split(text, ' '), x -> x <> ''))").as("n"))
        .filter(col("n") > 0)
        .withColumn("mask", expr(s"transform(sequence(0, n - 1), i -> $maskBit)"))
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          expr("cast(size(filter(mask, x -> x)) as long)").as("n_masked"),
          // Span starts: position 1 counted on its own, positions 2..n
          // by a mask[i] AND NOT mask[i-1] scan that can never form an
          // index-0 access (sequence(2, 1) is DESCENDING, not empty —
          // hence the n >= 2 guard). try_element_at is no help here:
          // Spark rejects index 0 even in the try_ variant.
          expr("cast((case when element_at(mask, 1) then 1 else 0 end) + " +
            "(case when n >= 2 then size(filter(sequence(2, n), " +
            "i -> element_at(mask, i) AND NOT element_at(mask, i - 1))) " +
            "else 0 end) as long)")
            .as("n_spans"))
        .withColumn("mask_ratio", round(col("n_masked").cast("double") /
          col("n_tokens").cast("double"), 4))
        .withColumn("avg_span_len", when(col("n_spans") > 0,
          round(col("n_masked").cast("double") /
            col("n_spans").cast("double"), 4)).otherwise(0.0))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition filters (Rae et al. 2021, the "repetition
    // removal" table) at DOC grain: top-word fraction and duplicate
    // 2-/3-gram fractions, each an exact integer ratio rounded once,
    // plus the keep/drop verdict at the paper's 0.2 thresholds. Unlike
    // q_ngram_diversity (per SOURCE, an aggregate), this is the
    // per-document gate a cleaning pipeline applies row-by-row — so it
    // is computed row-by-row: higher-order array functions inside the
    // scan projection, ZERO exchanges except the output sort. At
    // 100 TB the filter costs one codegen'd pass over each doc.
    "q_gopher_repetition" -> ((s, dir) =>
      gopherFlags(Tables(s, dir, "documents")).orderBy("doc_id")),

    // The corpus CLEANING REPORT — the one-glance composite over the
    // r12 gates (the q_dataset_card shape, cleaning edition): PII
    // incidence, Gopher drop rate, span-corruption mask budget, and
    // canonical-URL duplication, long-form (metric, value). Each
    // metric is its own scan-shaped 1-row aggregate riding a
    // broadcast cross join (the dataset_card idiom) — no shuffles
    // except the count-distinct; every ratio rounds once over exact
    // integer counts.
    "q_cleaning_report" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val base = docs.agg(count(lit(1)).as("n_docs"))
      def hits(re: String) = s"size(regexp_extract_all(pii, '$re', 0)) > 0"
      val pii = docs.withColumn("h", md5(col("text")))
        .withColumn("pii", expr(piiSynthSql))
        .agg(sum(when(expr(s"${hits(piiEmailRe)} OR ${hits(piiPhoneRe)} " +
          s"OR ${hits(piiIpRe)}"), 1L).otherwise(0L)).as("n_pii_docs"))
      val gop = gopherFlags(docs)
        .agg(count(lit(1)).as("n_scored"),
          sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"))
      val mask = docs
        .select(col("doc_id"),
          expr("size(filter(split(text, ' '), x -> x <> ''))").as("n"))
        .filter(col("n") > 0)
        .select(col("n"), expr("cast(size(filter(sequence(0, n - 1), " +
          s"i -> $spanMaskBit)) as long)").as("masked"))
        .agg(sum(col("n").cast("long")).as("n_tokens"),
          sum(col("masked")).as("n_masked"))
      val url = graft.llm.Dedup.canonicalizeUrl(docs
          .withColumn("h", md5(col("text")))
          .withColumn("url", expr(graft.llm.Dedup.urlSynthSql)))
        .agg(count(lit(1)).as("n_u"),
          countDistinct(col("canon")).as("n_canon"))
      base.crossJoin(broadcast(pii)).crossJoin(broadcast(gop))
        .crossJoin(broadcast(mask)).crossJoin(broadcast(url))
        .select(explode(array(
          struct(lit("n_docs").as("metric"),
            col("n_docs").cast("double").as("value")),
          struct(lit("pii_doc_frac").as("metric"),
            round(col("n_pii_docs").cast("double") /
              col("n_docs").cast("double"), 4).as("value")),
          struct(lit("gopher_drop_frac").as("metric"),
            round(col("n_dropped").cast("double") /
              col("n_scored").cast("double"), 4).as("value")),
          struct(lit("span_mask_ratio").as("metric"),
            round(col("n_masked").cast("double") /
              col("n_tokens").cast("double"), 4).as("value")),
          struct(lit("url_dup_frac").as("metric"),
            round((col("n_u") - col("n_canon")).cast("double") /
              col("n_u").cast("double"), 4).as("value")))).as("m"))
        .select(col("m.metric"), col("m.value"))
        .orderBy("metric")
    }),

    "q_feature_hash" -> ((s, dir) => {
      def hx(prefix: String) =
        s"cast(conv(substring(md5(concat('$prefix', w)), 1, 8), 16, 10) as bigint)"
      val toks = Tables(s, dir, "documents")
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .withColumn("dim", expr(s"${hx("fh:")} % 16"))
        .withColumn("sgn", expr(s"CASE WHEN ${hx("sg:")} % 2 = 0 THEN 1L ELSE -1L END"))
      val dims = (0 until 16).map(d =>
        sum(when(col("dim") === d, col("sgn")).otherwise(0L)).as(s"f$d"))
      toks.groupBy(col("doc_id"))
        .agg(dims.head, dims.tail: _*)
        .orderBy("doc_id")
    }),

    // Zipf-law slope of the corpus frequency curve: OLS over
    // (ln rank, ln count) for the top-100 words — the one-number
    // distributional fingerprint a corpus datasheet reports (natural
    // text sits near −1; templated/synthetic text drifts). ln runs on
    // identical exact integers in both engines, each product rounds to
    // 6 dp into DECIMAL(38,6), and the closed form divides once
    // (q_linreg discipline).
    "q_zipf_slope" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val freq = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("c").desc, col("w").asc)))
        .filter(col("rnk") <= 100)
      val terms = freq.select(
        expr("cast(round(ln(cast(rnk as double)), 6) as decimal(38,6))").as("x"),
        expr("cast(round(ln(cast(c as double)), 6) as decimal(38,6))").as("y"))
        .select(col("x"), col("y"),
          expr("cast(round(cast(x as double) * cast(x as double), 6) as decimal(38,6))").as("xx"),
          expr("cast(round(cast(x as double) * cast(y as double), 6) as decimal(38,6))").as("xy"))
      terms.agg(count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("xx")).cast("double").as("sxx"),
          sum(col("xy")).cast("double").as("sxy"))
        .select(col("n"),
          Num.r((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("slope"))
    }),

    // The corpus DATASHEET composite — the one-glance report a dataset
    // card carries (Gebru et al.'s datasheets shape, the numeric
    // rows): volume, vocabulary, duplication, and length mix, emitted
    // LONG-FORM (metric, value) so a 400-metric report is rows, not
    // columns. Exact integers where possible; ratios round once.
    "q_dataset_card" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        expr("size(filter(split(text, ' '), x -> x <> ''))").as("len"))
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"))
      val tok = toks.agg(sum(col("len")).as("n_tokens"),
        sum(when(col("len") < 32, 1L).otherwise(0L)).as("n_short"))
      val voc = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .agg(countDistinct(col("w")).as("vocab"))
      base.crossJoin(tok).crossJoin(voc).select(explode(array(
        struct(lit("n_docs").as("metric"),
          col("n_docs").cast("double").as("value")),
        struct(lit("n_sources").as("metric"),
          col("n_sources").cast("double").as("value")),
        struct(lit("n_tokens").as("metric"),
          col("n_tokens").cast("double").as("value")),
        struct(lit("vocab_size").as("metric"),
          col("vocab").cast("double").as("value")),
        struct(lit("avg_doc_tokens").as("metric"),
          round(col("n_tokens").cast("double") / col("n_docs"), 4).as("value")),
        struct(lit("dup_doc_pct").as("metric"),
          round((col("n_docs") - col("n_distinct_texts")).cast("double") /
            col("n_docs"), 4).as("value")),
        struct(lit("short_doc_pct").as("metric"),
          round(col("n_short").cast("double") / col("n_docs"), 4).as("value"))
      )).as("m")).select(col("m.metric"), col("m.value"))
        .orderBy("metric")
    }),

    // Self-join size (second frequency moment F₂ = Σ c(w)²) estimated
    // from the SAME Count-Min sketch — the classic sketch application
    // an optimizer uses to price a join without touching the data
    // (Alon-Matias-Szegedy lineage): the inner product of a CMS row
    // with itself over-estimates F₂ by exactly the collision mass, and
    // min over the 4 rows is the estimate. Everything is BIGINT; the
    // one double is the reported overshoot fraction. At 100 TB the
    // sketch is the constant 8 KB artifact a stats service stores per
    // column — this query prices its accuracy against exact truth.
    "q_join_size_cms" -> ((s, dir) => {
      GraftFunctions.register(s)
      val toks = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      // width 16 (vs the monitoring sketch's 256) so the fixture
      // vocabulary genuinely collides and the overshoot is non-zero —
      // the accuracy-vs-width trade is the point of the row
      val sketch = toks.agg(expr("cms_sketch(w, 4, 16)").as("sk"))
      val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("f2_exact"))
      val rowF2 = (0 to 3).map(d => expr(
        s"aggregate(slice(sk, $d * 16 + 1, 16), 0L, (a, x) -> a + x * x)"))
      sketch.crossJoin(broadcast(exact))
        .select(col("f2_exact"), least(rowF2: _*).as("f2_est"))
        .withColumn("over_pct", Num.r(
          (col("f2_est") - col("f2_exact")).cast("double") /
            col("f2_exact").cast("double")))
    }),

    // TextRank (Mihalcea & Tarau 2004): PageRank over the undirected
    // word co-occurrence (bigram) graph — keyword extraction as graph
    // centrality. All arithmetic is FIXED-POINT INTEGER (ranks scaled
    // ×10¹², damping via `(85 * x) div 100`, contributions via
    // `r div degree`) so five iterations are bit-identical in both
    // engines — no FP accumulation order to disagree on. The five
    // rounds are UNROLLED into one lazy plan: the graph is
    // vocabulary-sized (sublinear in corpus), so plan depth is the
    // only cost; for corpus-scale graphs switch to the checkpointed
    // loop pattern ([[graft.llm.Dedup.keepers]]) — same per-iteration
    // shape: one equi join rank⋈edges + one hash aggregate on dst.
    //
    // OVERFLOW BOUND for `85 * cs`: cs is one node's incoming rank
    // mass, bounded by the TOTAL mass ~= V * 10^12 (each rank starts
    // at 10^12 and damping keeps the sum ~constant). int64 holds
    // 85 * cs only while cs < 2^63/85 ~= 1.08e17, i.e. V below ~10^5
    // vocabulary words even if a single hub absorbed ALL mass (real
    // hubs hold a small share, so the practical envelope is far
    // larger). Past that, Spark wraps silently (non-ANSI) while
    // DuckDB errors — the twins diverge. Beyond V ~ 10^5: cast ranks
    // to DECIMAL(38,0) in both engines (Clustering.scala's rule), or
    // divide first (`(cs div 100) * 85`, which costs exactness).
    "q_textrank" -> ((s, dir) => {
      val bi = Tables(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2), " +
            "i -> struct(t[i] as w1, t[i+1] as w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "" && col("w1") =!= col("w2"))
        .distinct()
      val edges = bi.union(bi.select(col("w2"), col("w1"))).distinct()
      val deg = edges.groupBy(col("w1")).agg(count(lit(1)).as("d"))
      var ranks = edges.select(col("w1").as("w")).distinct()
        .withColumn("r", lit(1000000000000L))
      for (_ <- 1 to 5) {
        ranks = edges
          .join(ranks, col("w1") === col("w"))
          .join(deg, "w1")
          .select(col("w2").as("dst"), expr("r div d").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("w"),
            (lit(150000000000L) + expr("(85 * cs) div 100")).as("r"))
      }
      ranks.select(col("w"), col("r").as("rank")).orderBy("w")
    }))

  /** ONE tokenize+aggregate pass: the result is unique per (doc, word),
    * so df is a count over it (no second explode of the corpus) and tf
    * is its sampled-doc slice. */
  /** The BM25 scoring pipeline through the per-(query, doc) exact
    * decimal sum — shared by q_bm25 (top-3 report) and q_rrf_fusion
    * (top-10 lexical leg). See q_bm25's comment for the plan shape. */
  private def bm25Scored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tfAll = termFreqs(s, dir)
    val dl = tfAll.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tfAll.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tok_total"))
    val qw = Window.partitionBy(col("query_id")).orderBy(col("word"))
    val qterms = tfAll
      .filter(col("doc_id") % 61 === 0 && length(col("word")) >= 4)
      .select(col("doc_id").as("query_id"), col("word"))
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= 3).drop("rn")
    val qd = qterms.join(df.hint("shuffle_hash"), "word")
    // dl is CORPUS-sized (one row per doc) — unlike the vocab-sized
    // df build above, hinting it as an SHJ build side would hold
    // N/P doc rows per partition hash map at 100 TB; unhinted, the
    // doc-keyed attach stays a sort-merge join between two streams
    // (AQE may still downgrade to a local join at small SF).
    val postings = tfAll.join(broadcast(qd), "word")
      .filter(col("doc_id") =!= col("query_id"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    postings
      .withColumn("idf", round(log(
        ((col("n_docs") - col("df")).cast("double") + 0.5) /
          (col("df").cast("double") + 0.5) + 1.0), 6))
      .withColumn("tfn", col("tf").cast("double") * 2.2 /
        (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
          lit(0.75) * col("dl").cast("double") *
            col("n_docs").cast("double") / col("tok_total").cast("double"))))
      .withColumn("term_score",
        expr("cast(round(idf * tfn, 6) as decimal(38,6))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_terms"),
        sum(col("term_score")).as("s6"))
  }

  /** The (doc_id, word, tf) term-frequency table — the base every
    * lexical index derives from (BM25 postings, df, tf-idf, the
    * MaxSim query panel). r17: a PERSISTED IndexStore artifact, like
    * every other trained/derived index — a search deployment builds
    * its inverted index once per corpus snapshot and serves from the
    * stored form; consumers here read ONE flat parquet scan instead
    * of re-running tokenize+aggregate per query. Exact integer
    * contents, so every consumer is hash-identical to its
    * build-it-yourself form (the q_index_persist census row gates
    * the artifact itself). */
  private[graft] def termFreqsArtifact(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.llm.IndexStore.durableFrame(s, dir, "term_freqs") {
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
    }

  private def termFreqs(s: org.apache.spark.sql.SparkSession, dir: String) =
    termFreqsArtifact(s, dir)

  /** 8-dim integer dot product between two tokens' md5 hex strings
    * (columns `a`, `b`): dimension i is hex byte i recentred to
    * [−128, 127] — a deterministic hash embedding standing in for a
    * learned per-token encoder (none ships in this sandbox), exact in
    * both engines via the shared ascii/substr/CASE dialect (the
    * q_multimodal_sniff idiom), so MaxSim scores are hash-gated
    * integers. */
  private def tokDot(a: String, b: String): String = {
    def hv(v: String, pos: Int) =
      s"(ascii(substr($v, $pos, 1)) - (CASE WHEN substr($v, $pos, 1) >= 'a' THEN 87 ELSE 48 END))"
    def byte(v: String, i: Int) =
      s"(${hv(v, 2 * i + 1)} * 16 + ${hv(v, 2 * i + 2)})"
    (0 until 8).map(i =>
      s"cast(${byte(a, i)} - 128 as bigint) * cast(${byte(b, i)} - 128 as bigint)")
      .mkString(" + ")
  }

  /** LATE-INTERACTION retrieval scores (Khattab & Zaharia 2020,
    * ColBERT's MaxSim): score(q, d) = Σ over the query's token
    * vectors of the MAX dot product against any of the doc's token
    * vectors — the fourth retrieval paradigm beside BM25 (one score
    * per matching term), dense single-vector cosine, and RRF. Token
    * vectors are the [[tokDot]] hash embeddings; the query panel is
    * the SAME data-derived %61 term set as BM25, so the quality row
    * can fuse the two legs. Scale shape: the per-doc token set stays
    * IN-ROW (array_distinct over the tokenize split — never a token
    * explode), the ≤ 3·|panel|-row query-token table broadcasts, and
    * each (doc, query-token) row computes its max via one in-row
    * `aggregate` fold — so the corpus is scanned ONCE, nothing
    * corpus-sized shuffles, and the only exchange is the partial-
    * aggregated (query, doc) sum (≤ |panel|·|docs| rows). */
  /** The 8-dim centered-byte token embedding as a PRECOMPUTED
    * array<bigint> — exactly the values [[tokDot]] folds, but
    * extracted from the md5 hex ONCE per token instead of inside the
    * per-(doc, query-token) MaxSim lambda. Higher-order lambdas are
    * INTERPRETED in Spark, so the old in-lambda form paid ~32 string
    * ops × |doc tokens| × |panel tokens| per doc — measured 368 s at
    * sf0.1 (the whole bench's top line); with the embeddings
    * materialized scan-side the hot fold is one native `dot_long`
    * per element. `h` is any SQL expression yielding an md5 hex. */
  private def tokEmb(h: String): String =
    s"transform(sequence(0, 7), i -> cast(" +
      s"(ascii(substr($h, 2*i+1, 1)) - (CASE WHEN substr($h, 2*i+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 + " +
      s"(ascii(substr($h, 2*i+2, 1)) - (CASE WHEN substr($h, 2*i+2, 1) >= 'a' THEN 87 ELSE 48 END)) - 128 as bigint))"

  /** The bounded MaxSim query panel (≤ 50 queries at ANY corpus size,
    * like every other recall panel in the repo — a %-of-corpus panel
    * made the pair grid quadratic in N): the 3 alphabetically-first
    * length-≥4 terms of each %61 panel doc, each as its precomputed
    * [[tokEmb]] token embedding. */
  private def maxsimQTerms(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qw = Window.partitionBy(col("query_id")).orderBy(col("word"))
    termFreqs(s, dir)
      .filter(col("doc_id") % 61 === 0 && col("doc_id") < 3050 &&
        length(col("word")) >= 4)
      .select(col("doc_id").as("query_id"), col("word"))
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= 3)
      .select(col("query_id"), expr(tokEmb("md5(word)")).as("qe"))
  }

  /** Per-doc distinct-token embedding sets, materialized SCAN-SIDE
    * (the r14 lesson: the fold body must be one native call over
    * pre-extracted arrays, never per-element string ops). */
  private def maxsimDocEmb(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), expr(
        "transform(transform(array_distinct(filter(split(text, ' '), " +
          s"x -> x <> '')), x -> md5(x)), h -> ${tokEmb("h")})").as("es"))
      .filter(size(col("es")) >= 1)

  /** The MaxSim aggregate over (query_id, doc_id, qe, es) pair rows:
    * per-pair max dot via one native `dot_long` fold, then the
    * per-(query, doc) score sum. */
  private def maxsimAgg(
      pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    pairs
      .withColumn("ms", expr(
        "aggregate(es, cast(-1000000000 as bigint), " +
          "(acc, e) -> greatest(acc, dot_long(e, qe)))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_qtok"), sum(col("ms")).as("score"))

  /** The exhaustive scored frame is a STANDING EVAL ARTIFACT — the
    * truth table q_maxsim, q_maxsim_recall, q_rrf_fusion's dense leg,
    * and q_maxsim_twostage_agree all rank against. On a cluster it is
    * a persisted table built once per corpus snapshot; here it
    * memoizes through the graph family's standing-index cache
    * (per-(session, dir), explicit release) as a localCheckpoint of
    * the bounded (≤ panel·|docs| rows, 4 columns) score table —
    * contents are deterministic exact integers, so every consumer
    * stays hash-identical to its build-it-itself form at any dop. */
  /** The lazy build tree, exposed so PlanSpec can pin the BUILD shape
    * (panel broadcast onto one corpus scan, never a corpus shuffle)
    * independently of the memoized artifact the consumers read. */
  private[graft] def maxsimScoredBuild(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    GraftFunctions.register(s)
    maxsimAgg(maxsimDocEmb(s, dir)
      .crossJoin(broadcast(maxsimQTerms(s, dir)))
      .filter(col("doc_id") =!= col("query_id")))
  }

  /** The persisted exhaustive-MaxSim artifact, exposed for
    * q_index_persist's census row. */
  private[graft] def maxsimScoredArtifact(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = maxsimScored(s, dir)

  private def maxsimScored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // r16: the standing eval artifact is DISK-durable (IndexStore —
    // the FAISS write_index lifecycle): built once per corpus
    // snapshot, loaded by every later session/process; the in-session
    // memo on top keeps one process from re-opening the parquet per
    // consumer. Contents are exact integers, so every consumer stays
    // hash-identical to its build-it-itself form at any dop.
    graft.llm.Similarity.standing(s, dir, "maxsim_scored") {
      graft.llm.IndexStore.durableFrame(s, dir, "maxsim_scored") {
        maxsimScoredBuild(s, dir)
      }
    }

  /** TWO-STAGE late-interaction retrieval (Santhanam et al. 2022,
    * ColBERTv2/PLAID; the production shape): a cheap trained-IVF ANN
    * stage shortlists `cand` candidates per query (nprobe = 2 over the
    * dense single-vector index — the q_knn_ivf plan), then MaxSim
    * scores ONLY the shortlist. The rerank join is keyed — candidates
    * × query-terms (≤ 3·cand·|panel| rows) broadcast onto the doc-
    * embedding scan — so unlike [[maxsimScored]]'s exhaustive grid
    * NOTHING corpus×panel ever materializes: at 100 TB the first
    * stage's cell join bounds all downstream work. Top-3 per query on
    * the exact integer MaxSim score, doc_id tiebreak. */
  private def maxsimTwoStage(s: org.apache.spark.sql.SparkSession,
      dir: String, cand: Int): org.apache.spark.sql.DataFrame = {
    GraftFunctions.register(s)
    val cands = graft.llm.Similarity.ivfCandidatesWhere(s, dir,
        col("vec_id") % 61 === 0 && col("vec_id") < 3050,
        k = cand, nprobe = 2)
      .select(col("query_id"), col("neighbor_id").as("doc_id"))
    maxsimAgg(maxsimDocEmb(s, dir).join(
      broadcast(cands.join(maxsimQTerms(s, dir), "query_id")), "doc_id"))
  }

  /** The tf-idf operator tree over a term-frequency table (lazy). */
  private def tfidfTree(s: org.apache.spark.sql.SparkSession, dir: String,
      tfAll: org.apache.spark.sql.DataFrame) = {
    val docs = Tables(s, dir, "documents")
    val tf = tfAll.filter(col("doc_id") % 20 === 0)
    val df = tfAll.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // df is the full vocabulary — its size estimate sits below the
    // tokenize explode (fan-out invisible to Catalyst), so force the
    // shuffle shape and let AQE re-broadcast from runtime sizes;
    // a stale-estimate broadcast of a 100M-word vocab is a 100 TB
    // failure (same rule as Joins.rangePairs / llm.Dedup). The hint
    // sits on df — the hinted side becomes the SHJ BUILD side, and
    // the vocabulary (sublinear in corpus size) is the side whose
    // per-partition hash map stays bounded, not the token stream.
    tf.join(df.hint("shuffle_hash"), "word")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        Num.r(col("tf") * log(col("n_docs").cast("double") /
          col("df").cast("double"))).as("tfidf"))
      .orderBy("doc_id", "word")
  }

  /** Shared DuckDB CTE prefix for the BM25 family (`q_bm25`, `q_rrf_fusion`).
    * Ends at the `ag` CTE: (query_id, doc_id, n_terms, s6) — per-(query, doc)
    * exact-decimal BM25 scores over the data-derived query panel
    * (doc_id % 61 = 0, 3 longest-sorted terms of length >= 4 per query).
    * Callers append their own ranking tail with `bm25Ctes + ", rk AS (...)"`.
    */
  private[graft] val bm25Ctes: String = """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM toks
             WHERE word <> '' GROUP BY 1, 2),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      st AS (SELECT count(*) AS n_docs, sum(dl) AS tok_total FROM dl),
      qt AS (SELECT query_id, word FROM (
               SELECT doc_id AS query_id, word,
                      row_number() OVER (PARTITION BY doc_id ORDER BY word) AS rn
               FROM tf WHERE doc_id % 61 = 0 AND length(word) >= 4) q
             WHERE rn <= 3),
      pt AS (SELECT q.query_id, t.doc_id, t.tf, d.df, l.dl, s.n_docs, s.tok_total
             FROM qt q JOIN tf t ON q.word = t.word
             JOIN df d ON q.word = d.word
             JOIN dl l ON t.doc_id = l.doc_id CROSS JOIN st s
             WHERE t.doc_id <> q.query_id),
      ts AS (SELECT query_id, doc_id, CAST(round(
               round(ln((CAST(n_docs - df AS DOUBLE) + 0.5) /
                        (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) *
               (CAST(tf AS DOUBLE) * 2.2 / (CAST(tf AS DOUBLE) + 1.2 *
                 (0.25 + 0.75 * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) /
                   CAST(tok_total AS DOUBLE)))), 6) AS DECIMAL(38,6)) AS term_score
             FROM pt),
      ag AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_terms,
                    sum(term_score) AS s6
             FROM ts GROUP BY 1, 2)"""

  /** MaxSim twin tail over [[bm25Ctes]]'s `toks`/`qt`: per-doc
    * distinct-token md5 lists, the hashed query-term panel, the
    * in-list MaxSim fold ([[tokDot]] shared VERBATIM with the Spark
    * lambda), and the (query, doc) score aggregate `mag`. */
  private lazy val maxsimEmbCtes: String = """,
      mh AS (SELECT doc_id, list(DISTINCT md5(word)) AS hs
             FROM toks WHERE word <> '' GROUP BY doc_id),
      mqt AS (SELECT query_id, md5(word) AS qh FROM qt
              WHERE query_id < 3050)"""

  private[graft] lazy val maxsimTail: String = maxsimEmbCtes + s""",
      mps AS (SELECT q.query_id, d.doc_id,
                list_max(list_transform(d.hs, h -> ${tokDot("h", "q.qh")})) AS ms
              FROM mh d CROSS JOIN mqt q WHERE d.doc_id <> q.query_id),
      mag AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_qtok,
                CAST(sum(ms) AS BIGINT) AS score
              FROM mps GROUP BY 1, 2)"""

  /** Rerank tail of the two-stage twin: MaxSim over ONLY the `cand`
    * pairs ([[graft.llm.Similarity.ivfCandCtes]]); expects `mh`/`mqt`
    * ([[maxsimEmbCtes]]) in scope. */
  private lazy val maxsimRerankCtes: String = s""",
      rps AS (SELECT c.query_id, c.doc_id,
                list_max(list_transform(d.hs, h -> ${tokDot("h", "q.qh")})) AS ms
              FROM cand c JOIN mqt q ON c.query_id = q.query_id
                   JOIN mh d ON c.doc_id = d.doc_id),
      rag AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_qtok,
                CAST(sum(ms) AS BIGINT) AS score
              FROM rps GROUP BY 1, 2),
      rrk AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS INT) AS rank
              FROM rag)"""

  val oracles: Map[String, String] = Map(
    "q_maxsim" -> (bm25Ctes + maxsimTail + """,
      mrk AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS INT) AS rank
              FROM mag)
      SELECT query_id, rank, doc_id, n_qtok, score FROM mrk WHERE rank <= 3
      ORDER BY query_id, rank"""),
    "q_maxsim_twostage" -> (bm25Ctes + "," + graft.llm.Dedup.QE + "," +
      graft.llm.Similarity.ivfCandCtes(20) + maxsimEmbCtes +
      maxsimRerankCtes + """
      SELECT query_id, rank, doc_id, n_qtok, score FROM rrk WHERE rank <= 3
      ORDER BY query_id, rank"""),
    "q_maxsim_twostage_agree" -> (bm25Ctes + "," + graft.llm.Dedup.QE + "," +
      graft.llm.Similarity.ivfCandCtes(20) + maxsimTail +
      maxsimRerankCtes + """,
      ts3 AS (SELECT query_id, doc_id FROM rrk WHERE rank <= 3),
      exrk AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rank
               FROM mag),
      ex3 AS (SELECT query_id, doc_id FROM exrk WHERE rank <= 3),
      qs AS (SELECT DISTINCT query_id FROM ts3),
      sh AS (SELECT CAST(sum(CASE WHEN coalesce(c.cnt, 0) < 3
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_short
             FROM qs LEFT JOIN (SELECT query_id, count(*) AS cnt
                                FROM ts3 GROUP BY 1) c USING (query_id))
      SELECT count(*) AS n_true, count(t.doc_id) AS n_found,
             CASE WHEN count(*) > 0 THEN
               CAST(round(CAST(count(t.doc_id) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE), 4) AS DOUBLE)
             ELSE NULL END AS overlap_at_3,
             (SELECT n_short FROM sh) AS n_short
      FROM ex3 e JOIN qs USING (query_id)
      LEFT JOIN ts3 t ON e.query_id = t.query_id AND e.doc_id = t.doc_id"""),
    "q_maxsim_recall" -> (bm25Ctes + "," + graft.llm.Dedup.QE +
      maxsimTail + s""",
      pan AS (SELECT vec_id, q, norm FROM qn
              WHERE vec_id % 61 = 0 AND vec_id < 3050),
      tp AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                a.q AS qa, b.q AS qb2, a.norm AS na, b.norm AS nb
             FROM pan a JOIN qn b ON a.vec_id <> b.vec_id),
      tcos AS (SELECT query_id, neighbor_id,
                 round(CAST(${graft.llm.Similarity.dot2} AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)), 4) AS cosine
               FROM tp),
      trk AS (SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
              FROM tcos),
      truth AS (SELECT query_id, neighbor_id FROM trk WHERE rnk <= 3),
      bq10 AS (SELECT query_id, doc_id, rank_a FROM (
                 SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY s6 DESC, doc_id) AS rank_a
                 FROM ag) WHERE rank_a <= 10),
      mx10 AS (SELECT query_id, doc_id, rank_b FROM (
                 SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rank_b
                 FROM mag) WHERE rank_b <= 10),
      fu2 AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
                     coalesce(a.doc_id, b.doc_id) AS doc_id,
                     CAST(coalesce(round(1.0 / (60 + a.rank_a), 6), 0.0)
                       AS DECIMAL(38,6)) +
                     CAST(coalesce(round(1.0 / (60 + b.rank_b), 6), 0.0)
                       AS DECIMAL(38,6)) AS rrf
              FROM bq10 a FULL OUTER JOIN mx10 b
                ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
      fr2 AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY rrf DESC, doc_id) AS rank
              FROM fu2),
      fused AS (SELECT query_id, doc_id FROM fr2 WHERE rank <= 3),
      bm3 AS (SELECT query_id, doc_id FROM bq10 WHERE rank_a <= 3),
      mx3 AS (SELECT query_id, doc_id FROM mx10 WHERE rank_b <= 3),
      m AS (
        SELECT 'bm25' AS system, count(*) AS n_true, count(a.doc_id) AS n_found
        FROM truth t LEFT JOIN bm3 a
          ON t.query_id = a.query_id AND t.neighbor_id = a.doc_id
        UNION ALL
        SELECT 'maxsim', count(*), count(a.doc_id)
        FROM truth t LEFT JOIN mx3 a
          ON t.query_id = a.query_id AND t.neighbor_id = a.doc_id
        UNION ALL
        SELECT 'rrf_fused', count(*), count(a.doc_id)
        FROM truth t LEFT JOIN fused a
          ON t.query_id = a.query_id AND t.neighbor_id = a.doc_id)
      SELECT system, n_true, n_found,
             CAST(round(CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE), 4) AS DOUBLE) AS recall_at_3
      FROM m ORDER BY system"""),
    "q_search" -> """
      SELECT p_name FROM part WHERE p_name LIKE '%wid%' ORDER BY p_name""",
    "q_wordcount" -> """
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word ORDER BY word""",
    "q_inverted_index" -> """
      SELECT word, count(*) AS df,
        string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      FROM (SELECT DISTINCT doc_id, word FROM
             (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents))
      WHERE word <> '' GROUP BY word ORDER BY word""",
    "q_tfidf" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents),
      t AS (SELECT doc_id, word, count(*) AS tf FROM toks
            WHERE word <> '' GROUP BY 1, 2),
      d AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks
            WHERE word <> '' GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, t.word AS word, tf, df,
        CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 4) AS DOUBLE) AS tfidf
      FROM t JOIN d ON t.word = d.word CROSS JOIN n
      WHERE doc_id % 20 = 0
      ORDER BY doc_id, word""",
    "q_bm25" -> (bm25Ctes + """,
      rk AS (SELECT query_id, doc_id, n_terms, s6,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY s6 DESC, doc_id) AS rank
             FROM ag)
      SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_terms,
             CAST(round(s6, 4) AS DOUBLE) AS score
      FROM rk WHERE rank <= 3
      ORDER BY query_id, rank"""),
    "q_rrf_fusion" -> (bm25Ctes + "," +
      graft.llm.Similarity.ivfIndexCtes + s""",
      ra AS (SELECT query_id, doc_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY s6 DESC, doc_id) AS rank_a
             FROM ag WHERE query_id < 3050 QUALIFY rank_a <= 10),
      pan AS (SELECT vec_id, q, norm, cell, cell2 FROM ivcell
              WHERE vec_id % 61 = 0 AND vec_id < 3050),
      kpr AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
                a.q AS qa, b.q AS qb2, a.norm AS na, b.norm AS nb
              FROM pan a JOIN ivcell b
                ON b.cell IN (a.cell, a.cell2) AND a.vec_id <> b.vec_id),
      kp AS (SELECT query_id, doc_id,
               round(CAST(${graft.llm.Similarity.dot2} AS DOUBLE) /
                 sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)), 4)
                 AS cosine
             FROM kpr),
      rb AS (SELECT query_id, doc_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, doc_id) AS rank_b
             FROM kp QUALIFY rank_b <= 10),
      fu AS (SELECT coalesce(ra.query_id, rb.query_id) AS query_id,
                    coalesce(ra.doc_id, rb.doc_id) AS doc_id,
                    rank_a, rank_b,
                    CAST(coalesce(round(1.0 / (60 + rank_a), 6), 0.0)
                      AS DECIMAL(38,6)) +
                    CAST(coalesce(round(1.0 / (60 + rank_b), 6), 0.0)
                      AS DECIMAL(38,6)) AS rrf
             FROM ra FULL OUTER JOIN rb
               ON ra.query_id = rb.query_id AND ra.doc_id = rb.doc_id),
      fr AS (SELECT query_id, doc_id, rank_a, rank_b, rrf,
                    CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY rrf DESC, doc_id) AS INT) AS rank
             FROM fu)
      SELECT query_id, rank, doc_id,
             CAST(rank_a IS NOT NULL AS INT) AS in_bm25,
             CAST(rank_b IS NOT NULL AS INT) AS in_knn,
             CAST(rrf AS DOUBLE) AS rrf
      FROM fr WHERE rank <= 3
      ORDER BY query_id, rank"""),
    "q_rrf_fusion_recall" -> (bm25Ctes + "," +
      graft.llm.Dedup.QE + "," + graft.llm.Similarity.qbCte + s""",
      pan AS (SELECT vec_id, q, norm, bucket FROM qb WHERE vec_id % 61 = 0),
      tp AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                a.q AS qa, b.q AS qb2, a.norm AS na, b.norm AS nb
             FROM pan a JOIN qn b ON a.vec_id <> b.vec_id),
      tcos AS (SELECT query_id, neighbor_id,
                 round(CAST(${graft.llm.Similarity.dot2} AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)), 4) AS cosine
               FROM tp),
      trk AS (SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
              FROM tcos),
      truth AS (SELECT query_id, neighbor_id FROM trk WHERE rnk <= 3),
      bq10 AS (SELECT query_id, doc_id, rank_a FROM (
                 SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY s6 DESC, doc_id) AS rank_a
                 FROM ag) WHERE rank_a <= 10),
      apr AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 a.q AS qa, b.q AS qb2, a.norm AS na, b.norm AS nb
              FROM pan a JOIN qb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      acos AS (SELECT query_id, neighbor_id,
                 round(CAST(${graft.llm.Similarity.dot2} AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)), 4) AS cosine
               FROM apr),
      ark AS (SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
              FROM acos),
      ann10 AS (SELECT query_id, neighbor_id, rnk FROM ark WHERE rnk <= 10),
      fu2 AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
                     coalesce(a.doc_id, b.neighbor_id) AS doc_id,
                     CAST(coalesce(round(1.0 / (60 + a.rank_a), 6), 0.0)
                       AS DECIMAL(38,6)) +
                     CAST(coalesce(round(1.0 / (60 + b.rnk), 6), 0.0)
                       AS DECIMAL(38,6)) AS rrf
              FROM bq10 a FULL OUTER JOIN ann10 b
                ON a.query_id = b.query_id AND a.doc_id = b.neighbor_id),
      fr2 AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY rrf DESC, doc_id) AS rank
              FROM fu2),
      fused AS (SELECT query_id, doc_id FROM fr2 WHERE rank <= 3),
      bm3 AS (SELECT query_id, doc_id FROM bq10 WHERE rank_a <= 3),
      ann3 AS (SELECT query_id, neighbor_id AS doc_id FROM ann10 WHERE rnk <= 3),
      m AS (
        SELECT 'bm25' AS system, count(*) AS n_true, count(a.doc_id) AS n_found
        FROM truth t LEFT JOIN bm3 a
          ON t.query_id = a.query_id AND t.neighbor_id = a.doc_id
        UNION ALL
        SELECT 'knn_ann', count(*), count(a.doc_id)
        FROM truth t LEFT JOIN ann3 a
          ON t.query_id = a.query_id AND t.neighbor_id = a.doc_id
        UNION ALL
        SELECT 'rrf_fused', count(*), count(a.doc_id)
        FROM truth t LEFT JOIN fused a
          ON t.query_id = a.query_id AND t.neighbor_id = a.doc_id)
      SELECT system, n_true, n_found,
             CAST(round(CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE), 4) AS DOUBLE) AS recall_at_3
      FROM m ORDER BY system"""),
    "q_ngram_diversity" -> """
      WITH t AS (SELECT source,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
                 FROM documents),
      g1 AS (SELECT source, unnest(t) AS g FROM t WHERE len(t) >= 1),
      g2 AS (SELECT source, t[i] || ' ' || t[i + 1] AS g
             FROM t, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) u(i)
             WHERE len(t) >= 2),
      g3 AS (SELECT source, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
             FROM t, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) u(i)
             WHERE len(t) >= 3),
      a AS (SELECT source, 1 AS n, count(*) AS total_ngrams,
                   count(DISTINCT g) AS n_distinct FROM g1 GROUP BY 1
            UNION ALL
            SELECT source, 2, count(*), count(DISTINCT g) FROM g2 GROUP BY 1
            UNION ALL
            SELECT source, 3, count(*), count(DISTINCT g) FROM g3 GROUP BY 1)
      SELECT source, CAST(n AS INT) AS n, total_ngrams, n_distinct,
             CAST(round(CAST(n_distinct AS DOUBLE) /
               CAST(total_ngrams AS DOUBLE), 4) AS DOUBLE) AS diversity
      FROM a ORDER BY source, n""",
    "q_length_buckets" -> """
      WITH d AS (SELECT len(list_filter(string_split(text, ' '),
                   x -> x <> '')) AS len FROM documents),
      b AS (SELECT CASE WHEN len <= 1 THEN CAST(1 AS BIGINT)
                 ELSE (CAST(1 AS BIGINT) << length(bin(CAST(len - 1 AS BIGINT))))
               END AS bucket, len
            FROM d WHERE len > 0),
      a AS (SELECT bucket, count(*) AS n_docs,
                   CAST(sum(len) AS BIGINT) AS sum_tokens
            FROM b GROUP BY 1)
      SELECT bucket, n_docs, sum_tokens,
             bucket * n_docs AS padded_tokens,
             CAST(round(CAST(bucket * n_docs - sum_tokens AS DOUBLE) /
               CAST(bucket * n_docs AS DOUBLE), 4) AS DOUBLE) AS pad_waste
      FROM a ORDER BY bucket""",
    "q_ngram_pmi" -> """
      WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      uni AS (SELECT w, count(*) AS c
              FROM (SELECT unnest(t) AS w FROM toks)
              WHERE w <> '' GROUP BY 1),
      bi AS (SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS c_xy
             FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
             WHERE t[i] <> '' AND t[i+1] <> '' GROUP BY 1, 2),
      nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
      nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bi FROM bi)
      SELECT w1, w2, c_xy,
        -- `+ 0.0` canonicalizes IEEE -0.0: DuckDB round() preserves the
        -- sign of a tiny-negative PMI (-0.00003 -> -0.0) while Spark's
        -- BigDecimal round yields +0.0; the driver hash-compares BITS,
        -- so the two zeros differ (r5's one red entry). x + 0.0 is +0.0
        -- for x = -0.0 and identity otherwise.
        CAST(round(ln((CAST(c_xy AS DOUBLE) / CAST(n_bi AS DOUBLE)) /
          ((CAST(u1.c AS DOUBLE) / CAST(n_uni AS DOUBLE)) *
           (CAST(u2.c AS DOUBLE) / CAST(n_uni AS DOUBLE)))), 4) + 0.0 AS DOUBLE) AS pmi
      FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w
      CROSS JOIN nu CROSS JOIN nb
      WHERE c_xy >= 5
      ORDER BY w1, w2""",
    "q_triangles" -> """
      WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      e0 AS (SELECT t[i] AS w1, t[i+1] AS w2
             FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
             WHERE t[i] <> '' AND t[i+1] <> '' AND t[i] <> t[i+1]),
      bi AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b FROM e0),
      deg AS (SELECT n, count(*) AS d FROM
                (SELECT a AS n FROM bi UNION ALL SELECT b AS n FROM bi)
              GROUP BY 1),
      wd AS (SELECT bi.a, bi.b, da.d AS da, db.d AS db
             FROM bi JOIN deg da ON bi.a = da.n JOIN deg db ON bi.b = db.n),
      o AS (SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS src,
                   CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS dst,
                   CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS ddst
            FROM wd),
      wg AS (SELECT o1.src, o1.dst AS x, o2.dst AS y
             FROM o o1 JOIN o o2 ON o1.src = o2.src
             WHERE o1.ddst < o2.ddst OR (o1.ddst = o2.ddst AND o1.dst < o2.dst)),
      tri AS (SELECT wg.src, wg.x, wg.y
              FROM wg JOIN o ON o.src = wg.x AND o.dst = wg.y),
      nodes AS (SELECT src AS w FROM tri UNION ALL
                SELECT x AS w FROM tri UNION ALL
                SELECT y AS w FROM tri)
      SELECT w, count(*) AS n_tri FROM nodes GROUP BY 1 ORDER BY w""",
    "q_cms_sketch" -> """
      WITH t AS (SELECT w FROM (SELECT unnest(string_split(text, ' ')) AS w
                                FROM documents) WHERE w <> ''),
      d AS (SELECT unnest(generate_series(0, 3)) AS d),
      cells AS (SELECT d.d * 256 +
                  (('0x' || substr(md5(d.d || ':' || t.w), 1, 8))::BIGINT % 256)
                    AS idx,
                  count(*) AS cnt
                FROM t CROSS JOIN d GROUP BY 1)
      SELECT idx, cnt FROM cells ORDER BY idx""",
    "q_cms_estimate" -> """
      WITH t AS (SELECT w FROM (SELECT unnest(string_split(text, ' ')) AS w
                                FROM documents) WHERE w <> ''),
      top AS (SELECT w, count(*) AS true_cnt FROM t GROUP BY 1
              ORDER BY true_cnt DESC, w ASC LIMIT 20),
      d AS (SELECT unnest(generate_series(0, 3)) AS d),
      cells AS (SELECT d.d AS d,
                  ('0x' || substr(md5(d.d || ':' || t.w), 1, 8))::BIGINT % 256
                    AS cell,
                  count(*) AS cnt
                FROM t CROSS JOIN d GROUP BY 1, 2)
      SELECT top.w, top.true_cnt, CAST(min(cells.cnt) AS BIGINT) AS est
      FROM top CROSS JOIN d
      JOIN cells ON cells.d = d.d AND cells.cell =
        ('0x' || substr(md5(d.d || ':' || top.w), 1, 8))::BIGINT % 256
      GROUP BY 1, 2
      ORDER BY true_cnt DESC, w ASC""",
    "q_span_corruption" -> """
      WITH t AS (SELECT doc_id,
                   len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
                 FROM documents),
      tok AS (SELECT doc_id, i - 1 AS pos
              FROM t, UNNEST(generate_series(1, n)) u(i)
              WHERE n > 0),
      mk AS (SELECT doc_id, pos,
               ('0x' || substr(md5(concat(doc_id, ':', pos)), 1, 4))::BIGINT
                 % 20 < 3 AS m
             FROM tok),
      sp AS (SELECT doc_id, pos, m,
               CASE WHEN m AND NOT coalesce(lag(m) OVER w, false)
                    THEN 1 ELSE 0 END AS new_span
             FROM mk
             WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      si AS (SELECT doc_id, m,
               sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_idx
             FROM sp),
      ag2 AS (SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
                count(DISTINCT CASE WHEN m THEN span_idx END) AS n_spans,
                CAST(round(CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE), 4) AS DOUBLE) AS mask_ratio
              FROM si GROUP BY 1)
      SELECT doc_id, n_tokens, n_masked, n_spans, mask_ratio,
             CAST(CASE WHEN n_spans > 0 THEN
               round(CAST(n_masked AS DOUBLE) / CAST(n_spans AS DOUBLE), 4)
               ELSE 0.0 END AS DOUBLE) AS avg_span_len
      FROM ag2 ORDER BY doc_id""",
    "q_cleaning_report" -> s"""
      WITH base AS (SELECT count(*) AS n_docs FROM documents),
      hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      pp AS (SELECT $piiSynthSql AS pii FROM hx),
      pc AS (SELECT CAST(sum(CASE WHEN
               len(regexp_extract_all(pii, '$piiEmailRe', 0)) > 0 OR
               len(regexp_extract_all(pii, '$piiPhoneRe', 0)) > 0 OR
               len(regexp_extract_all(pii, '$piiIpRe', 0)) > 0
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs FROM pp),
      gt AS (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
             FROM documents),
      gf AS (SELECT t FROM gt WHERE len(t) > 0),
      gg AS (SELECT t,
               CASE WHEN len(t) >= 2 THEN
                 list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1]) ELSE [] END AS g2,
               CASE WHEN len(t) >= 3 THEN
                 list_transform(generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) ELSE [] END AS g3
             FROM gf),
      gk AS (SELECT
               CAST(round(CAST(list_max(list_transform(list_distinct(t),
                 w -> len(list_filter(t, x -> x = w)))) AS DOUBLE) /
                 CAST(len(t) AS DOUBLE), 4) AS DOUBLE) <= 0.2
               AND CAST(CASE WHEN len(t) >= 3 THEN
                 round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) /
                   CAST(len(g2) AS DOUBLE), 4)
                 ELSE 0.0 END AS DOUBLE) <= 0.2
               AND CAST(CASE WHEN len(t) >= 4 THEN
                 round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) /
                   CAST(len(g3) AS DOUBLE), 4)
                 ELSE 0.0 END AS DOUBLE) <= 0.2 AS keep
             FROM gg),
      ga AS (SELECT count(*) AS n_scored,
               CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped FROM gk),
      mt AS (SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
             FROM documents),
      mm AS (SELECT n, len(list_filter(generate_series(0, n - 1),
               i -> ('0x' || substr(md5(doc_id || ':' || i), 1, 4))::BIGINT
                 % 20 < 3)) AS masked
             FROM mt WHERE n > 0),
      ma AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(sum(masked) AS BIGINT) AS n_masked FROM mm),
      u AS (SELECT doc_id, ${graft.llm.Dedup.urlSynthSql} AS url FROM hx),
      ${graft.llm.Dedup.urlCanonCtes()},
      ua AS (SELECT count(*) AS n_u, count(DISTINCT canon) AS n_canon FROM c),
      j AS (SELECT * FROM base, pc, ga, ma, ua)
      SELECT 'gopher_drop_frac' AS metric,
             CAST(round(CAST(n_dropped AS DOUBLE) / CAST(n_scored AS DOUBLE), 4)
               AS DOUBLE) AS value FROM j
      UNION ALL SELECT 'n_docs', CAST(n_docs AS DOUBLE) FROM j
      UNION ALL SELECT 'pii_doc_frac',
        CAST(round(CAST(n_pii_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
          AS DOUBLE) FROM j
      UNION ALL SELECT 'span_mask_ratio',
        CAST(round(CAST(n_masked AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
          AS DOUBLE) FROM j
      UNION ALL SELECT 'url_dup_frac',
        CAST(round(CAST(n_u - n_canon AS DOUBLE) / CAST(n_u AS DOUBLE), 4)
          AS DOUBLE) FROM j
      ORDER BY metric""",
    "q_gopher_repetition" -> ("WITH " + gopherCtes + """
      SELECT doc_id, n_tokens, top_word_frac, dup_2gram_frac, dup_3gram_frac,
             keep
      FROM gkp ORDER BY doc_id"""),
    "q_c4_clean" -> s"""
      WITH d0 AS (SELECT doc_id, md5(text) AS h,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
             FROM documents),
      d1 AS (SELECT doc_id, h, t,
               CAST(ceil(len(t) / 10.0) AS INT) AS n_lines,
               (${hd(24)} = 0) AS page_bad
             FROM d0),
      ln0 AS (SELECT doc_id, page_bad, n_lines, i AS lno,
                array_to_string(t[(i * 10) + 1 : (i + 1) * 10], ' ') AS ltext
              FROM d1, UNNEST(generate_series(0, n_lines - 1)) AS u(i)),
      ln1 AS (SELECT *, len(string_split(ltext, ' ')) AS nw,
                md5(ltext) AS lh
              FROM ln0),
      ln2 AS (SELECT *,
                ((ascii(substr(lh, 1, 1)) - (CASE WHEN substr(lh, 1, 1) >= 'a'
                    THEN 87 ELSE 48 END)) % 4 != 0 AND nw >= 5) AS rule_ok
              FROM ln1),
      sv AS (SELECT doc_id, ltext,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY lno)
                 AS INT) AS ridx
             FROM ln2 WHERE NOT page_bad AND rule_ok),
      sp AS (SELECT doc_id, ridx,
               md5(ltext || ' ' || l2 || ' ' || l3) AS sh
             FROM (SELECT doc_id, ridx, ltext,
                     lead(ltext, 1) OVER w AS l2, lead(ltext, 2) OVER w AS l3
                   FROM sv
                   WINDOW w AS (PARTITION BY doc_id ORDER BY ridx))
             WHERE l3 IS NOT NULL),
      dup AS (SELECT doc_id, ridx FROM (
                SELECT doc_id, ridx,
                  row_number() OVER (PARTITION BY sh
                                     ORDER BY doc_id, ridx) AS rn
                FROM sp) WHERE rn > 1),
      rm AS (SELECT DISTINCT doc_id, ridx + k AS ridx
             FROM dup, UNNEST(generate_series(0, 2)) AS g(k)),
      kp AS (SELECT sv.doc_id, sv.ridx, sv.ltext
             FROM sv LEFT JOIN rm
               ON sv.doc_id = rm.doc_id AND sv.ridx = rm.ridx
             WHERE rm.doc_id IS NULL),
      ka AS (SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(ltext, ' ' ORDER BY ridx)) AS ch
             FROM kp GROUP BY doc_id),
      rl AS (SELECT doc_id, max(n_lines) AS n_lines,
               max(CASE WHEN page_bad THEN 1 ELSE 0 END) AS pb,
               CAST(sum(CASE WHEN NOT page_bad AND NOT rule_ok
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_rule
             FROM ln2 GROUP BY doc_id)
      SELECT rl.doc_id, CAST(n_lines AS INT) AS n_lines, n_drop_rule,
             CAST(CASE WHEN pb = 1 THEN 0
               ELSE n_lines - n_drop_rule - coalesce(n_kept, 0) END
               AS BIGINT) AS n_drop_span,
             CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
             (pb = 0 AND coalesce(n_kept, 0) >= 3) AS page_kept,
             CASE WHEN pb = 0 AND coalesce(n_kept, 0) >= 3 THEN ch
                  ELSE md5('') END AS clean_hash
      FROM rl LEFT JOIN ka ON rl.doc_id = ka.doc_id
      ORDER BY rl.doc_id""",
    "q_pii_scrub" -> s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      p AS (SELECT doc_id, $piiSynthSql AS pii FROM hx),
      m AS (SELECT doc_id, pii,
              regexp_replace(regexp_replace(regexp_replace(pii,
                '$piiEmailRe', '<EMAIL>', 'g'),
                '$piiPhoneRe', '<PHONE>', 'g'),
                '$piiIpRe', '<IP>', 'g') AS masked
            FROM p)
      SELECT doc_id,
             CAST(len(regexp_extract_all(pii, '$piiEmailRe', 0)) AS INT) AS n_email,
             CAST(len(regexp_extract_all(pii, '$piiPhoneRe', 0)) AS INT) AS n_phone,
             CAST(len(regexp_extract_all(pii, '$piiIpRe', 0)) AS INT) AS n_ip,
             md5(masked) AS masked_md5
      FROM m ORDER BY doc_id""",
    "q_feature_hash" -> ("""
      WITH t AS (SELECT doc_id, w FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents WHERE doc_id % 20 = 0)
                 WHERE w <> ''),
      hv AS (SELECT doc_id,
               ('0x' || substr(md5('fh:' || w), 1, 8))::BIGINT % 16 AS dim,
               CASE WHEN ('0x' || substr(md5('sg:' || w), 1, 8))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
             FROM t)
      SELECT doc_id, """ +
      (0 until 16).map(d =>
        s"CAST(sum(CASE WHEN dim = $d THEN sgn ELSE 0 END) AS BIGINT) AS f$d")
        .mkString(",\n             ") + """
      FROM hv GROUP BY doc_id ORDER BY doc_id"""),
    "q_zipf_slope" -> """
      WITH f AS (SELECT w, count(*) AS c FROM (
                   SELECT unnest(string_split(text, ' ')) AS w FROM documents)
                 WHERE w <> '' GROUP BY 1),
      rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rnk
             FROM f QUALIFY rnk <= 100),
      tm AS (SELECT
               CAST(round(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(38,6)) AS x,
               CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(38,6)) AS y
             FROM rk),
      tm2 AS (SELECT x, y,
                CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 6)
                  AS DECIMAL(38,6)) AS xx,
                CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 6)
                  AS DECIMAL(38,6)) AS xy
              FROM tm),
      s AS (SELECT count(*) AS n,
              CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
              CAST(sum(xx) AS DOUBLE) AS sxx, CAST(sum(xy) AS DOUBLE) AS sxy
            FROM tm2)
      SELECT n, CAST(round((n * sxy - sx * sy) /
        (n * sxx - sx * sx), 4) AS DOUBLE) AS slope
      FROM s""",
    "q_dataset_card" -> """
      WITH toks AS (SELECT doc_id,
                      len(list_filter(string_split(text, ' '),
                        x -> x <> '')) AS len
                    FROM documents),
      base AS (SELECT count(*) AS n_docs,
                 count(DISTINCT source) AS n_sources,
                 count(DISTINCT md5(text)) AS n_distinct_texts
               FROM documents),
      tok AS (SELECT sum(len) AS n_tokens,
                sum(CASE WHEN len < 32 THEN 1 ELSE 0 END) AS n_short
              FROM toks),
      voc AS (SELECT count(DISTINCT w) AS vocab FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents)
              WHERE w <> '')
      SELECT metric, value FROM base CROSS JOIN tok CROSS JOIN voc,
      LATERAL (VALUES
        ('n_docs', CAST(n_docs AS DOUBLE)),
        ('n_sources', CAST(n_sources AS DOUBLE)),
        ('n_tokens', CAST(n_tokens AS DOUBLE)),
        ('vocab_size', CAST(vocab AS DOUBLE)),
        ('avg_doc_tokens',
          CAST(round(CAST(n_tokens AS DOUBLE) / n_docs, 4) AS DOUBLE)),
        ('dup_doc_pct',
          CAST(round(CAST(n_docs - n_distinct_texts AS DOUBLE) / n_docs, 4)
            AS DOUBLE)),
        ('short_doc_pct',
          CAST(round(CAST(n_short AS DOUBLE) / n_docs, 4) AS DOUBLE))
      ) AS v(metric, value)
      ORDER BY metric""",
    "q_join_size_cms" -> """
      WITH t AS (SELECT w FROM (SELECT unnest(string_split(text, ' ')) AS w
                                FROM documents) WHERE w <> ''),
      d AS (SELECT unnest(generate_series(0, 3)) AS d),
      cells AS (SELECT d.d AS d,
                  ('0x' || substr(md5(d.d || ':' || t.w), 1, 8))::BIGINT % 16
                    AS cell,
                  count(*) AS cnt
                FROM t CROSS JOIN d GROUP BY 1, 2),
      rowsum AS (SELECT d, sum(cnt * cnt) AS f2 FROM cells GROUP BY 1),
      est AS (SELECT CAST(min(f2) AS BIGINT) AS f2_est FROM rowsum),
      ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM
               (SELECT w, count(*) AS c FROM t GROUP BY 1))
      SELECT f2_exact, f2_est,
             CAST(round(CAST(f2_est - f2_exact AS DOUBLE) /
               CAST(f2_exact AS DOUBLE), 4) AS DOUBLE) AS over_pct
      FROM ex CROSS JOIN est""",
    "q_textrank" -> {
      // five unrolled fixed-point iterations (twin of the Spark loop)
      val iters = (1 to 5).map { i =>
        s""",
      r$i AS (SELECT e.w2 AS w,
                150000000000 + (85 * sum(p.r // d.d)) // 100 AS r
              FROM edges e JOIN r${i - 1} p ON e.w1 = p.w
                           JOIN deg d ON e.w1 = d.w1
              GROUP BY 1)"""
      }.mkString
      s"""
      WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      bi AS (SELECT DISTINCT t[i] AS w1, t[i+1] AS w2
             FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
             WHERE t[i] <> '' AND t[i+1] <> '' AND t[i] <> t[i+1]),
      edges AS (SELECT w1, w2 FROM bi UNION SELECT w2, w1 FROM bi),
      deg AS (SELECT w1, count(*) AS d FROM edges GROUP BY 1),
      r0 AS (SELECT DISTINCT w1 AS w, CAST(1000000000000 AS BIGINT) AS r
             FROM edges)$iters
      SELECT w, CAST(r AS BIGINT) AS rank FROM r5 ORDER BY w"""
    })
}
