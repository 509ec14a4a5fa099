package graft.streaming

import graft.{Num, Tables}
import graft.ops.Q
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state for [[Streams.sessionsWithState]] (epoch ms).
  * Top-level so the state encoder's generated code can construct it. */
case class OpenSession(start: Long, end: Long, n: Long)

/** Event-time windowing — batch analogs (oracle-checkable) plus the
  * Structured Streaming forms (north-star; the reference is batch-only,
  * SURVEY.md §2c "streaming" row).
  *
  * Each batch query below computes exactly what its streaming twin
  * emits after all data has arrived, so the driver's DuckDB oracle can
  * gate correctness; the streaming wrappers in [[Streams]] run the same
  * logical plan incrementally (exercised by StreamsSpec on a
  * MemoryStream — there is no oracle for incremental emission).
  *
  * Scale notes: tumbling/sliding aggregation is one hash-aggregate on
  * (window, key) — sliding fan-out (duration/slide rows per event) is
  * generated in the scan projection, never materialized to the driver;
  * sessionization is a per-user window sort (shuffle on user_id), the
  * same exchange the streaming `session_window` state store keys by.
  */
object Streams {

  // ---------- batch analogs (oracle-checked) ----------

  val queries: Map[String, Q] = Map(
    // Tumbling 1-day event-time windows per event type.
    "q_stream_tumbling" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Sliding 2-day windows every 1 day: each event lands in 2 windows.
    "q_stream_sliding" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Sessionization: per-user sessions split on >1h inactivity gaps
    // (lag + cumulative sum — the batch twin of session_window).
    "q_stream_session" -> ((s, dir) => {
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .filter(col("user_id") < 50)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTime))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 3600L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          Num.dsum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    }),

    // Batch twin of the stream-stream interval join
    // ([[purchaseClickJoin]]): each purchase matched to the same
    // user's clicks in the preceding 10 minutes. Equi join on user_id
    // + integer-µs band post-filter — per-key pair count bounded by
    // per-user event density (the streaming form bounds the same
    // thing with watermark state eviction).
    "q_stream_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          unix_micros(col("ts")).as("c_us"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
          col("event_id").as("purchase_id"))
      purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_us") >= col("p_us") - lit(600L * 1000000L) &&
            col("c_us") <= col("p_us"))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("p_us"), col("c_us"))
        .orderBy("user_id", "purchase_id", "click_id")
    }))

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" -> """
      SELECT date_trunc('day', ts) AS w_start, event_type, count(*) AS n,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""",
    "q_stream_sliding" -> """
      SELECT w_start, event_type, count(*) AS n,
        CAST(round(sum(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
      FROM (SELECT date_trunc('day', ts) - o * INTERVAL '1 day' AS w_start,
                   event_type, value
            FROM events, UNNEST(generate_series(0, 1)) AS g(o))
      GROUP BY 1, 2 ORDER BY w_start, event_type""",
    "q_stream_session" -> """
      WITH seq AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE user_id < 50),
      flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '1 hour'
                       THEN 1 ELSE 0 END AS new_sess
        FROM seq),
      sess AS (
        SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events,
             CAST(round(sum(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_value
      FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""",
    "q_stream_join" -> """
      SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
             epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
      FROM events p JOIN events c
        ON p.event_type = 'purchase' AND c.event_type = 'click'
       AND p.user_id = c.user_id
       AND epoch_us(c.ts) >= epoch_us(p.ts) - 600000000
       AND epoch_us(c.ts) <= epoch_us(p.ts)
      ORDER BY p.user_id, purchase_id, click_id""")

  // ---------- Structured Streaming forms ----------

  /** Tumbling event-time counts with a watermark — append-mode safe.
    * Same logical shape as q_stream_tumbling, run incrementally. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Native session windows (gap-based), the incremental twin of
    * q_stream_session. */
  def sessionAgg(events: DataFrame, gap: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming face of Dedup. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** The FULL q_dedup_incremental screen run continuously — exact AND
    * near-dup arms, entirely STATELESS stream-static joins. The trick
    * that makes the near arm streamable: the 16-slot minhash signature
    * is computed SCAN-SIDE per row (array higher-order functions over
    * the row's own shingle set — the batch form's explode + groupBy
    * aggregate would need stateful aggregation on a stream), so the
    * four band keys are plain columns and each probes its slice of the
    * static banding index with an ordinary left join. Per-band minima
    * `least`-fold to the global nearest corpus doc — equal to the
    * batch query's min over all candidates (min of a union = least of
    * per-part mins; DedupSpec pins row-level parity). The signature
    * arithmetic is bit-identical to [[graft.llm.Dedup.bandsAt]]'s:
    * same md5 slices, same conv-to-long, same comma join.
    *
    * `exactIndex` = (chash, exact_match), `bandIndex` = (band, bkey,
    * cdoc) — the materialized corpus artifacts a deployment reloads.
    * Join shape: the DELTA micro-batch is the `shuffle_hash` BUILD
    * side — it is the bounded side of the screen; a 100 TB corpus's
    * standing index is NOT broadcastable, and an estimate-driven
    * broadcast of it would break the screen's contract (cost scales
    * with |delta|). Same rule as the batch twin (Dedup.scala
    * q_dedup_incremental), pinned by StreamsSpec's plan assertion. At
    * deployment the index sides are bucketed tables on (chash) /
    * (band, bkey), so their exchange is storage-side and the
    * per-micro-batch cost really is |delta| alone. */
  def incrementalScreen(delta: DataFrame, exactIndex: DataFrame,
      bandIndex: DataFrame): DataFrame = {
    val hs =
      """if(size(t) >= 3,
        |   transform(
        |     array_distinct(transform(sequence(0, size(t) - 3),
        |       i -> concat_ws(' ', t[i], t[i+1], t[i+2]))),
        |     s -> array(md5(concat('0:', s)), md5(concat('1:', s)),
        |                md5(concat('2:', s)), md5(concat('3:', s)))),
        |   cast(null as array<array<string>>))""".stripMargin
    def slot(g: Int, j: Int) =
      s"array_min(transform(hs, h -> " +
        s"cast(conv(substring(h[$g], ${j * 8 + 1}, 8), 16, 10) as bigint)))"
    val keyed = (0 to 3).foldLeft(
      delta.withColumn("chash", md5(col("text")))
        .withColumn("t", split(col("text"), " "))
        .withColumn("hs", expr(hs))) { (df, g) =>
      // A <3-token doc has hs NULL, and every slot of a NULL hs is
      // NULL — but concat_ws over all-NULL args yields "", not NULL.
      // Emit the band key as explicit NULL so the probe join can never
      // match a degenerate corpus key: today's bkeys are comma-joined
      // numerics (never empty), but that is an invariant of the index
      // BUILDER, and the probe should not depend on it.
      df.withColumn(s"bkey_$g",
        when(col("hs").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(",", (0 to 3).map(j => expr(slot(g, j))): _*)))
    }
    val probed = (0 to 3).foldLeft(
      keyed.hint("shuffle_hash")
        .join(exactIndex, Seq("chash"), "left")) { (df, g) =>
      df.hint("shuffle_hash")
        .join(bandIndex.filter(col("band") === g)
          .select(col("bkey").as(s"bkey_$g"), col("cdoc").as(s"cdoc_$g")),
        Seq(s"bkey_$g"), "left")
    }
    val nearMatch = least((0 to 3).map(g => col(s"cdoc_$g")): _*)
    probed.select(col("doc_id"),
      when(col("exact_match").isNotNull, "exact_dup")
        .when(nearMatch.isNotNull, "near_dup")
        .otherwise("new").as("status"),
      coalesce(col("exact_match"), nearMatch).as("match_id"))
  }

  /** Archive blobs → member fan-out → the FULL dedup screen, in ONE
    * stateless stream: [[graft.llm.Multimodal.decodeZipText]]'s
    * scan-fused flatMap feeds each ok member's decoded text straight
    * into [[incrementalScreen]]'s exact-hash + LSH band stream-static
    * joins against the standing corpus index — the crawl front door
    * for corpora that arrive as archives (tarballs/zips of documents):
    * every member is screened against the corpus the moment its
    * container lands, no unpack-to-storage staging step. Member
    * identity is doc_id·2¹⁶ + member (the CD entry count is a u16, so
    * the packing is collision-free). Stateless end to end — the
    * fan-out is a flatMap, the screen is stream-static joins — so the
    * plan streams unchanged and cost per micro-batch is ∝ member
    * rows alone (StreamsSpec pins batch parity and zero state). */
  def archiveMemberScreen(blobs: org.apache.spark.sql.Dataset[graft.llm.BinaryDoc],
      exactIndex: DataFrame, bandIndex: DataFrame): DataFrame =
    incrementalScreen(
      graft.llm.Multimodal.decodeZipText(blobs).toDF()
        .filter(col("status") === "ok")
        .select((col("doc_id") * 65536L + col("member")).as("doc_id"),
          col("text")),
      exactIndex, bandIndex)

  /** The standing IMAGE band index — the artifact the batch
    * q_dedup_image_phash_near census materializes, exposed for the
    * streamed screen: every ok-decoded corpus image exploded into its
    * 4×16-bit dHash bands, (band, bkey, cdoc, chi, clo). The band
    * split MUST match the batch tier's (Multimodal.scala, the
    * `banded` frame): lo%2¹⁶, lo>>16, hi%2¹⁶, hi>>16. */
  def imageBandIndex(
      images: org.apache.spark.sql.Dataset[graft.llm.BinaryDoc]): DataFrame = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.map(d =>
        graft.llm.Multimodal.dhashPpm(d.doc_id, d.payload))).toDF()
      .filter(col("status") === "ok")
      .select(col("doc_id").as("cdoc"), col("dhash_hi").as("chi"),
        col("dhash_lo").as("clo"), explode(array(
          struct(lit(0).as("band"), (col("dhash_lo") % 65536L).as("bkey")),
          struct(lit(1).as("band"),
            expr("shiftright(dhash_lo, 16)").as("bkey")),
          struct(lit(2).as("band"), (col("dhash_hi") % 65536L).as("bkey")),
          struct(lit(3).as("band"),
            expr("shiftright(dhash_hi, 16)").as("bkey")))).as("b"))
      .select(col("b.band").as("band"), col("b.bkey").as("bkey"),
        col("cdoc"), col("chi"), col("clo"))
  }

  /** The q_dedup_image_phash_near band screen run CONTINUOUSLY over
    * ARRIVING IMAGES — the crawl-time perceptual-dedup gate: each
    * micro-batch of image blobs decodes scan-side (the full P6 walk +
    * 8×9 gray grid of [[graft.llm.Multimodal.dhashPpm]]), derives the
    * same 4×16-bit band keys as the batch tier, and probes each band
    * STREAM-STATIC against the standing [[imageBandIndex]]; candidates
    * verify on exact Hamming ≤ 8. Pigeonhole recall guarantee is the
    * batch tier's: any corpus image within 3 bits shares ≥ 1 band.
    *
    * Output grain (stateless by design): one EVIDENCE row per
    * (arriving image, band, verified corpus match) — a pair matching
    * in k bands emits k rows, attribution included — plus one status
    * row per undecodable blob. A per-image census (dedupe + degree) is
    * aggregation and stays the batch tier's job; the stream's job is
    * the low-latency flag. Stateless end to end: a map decode + 4
    * stream-static joins with the DELTA as the bounded SHJ build side
    * (the incrementalScreen rule) — per-micro-batch cost ∝ |delta|
    * whatever the corpus, and the deployed index is a table bucketed
    * on (band, bkey), so its exchange is storage-side. */
  def imageNearDupScreen(
      images: org.apache.spark.sql.Dataset[graft.llm.BinaryDoc],
      bandIndex: DataFrame): DataFrame = {
    import images.sparkSession.implicits._
    val metas = images.mapPartitions(_.map(d =>
      graft.llm.Multimodal.dhashPpm(d.doc_id, d.payload))).toDF()
    val ok = metas.filter(col("status") === "ok")
    def bkey(g: Int) = g match {
      case 0 => col("dhash_lo") % 65536L
      case 1 => expr("shiftright(dhash_lo, 16)")
      case 2 => col("dhash_hi") % 65536L
      case _ => expr("shiftright(dhash_hi, 16)")
    }
    val evidence = (0 to 3).map { g =>
      ok.select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
          bkey(g).as("bkey"))
        .hint("shuffle_hash")
        .join(bandIndex.filter(col("band") === g)
            .select(col("bkey"), col("band"), col("cdoc"), col("chi"),
              col("clo")),
          Seq("bkey"))
        .withColumn("hamming", expr(
          "cast(bit_count(dhash_lo ^ clo) + bit_count(dhash_hi ^ chi) as int)"))
        .filter(col("hamming") <= 8 && col("doc_id") =!= col("cdoc"))
        .select(col("doc_id"), lit("near_dup").as("status"), col("band"),
          col("cdoc").as("match_id"), col("hamming"))
    }.reduce(_.unionByName(_))
    metas.filter(col("status") =!= "ok")
      .select(col("doc_id"), col("status"),
        lit(null).cast("int").as("band"),
        lit(null).cast("long").as("match_id"),
        lit(null).cast("int").as("hamming"))
      .unionByName(evidence)
  }

  /** The q_knn_ivf_incremental ingest run CONTINUOUSLY — arriving
    * vectors assigned to the STANDING trained IVF cells. The
    * assignment ([[graft.llm.Similarity.ivfAssignWith]]) is a pure
    * projection against the index's literal (n, Σv) cell stats — no
    * join, no state, no shuffle — so it streams UNCHANGED: the
    * streaming plan is the batch plan per micro-batch, cost ∝ |delta|
    * whatever the corpus that trained the index (StreamsSpec pins
    * row-level parity with the batch assignment and the stateless
    * plan). `parts` is the standing index: train once in batch
    * ([[graft.llm.Similarity.ivfTrainStats]]), redeploy per stream. */
  def ivfIngest(delta: DataFrame,
      parts: Seq[(Long, Seq[Long], BigInt)]): DataFrame =
    graft.llm.Similarity.ivfAssignWith(parts, delta)

  /** Standing chunk store of the CDC tier — the distinct chunk set a
    * content-addressed store already holds (built once in batch from
    * the corpus; at deployment a bucketed table on chunk). */
  def cdcChunkIndex(corpus: DataFrame): DataFrame =
    graft.llm.Dedup.cdcChunks(corpus).select(col("chunk")).distinct()

  /** Streamed CDC INGEST screen — the q_dedup_cdc tier run at the
    * front door: each arriving doc is chunked at content-defined
    * boundaries (map-only, fused into the micro-batch scan) and every
    * chunk probes the standing store, emitting (doc_id, chunk, known).
    * `known = true` chunks need no storage write — the dedup-on-ingest
    * decision a CAS makes, and CDC's locality (q_dedup_cdc_shift)
    * is exactly why edits to known docs still mostly hit. Stateless:
    * chunking is a projection, the screen is ONE stream-static left
    * join with the DELTA as the hinted build side (the
    * incrementalScreen rule — a 100 TB standing store is never the
    * broadcast/build side), and no aggregation runs in-stream, so the
    * plan streams unchanged in append mode; the per-doc reuse rollup
    * is the consumer's one-line groupBy. StreamsSpec pins batch
    * parity, zero state, and flag correctness against an independent
    * set model. */
  def cdcIngestScreen(delta: DataFrame, chunkIndex: DataFrame): DataFrame =
    graft.llm.Dedup.cdcChunks(delta)
      .hint("shuffle_hash")
      .join(chunkIndex.withColumn("known", lit(true)), Seq("chunk"), "left")
      .select(col("doc_id"), col("chunk"),
        coalesce(col("known"), lit(false)).as("known"))

  /** Standing PURGE INDEX of the deletion screen — per doc its
    * content hash, exact-dedup keeper, and copy count, built once in
    * batch over the corpus (at deployment a bucketed table on
    * doc_id). The doc-keyed lookup side [[forgetScreen]] probes. */
  def forgetIndex(corpus: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    corpus.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
  }

  /** Streamed RIGHT-TO-BE-FORGOTTEN screen — deletion requests arrive
    * continuously (the GDPR/takedown queue): each micro-batch of
    * tombstoned doc_ids probes the standing [[forgetIndex]] and emits
    * what the deletion TOUCHES — whether the id exists, its content
    * hash (the blob the store must purge), its exact-dedup keeper and
    * copy count, and `was_keeper` (the cluster now needs re-election
    * — the batch re-election itself is q_forget_docs' job: a window
    * over the whole cluster, batch-only by the keeper-swap
    * reasoning). Stateless: ONE stream-static left join with the
    * tombstone DELTA as the hinted build side (the incrementalScreen
    * rule — a 100 TB standing index is never the build side), no
    * aggregation in-stream, so the plan streams unchanged in append
    * mode. StreamsSpec pins batch parity, zero state, and flag
    * correctness. */
  def forgetScreen(tombstones: DataFrame, index: DataFrame): DataFrame =
    tombstones.hint("shuffle_hash")
      .join(index.withColumn("known", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("known"), lit(false)).as("known"),
        col("content_hash"), col("keeper"), col("n_copies"),
        coalesce(col("doc_id") === col("keeper"), lit(false))
          .as("was_keeper"))

  /** Streamed ANN SERVING — the query side of the lifecycle
    * [[ivfIngest]] covers for the corpus side: each arriving
    * micro-batch of query vectors (vec_id, q, norm) is assigned to
    * its trained cells (the same stateless scan-side projection) and
    * ranked against the STANDING cell-bucketed corpus — top-k by
    * exact integer cosine, nprobe-configurable, identical arithmetic
    * to the batch q_knn_ivf ranking. The per-query top-k needs a rank
    * window, which append-mode streaming forbids, so the production
    * shape is `foreachBatch` (the [[globalIdIngest]] precedent):
    * per micro-batch the query set is complete — ANN requests are
    * one-shot — and the batch planner runs the exact serving plan.
    * Stateless across batches by construction (no standing operator
    * state; the index is the only standing artifact), so replayed
    * batches re-derive byte-identical rows (StreamsSpec pins batch
    * parity and the exactly-once union). Cost per batch: |delta| ×
    * (corpus/K cells) — the probed slice, never the corpus. */
  def annServe(deltaQueries: DataFrame,
      parts: Seq[(Long, Seq[Long], BigInt)], corpusCells: DataFrame,
      k: Int = 3, nprobe: Int = 2): DataFrame =
    graft.llm.Similarity.ivfTopBetween(
      graft.llm.Similarity.ivfAssignWith(parts, deltaQueries),
      corpusCells, k, nprobe)

  /** The q_global_ids assignment run INCREMENTALLY — each arriving
    * micro-batch of documents assigned dense contiguous IDs above a
    * STANDING max-ID watermark, with the EXACT batch plan
    * ([[graft.ops.Analytics.globalIdsOn]]: per-shard row_number +
    * prefix-summed S-row offsets broadcast — never a global sort) run
    * on the delta and every gid lifted by `base`. Dense-ID assignment
    * needs the batch-complete offsets prefix sum, so unlike
    * [[ivfIngest]] it cannot be a stateless per-row projection — the
    * production shape is `foreachBatch` (StreamsSpec drives it so):
    * run the batch plan on the delta, advance the watermark to
    * base + |delta|. Restart safety comes from deriving `base` from
    * DURABLE state (the sink's max gid) instead of driver memory, and
    * replay safety from the idempotence the spec pins: the assignment
    * is deterministic in (delta set, base), so a replayed batch with
    * its recorded base re-derives byte-identical rows. */
  def globalIdIngest(delta: DataFrame, base: Long, S: Int = 32): DataFrame =
    graft.ops.Analytics.globalIdsOn(delta, S)
      .select(col("doc_id"), col("shard"), (col("gid") + base).as("gid"))

  /** The q_drift_psi monitor run CONTINUOUSLY — each arriving
    * micro-batch of documents PSI-scored against a STANDING reference
    * histogram (the artifact a deployment trains once and reloads,
    * like [[ivfIngest]]'s cell stats and [[lrGate]]'s weights): the
    * batch query's exact binning ([[graft.ops.Analytics.psiTokenBin]])
    * and micro-unit term arithmetic ([[graft.ops.Analytics.psiOf]]),
    * with c_ref literal. PSI needs the whole batch's totals, so like
    * [[globalIdIngest]] the production shape is `foreachBatch` (the
    * spec drives it so) — each batch emits its own 8-row drift table
    * and verdict, the retrain/alert trigger a continuous ingest
    * polls. */
  def psiMonitor(delta: DataFrame, ref: Seq[(Long, Long)]): DataFrame = {
    // the ref histogram is a CALLER-supplied artifact: a bin outside
    // the dense 0..7 grid would silently vanish from psiOf's grid
    // join (its mass dropped from every probability) — fail loudly
    // instead, the malformed-artifact contract
    val bad = ref.collect { case (b, _) if b < 0 || b > 7 => b }
    require(bad.isEmpty,
      s"psiMonitor: reference histogram bins outside the 0..7 grid: " +
        bad.mkString(", "))
    val s = delta.sparkSession
    val refDf = s.createDataFrame(ref).toDF("bin", "c_ref")
    val cur = delta
      .select(expr(graft.ops.Analytics.psiTokenBin).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c_cur"))
    val counts = refDf.join(cur, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    graft.ops.Analytics.psiOf(s, counts, 8)
  }

  /** The q_lr_quality gate run CONTINUOUSLY — arriving documents
    * scored under the STANDING trained micro-unit weights
    * ([[graft.llm.TextAnalysis.lrTrainedWeights]], the 17-long
    * artifact a deployment reloads). The projection computes features
    * by an in-row fold (no explode/groupBy — the batch trainer's
    * aggregation re-expressed per row with identical integer sums),
    * so the gate is stateless and exchange-free and streams
    * unchanged: the learned-filter analog of [[ivfIngest]], pinned
    * for batch parity and plan shape in StreamsSpec. */
  def lrGate(delta: DataFrame, weights: Seq[Long]): DataFrame =
    graft.llm.TextAnalysis.lrGateOn(delta, weights)

  /** The C4 LINE-RULE stage streamed — the crawl front-door cleaning
    * a continuous ingest runs per document: line split + both line
    * rules + the page arm as ONE in-row higher-order-array projection
    * ([[graft.ops.TextOps.c4LineGateOn]]; identical rule arithmetic
    * to q_c4_clean). Stateless and exchange-free, so it streams
    * unchanged; the three-line-span GLOBAL dedup stays batch-only —
    * the same window-needs-the-whole-key-group reasoning as the
    * funnel's keeper swap. StreamsSpec pins batch parity and the
    * plan shape. */
  def c4Gate(delta: DataFrame): DataFrame =
    graft.ops.TextOps.c4LineGateOn(delta)

  /** The URL-FILTER frontier gate streamed — the routing decision a
    * continuous crawl makes per candidate URL BEFORE fetching:
    * synth + canonicalizer + first-matching-rule CASE, all one
    * codegen scan projection ([[graft.llm.Dedup.urlFilterDecisionsOn]]
    * — identical rule arithmetic to q_url_filter). Stateless and
    * exchange-free, so it streams unchanged in append mode; the
    * per-reason census is the consumer's one-line groupBy.
    * StreamsSpec pins batch parity, zero state, and the plan shape. */
  def urlFilterGate(delta: DataFrame): DataFrame =
    graft.llm.Dedup.urlFilterDecisionsOn(delta)

  /** The ROBOTS politeness gate streamed — per-URL robots.txt parse
    * (the real sectioned line-state machine) + disallow prefix match
    * ([[graft.llm.Dedup.robotsDecisionsOn]] — identical to
    * q_robots_filter's scan stage). Stateless and exchange-free like
    * [[urlFilterGate]]; at deployment the robots body joins in from a
    * fetched side table by domain (broadcast, same plan class) —
    * the fixture synthesizes it scan-side, keeping the streamed plan
    * join-free. StreamsSpec pins parity, zero state, plan shape. */
  def robotsGate(delta: DataFrame): DataFrame =
    graft.llm.Dedup.robotsDecisionsOn(delta)

  /** Streamed `.jsonl.zst` front door — q_zstd_jsonl's transport
    * stage run per micro-batch: arriving compressed-JSONL blobs
    * (the RedPajama/Dolma/FineWeb shipping shape) fan out to one row
    * per JSON record through the SAME scan-fused flatMap the batch
    * query uses ([[graft.llm.Multimodal.zstdJsonlFanout]] — the
    * multi-frame walk with skippable frames skipped and dictionary
    * frames resolved, the JSONL split, codegen JSON extraction), so
    * records flow into downstream screens the moment a blob lands —
    * no decompress-to-storage staging. Stateless end to end (no
    * watermark, no state store), append-mode native, replay-safe;
    * StreamsSpec pins batch parity, zero state, and a checkpointed
    * restart. */
  def zstdJsonlIngest(
      blobs: org.apache.spark.sql.Dataset[graft.llm.BinaryDoc])
      : DataFrame =
    graft.llm.Multimodal.zstdJsonlFanout(blobs)

  /** Streamed CONTAMINATION screen — q_contamination's benchmark
    * fingerprint set as the textbook stream-static broadcast: each
    * arriving document fingerprints IN-ROW (the winnowing transform
    * is one generate inside the scan — [[graft.llm.TextAnalysis
    * .fingerprintsOn]], per-doc-distinct by construction so no
    * stateful cross-row distinct exists), then inner-joins the
    * STANDING benchmark fingerprints (tiny — eval suites, broadcast
    * build side; the corpus stream never shuffles, exactly the batch
    * query's scale shape). Emits one row per (doc, shared fp) hit —
    * the quarantine feed a continuous ingest acts on; the per-doc
    * census is the consumer's one-line groupBy. Zero state, no
    * watermark, stream-static inner joins are append-mode native, so
    * replayed batches re-derive identical rows. StreamsSpec pins
    * batch parity, zero state, the no-shuffle plan, and a
    * checkpointed restart. */
  def contaminationScreen(delta: DataFrame, benchFps: DataFrame): DataFrame =
    graft.llm.TextAnalysis.fingerprintsOn(delta)
      // distinct ON THE STATIC SIDE: fingerprintsOn is per-doc
      // distinct only, so a multi-document benchmark artifact repeats
      // shared fps across its docs — without the dedup each repeat
      // would emit a duplicate (doc_id, fp) hit, violating the
      // one-row-per-shared-fp contract. The build side is the tiny
      // broadcast frame and the dedup is static-side, so the stream
      // stays stateless/append-native.
      .join(broadcast(benchFps.select(col("fp")).distinct()), Seq("fp"))
      .select(col("doc_id"), col("fp"))

  /** The q_pipeline_chunks funnel run INCREMENTALLY — the shape a
    * production ingest schedules continuously: the same scan-side
    * language/quality features and filters (literally the same
    * projection, [[graft.llm.TextAnalysis.pipelineFeaturesOf]]), with
    * the one batch-only operator swapped for its streaming-native
    * form: the min-doc_id keeper election (a row_number window — needs
    * the whole key group, impossible incrementally) becomes stateful
    * `dropDuplicates` on the content hash, i.e. FIRST-ARRIVAL keeper.
    * Survivor CONTENT is identical either way (duplicates share their
    * text byte-for-byte), so the streamed chunk set equals the batch
    * plan's up to which duplicate's doc_id is reported — StreamsSpec
    * pins exactly that equality, keyed by content hash.
    *
    * State: one md5 per distinct surviving document, forever — the
    * documents fixture has no event time, so there is no watermark to
    * bound it; a production deployment keys retention with
    * `dropDuplicatesWithinWatermark` on an ingest timestamp. */
  def pipelineChunks(docs: DataFrame, C: Int = 16): DataFrame =
    graft.llm.TextAnalysis.pipelineFeaturesOf(docs)
      .filter(col("pred") === "en" && col("quality") >= 0.5)
      .withColumn("thash", md5(col("text")))
      .dropDuplicates("thash")
      .select(col("doc_id"), col("thash"), col("t"), explode(expr(
        s"sequence(0, cast(ceil(n_tok / $C.0) as int) - 1)")).as("chunk_idx"))
      .withColumn("c", expr(s"slice(t, chunk_idx * $C + 1, $C)"))
      .select(col("doc_id"), col("thash"), col("chunk_idx"),
        size(col("c")).as("chunk_tokens"),
        md5(concat_ws(" ", col("c"))).as("chunk_hash"))

  /** A closed session emitted by [[sessionsWithState]]. */
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Custom sessionization via flatMapGroupsWithState with an
    * event-time timeout — the fully-general stateful operator
    * (`session_window` covers gap sessions; this shape is what you
    * reach for when the state machine is richer: carts, funnels,
    * fraud windows). Sessions close either when a later event for the
    * key arrives past the gap, or when the watermark passes
    * session_end + gap (timeout path) — so quiet keys still flush.
    *
    * State per key is one (start, end, n) triple — O(keys) state store
    * size, the same bound the built-in session window has. */
  def sessionsWithState(events: DataFrame, gapMs: Long = 3600L * 1000,
      watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val times = rows.map(_._2.getTime).toSeq.sorted
            // fold the batch (+ any open session) into gap-delimited segments
            val init = state.getOption.map(s => Vector(s)).getOrElse(Vector.empty)
            val segs = times.foldLeft(init) { (acc, t) =>
              acc.lastOption match {
                case Some(seg) if t - seg.end <= gapMs =>
                  acc.init :+ OpenSession(seg.start, t, seg.n + 1)
                case _ => acc :+ OpenSession(t, t, 1)
              }
            }
            val closed = segs.init
            val open = segs.last
            state.update(open)
            state.setTimeoutTimestamp(open.end + gapMs)
            closed.iterator.map(s =>
              ClosedSession(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
          }
      }
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the preceding `windowLen`. Both sides carry a
    * watermark so the join state store evicts rows older than
    * (watermark + interval) — bounded state, the only way a
    * stream-stream join survives unbounded input. The batch twin of
    * this shape is q_join_range / q_join_asof. */
  def purchaseClickJoin(events: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Streaming sketch fold: the CountMin aggregate
    * ([[graft.functions.CountMin]], a mergeable TypedImperativeAggregate)
    * as a keyed streaming aggregation. Each micro-batch folds its tokens
    * into the per-key sketch buffer held in the state store — the same
    * partial/merge path the batch exchange exercises, which is exactly
    * why mergeable sketches are what incremental execution wants: state
    * per key is the constant 8·depth·width-byte buffer, never the token
    * stream, and the emitted sketch after any prefix of batches equals
    * the batch sketch over the same rows (StreamsSpec pins this).
    * Requires [[graft.functions.GraftFunctions.register]] (or the
    * session extensions) so `cms_sketch` resolves. */
  def streamingCms(tokens: DataFrame, depth: Int = 4, width: Int = 64): DataFrame =
    tokens.groupBy(col("k"))
      .agg(expr(s"cms_sketch(w, $depth, $width)").as("sk"))

  /** The sketch composed with EVENT-TIME windows: one CMS per tumbling
    * window, watermark-evicted — the shape a production token-frequency
    * monitor runs (per-hour sketches, state bounded by windows in
    * flight × the constant buffer, finalized windows emitted in append
    * mode and never revisited). */
  def windowedCms(tokens: DataFrame, windowLen: String = "1 day",
      watermark: String = "1 hour", depth: Int = 4, width: Int = 64): DataFrame =
    tokens.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("win"))
      .agg(expr(s"cms_sketch(w, $depth, $width)").as("sk"))
      .select(col("win.start").as("w_start"), col("sk"))

  /** The histogram-quantile sketch's streaming form: 32 clamped
    * equi-width bins over a PRE-DECLARED [lo, lo + 32·width) range —
    * a streaming histogram must fix its geometry up front (the batch
    * q_quantile_sketch derives lo/width from an exact min/max pass the
    * unbounded stream cannot run), which is exactly how production
    * latency/price monitors operate: bins are part of the metric
    * contract. Bin counts are plain mergeable longs, so the state
    * store holds ≤ 32 rows whatever the stream length, and the
    * streamed histogram after any prefix of batches equals the batch
    * histogram over the same rows (StreamsSpec pins parity and the
    * checkpoint restart). Quantile read-out from 32 bins is a trivial
    * batch-side epilogue wherever the sink lands. */
  def streamingHistogram(values: DataFrame, lo: Long,
      width: Long): DataFrame =
    values.groupBy(
        expr(s"least(greatest((v - $lo) div $width, 0), 31)").as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-key top-k through the state store: `max_k`'s heap buffer is
    * mergeable, so incremental execution folds each micro-batch into
    * the per-key heap — state per key is the constant k-element
    * buffer, never the value stream, and the emitted top-k after any
    * prefix of batches equals the batch top-k over the same rows
    * (StreamsSpec pins parity). Requires
    * [[graft.functions.GraftFunctions.register]]. */
  def streamingTopK(values: DataFrame, k: Int = 3): DataFrame =
    values.groupBy(col("k")).agg(expr(s"max_k(v, $k)").as("top"))

  /** Per-key bloom membership index through the state store — the
    * streaming build of the semi-join reduction filter
    * (ops/Joins.scala bloom path): each micro-batch ORs its keys into
    * the per-key bitset buffer; constant 8·(m/64)-byte state, streamed
    * bitset after any prefix equals the batch bitset (StreamsSpec). */
  def streamingBloom(values: DataFrame, mBits: Int = 1024,
      k: Int = 3): DataFrame =
    values.groupBy(col("k")).agg(expr(s"bloom_agg(v, $mBits, $k)").as("bl"))

  /** Custom state: running per-user event counts via
    * mapGroupsWithState (the reference Reduce's stateful streaming
    * analog — arbitrary per-key state the built-ins can't express). */
  def runningUserCounts(events: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
  }
}
