package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Incremental execution of the Structured Streaming wrappers in
  * [[Streams]] on a MemoryStream — proves the same logical plans run
  * under the micro-batch engine with watermarks and state (SURVEY.md
  * §2c "streaming" row; the batch twins are oracle-checked by the
  * driver, incremental emission has no oracle). */
class StreamsSpec extends SparkSuite {
  import StreamsSpec.Ev
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val day1 = Seq(
    Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 10:00:00"), 2, "view", 3.0),
    Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0)) // dup event_id
  private val day2 = Seq(
    Ev(4, ts("2024-01-02 00:05:00"), 1, "click", 4.0),
    Ev(5, ts("2024-01-02 12:00:00"), 2, "view", 5.0))

  test("tumblingCounts aggregates event-time windows incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.tumblingCounts(in.toDF(), "1 day", "1 hour")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(day1: _*); q.processAllAvailable()
      in.addData(day2: _*); q.processAllAvailable()
      val got = spark.table("tumbling")
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long)].collect().toSeq
      assert(got === Seq(
        (ts("2024-01-01 00:00:00"), "click", 3L),
        (ts("2024-01-01 00:00:00"), "view", 1L),
        (ts("2024-01-02 00:00:00"), "click", 1L),
        (ts("2024-01-02 00:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("sessionAgg merges gap-based session windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.sessionAgg(in.toDF(), "1 hour", "1 hour")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(day1 ++ day2: _*); q.processAllAvailable()
      val got = spark.table("sessions")
        .orderBy("user_id", "session_start")
        .as[(Timestamp, Timestamp, Long, Long)].collect().toSeq
      // user 1: events at 00:10/00:20 merge (gap < 1h), day-2 event is
      // its own session; user 2: two singleton sessions.
      assert(got.map { case (start, _, user, n) => (user, start, n) } === Seq(
        (1L, ts("2024-01-01 00:10:00"), 3L),
        (1L, ts("2024-01-02 00:05:00"), 1L),
        (2L, ts("2024-01-01 10:00:00"), 1L),
        (2L, ts("2024-01-02 12:00:00"), 1L)))
    } finally q.stop()
  }

  test("dedupStream drops duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.dedupStream(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(day1: _*); q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids === Seq(1L, 2L, 3L)) // dup of event 2 dropped
    } finally q.stop()
  }

  test("file-stream source gives the same tumbling counts as the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    // stage the fixture events as the streamed input (micro-batch file source)
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    val batch = spark.read.parquet(dir)
    val expected = batch
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Streams.tumblingCounts(stream, "1 day", "1 hour")
      .writeStream.format("memory").queryName("fstream")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("fstream")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("aggregation state recovers from checkpoint across query restarts") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Ev]
    def start() = Streams.tumblingCounts(in.toDF(), "1 day", "1 hour")
      .writeStream.format("memory").queryName("recov")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()
    val q1 = start()
    try { in.addData(day1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start() // restart from the same checkpoint
    try {
      in.addData(day2: _*); q2.processAllAvailable()
      val got = spark.table("recov")
        .as[(Timestamp, String, Long)].collect().toSet
      // counts reflect both batches exactly once — no replay doubling
      assert(got === Set(
        (ts("2024-01-01 00:00:00"), "click", 3L),
        (ts("2024-01-01 00:00:00"), "view", 1L),
        (ts("2024-01-02 00:00:00"), "click", 1L),
        (ts("2024-01-02 00:00:00"), "view", 1L)))
    } finally q2.stop()
  }

  test("watermark drops late data in append-mode tumbling windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.tumblingCounts(in.toDF(), "1 day", "1 hour")
      .writeStream.format("memory").queryName("late_tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(day1: _*); q.processAllAvailable()
      // advance watermark far past day 1 → day-1 windows finalize
      in.addData(Ev(9, ts("2024-01-05 00:00:00"), 3, "view", 0.0))
      q.processAllAvailable()
      val before = spark.table("late_tumbling")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(before === Set(
        (ts("2024-01-01 00:00:00"), "click", 3L),
        (ts("2024-01-01 00:00:00"), "view", 1L)))
      // a straggler for day 1 arrives past the watermark → dropped
      in.addData(Ev(10, ts("2024-01-01 02:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val after = spark.table("late_tumbling")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(after === before) // no re-emission, no count change
    } finally q.stop()
  }

  test("sessionsWithState closes a session when a later event passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.sessionsWithState(in.toDF(), gapMs = 3600L * 1000, "1 hour")
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 has two events 20 min apart → one open session
      in.addData(
        Ev(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("state_sessions").count() === 0) // still open
      // batch 2: an event 5 h later closes it (gap exceeded in-key)
      in.addData(Ev(3, ts("2024-01-01 05:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // append sinks emit on the NEXT trigger after state commits; nudge
      in.addData(Ev(4, ts("2024-01-01 05:01:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("state_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
      assert(got === Seq(
        (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:20:00"), 2L)))
    } finally q.stop()
  }

  test("purchaseClickJoin matches clicks within 10 minutes before purchase") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.purchaseClickJoin(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 00:10:00"), 1, "purchase", 9.0), // joins click 1
        Ev(3, ts("2024-01-01 00:50:00"), 1, "click", 1.0),
        Ev(4, ts("2024-01-01 02:00:00"), 1, "purchase", 9.0), // >10 min: no click
        Ev(5, ts("2024-01-01 02:00:00"), 2, "purchase", 9.0)) // other user: none
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .selectExpr("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSeq
      assert(got === Seq((2L, 1L)))
    } finally q.stop()
  }

  test("streamed cms_sketch equals the batch sketch over the same tokens") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // two micro-batches of (key, token) — overlapping tokens across
    // batches so the state-store merge path actually combines counts
    val b1 = Seq("a" -> "x", "a" -> "y", "a" -> "x", "b" -> "z")
    val b2 = Seq("a" -> "x", "b" -> "z", "b" -> "w", "a" -> "q")
    val in = MemoryStream[(String, String)]
    val q = Streams.streamingCms(in.toDF().toDF("k", "w"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .as[(String, Seq[Long])].collect().toMap
      val batch = Streams.streamingCms((b1 ++ b2).toDF("k", "w"))
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed === batch)
      // and the sketch is non-trivial: key a saw 5 tokens
      assert(streamed("a").sum === 4L * 5) // depth rows × 5 tokens each
    } finally q.stop()
  }

  test("windowed cms_sketch finalizes per event-time window under the watermark") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.windowedCms(in.toDF().toDF("ts", "w"))
      .writeStream.format("memory").queryName("cms_win")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2024-01-01 01:00:00"), "x"), (ts("2024-01-01 02:00:00"), "x"),
        (ts("2024-01-01 03:00:00"), "y"), (ts("2024-01-02 01:00:00"), "x"))
      q.processAllAvailable()
      // advance the watermark past day 2 → both day windows finalize
      in.addData((ts("2024-01-05 00:00:00"), "z"))
      q.processAllAvailable()
      val got = spark.table("cms_win")
        .as[(Timestamp, Seq[Long])].collect().toMap
      val batchDay1 = Seq("x", "x", "y").toDF("w")
        .agg(expr("cms_sketch(w, 4, 64)")).as[Seq[Long]].head()
      val batchDay2 = Seq("x").toDF("w")
        .agg(expr("cms_sketch(w, 4, 64)")).as[Seq[Long]].head()
      assert(got(ts("2024-01-01 00:00:00")) === batchDay1)
      assert(got(ts("2024-01-02 00:00:00")) === batchDay2)
      // a straggler for day 1 behind the watermark never reopens it
      in.addData((ts("2024-01-01 05:00:00"), "late"))
      q.processAllAvailable()
      assert(spark.table("cms_win")
        .filter(col("w_start") === ts("2024-01-01 00:00:00")).count() === 1)
    } finally q.stop()
  }

  test("streamed cms_sketch state survives a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cms_ckpt").toString
    val b1 = Seq("a" -> "x", "a" -> "y", "b" -> "z")
    val b2 = Seq("a" -> "x", "b" -> "w")
    val in = MemoryStream[(String, String)]
    def start() = Streams.streamingCms(in.toDF().toDF("k", "w"))
      .writeStream.format("memory").queryName("cms_recov")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()
    val q1 = start()
    try { in.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start() // restart: the serialized sketch buffer must reload
    try {
      in.addData(b2: _*); q2.processAllAvailable()
      val streamed = spark.table("cms_recov")
        .as[(String, Seq[Long])].collect().toMap
      val batch = Streams.streamingCms((b1 ++ b2).toDF("k", "w"))
        .as[(String, Seq[Long])].collect().toMap
      // counts reflect both batches exactly once — the custom
      // TypedImperativeAggregate's buffer round-trips the state store
      assert(streamed === batch)
    } finally q2.stop()
  }

  test("streamed max_k heap equals the batch top-k over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // values arriving out of order across batches: the per-key heap
    // must keep the global top-3, evicting batch-1 values when batch-2
    // brings larger ones
    val b1 = Seq("a" -> 5.0, "a" -> 1.0, "a" -> 9.0, "b" -> 2.0)
    val b2 = Seq("a" -> 7.0, "a" -> 3.0, "b" -> 8.0, "b" -> 4.0)
    val in = MemoryStream[(String, Double)]
    val q = Streams.streamingTopK(in.toDF().toDF("k", "v"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("topk_stream")
        .as[(String, Seq[Double])].collect().toMap
      val batch = Streams.streamingTopK((b1 ++ b2).toDF("k", "v"))
        .as[(String, Seq[Double])].collect().toMap
      assert(streamed === batch)
      assert(streamed("a") === Seq(9.0, 7.0, 5.0)) // 1 and 3 evicted
      assert(streamed("b") === Seq(8.0, 4.0, 2.0))
    } finally q.stop()
  }

  test("streamed bloom_agg bitset equals the batch bitset") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val b1 = Seq("a" -> 11L, "a" -> 42L, "b" -> 7L)
    val b2 = Seq("a" -> 99L, "b" -> 7L, "b" -> 1000L)
    val in = MemoryStream[(String, Long)]
    val q = Streams.streamingBloom(in.toDF().toDF("k", "v"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("bloom_stream")
        .as[(String, Seq[Long])].collect().toMap
      val batch = Streams.streamingBloom((b1 ++ b2).toDF("k", "v"))
        .as[(String, Seq[Long])].collect().toMap
      // bit-identical bitsets: the OR-merge path is order-insensitive
      assert(streamed === batch)
      assert(streamed("a").exists(_ != 0L)) // non-trivial index
    } finally q.stop()
  }

  test("streamed histogram equals the batch histogram and survives restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hist_ckpt").toString
    // values straddling bins, below-range and above-range clamps
    val b1 = Seq(100L, 105L, 131L, 99L, 50L)   // bins 0,0,3,0(clamped),0
    val b2 = Seq(100L, 420L, 5000L, 131L)      // 0, 31(clamped), 31, 3
    val in = MemoryStream[Long]
    def start() = Streams.streamingHistogram(in.toDF().toDF("v"), lo = 100L, width = 10L)
      .writeStream.format("memory").queryName("hist_stream")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()
    val q1 = start()
    try { in.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start() // restart: bin counts must reload from the checkpoint
    try {
      in.addData(b2: _*); q2.processAllAvailable()
      val streamed = spark.table("hist_stream")
        .as[(Long, Long)].collect().toMap
      val batch = Streams.streamingHistogram((b1 ++ b2).toDF("v"),
          lo = 100L, width = 10L)
        .as[(Long, Long)].collect().toMap
      assert(streamed === batch)
      // the merge path genuinely combined counts across batches
      assert(streamed(0L) === 5L) // 100,105,99→clamp,50→clamp,100
      assert(streamed(3L) === 2L)
      assert(streamed(31L) === 2L) // both above-range values clamp high
    } finally q2.stop()
  }

  test("funnel chunks: streamed file source equals the batch plan, keyed by content") {
    // The composed q_pipeline_chunks funnel run incrementally over the
    // real documents fixture (file source, one file per micro-batch).
    // Keeper identity differs by design (batch = min doc_id, stream =
    // first arrival), so equality is pinned on the keeper-invariant
    // surface: the (content-hash, chunk) set — identical because
    // duplicates share their text byte-for-byte.
    val fixture = "/root/testdata/sf0.001"
    val stage = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val docs = spark.read.parquet(s"$fixture/documents.parquet")
    docs.repartition(8).write.mode("overwrite").parquet(stage) // >1 micro-batch
    val docHash = docs.select(col("doc_id"), md5(col("text")).as("thash"))
    val expected = graft.llm.TextAnalysis.queries("q_pipeline_chunks")(spark, fixture)
      .join(docHash, "doc_id")
      .select("thash", "chunk_idx", "chunk_tokens", "chunk_hash")
      .as[(String, Int, Int, String)].collect().toSet
    assert(expected.nonEmpty)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = Streams.pipelineChunks(stream)
      .writeStream.format("memory").queryName("funnelchunks")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnelchunks")
        .select("thash", "chunk_idx", "chunk_tokens", "chunk_hash")
        .as[(String, Int, Int, String)].collect()
      assert(got.length == got.toSet.size) // exactly-once, no replay dup
      assert(got.toSet === expected)       // same survivors, same chunks
    } finally q.stop()
  }

  test("full incremental screen streams both arms statelessly") {
    // exact AND near arms as stream-static joins: the scan-side
    // signature makes the banding probe a stateless column join
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten eleven"
    val corpus = Seq((0L, base), (2L, other)).toDF("doc_id", "text")
    val exactIdx = corpus.groupBy(md5(col("text")).as("chash"))
      .agg(min(col("doc_id")).as("exact_match"))
    val bandIdx = graft.llm.Dedup.bandsAt(graft.llm.Dedup.shinglesOf(corpus), 4)
      .groupBy(col("band"), col("bkey"))
      .agg(min(col("doc_id")).as("cdoc"))
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalScreen(
        in.toDF().toDF("doc_id", "text"), exactIdx, bandIdx)
      .writeStream.format("memory").queryName("incrfull")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((10L, base), (11L, other + " twelve"))
      q.processAllAvailable()
      in.addData((13L, "nothing in common with anything at all here truly"))
      q.processAllAvailable()
      val got = spark.table("incrfull")
        .select("doc_id", "status")
        .as[(Long, String)].collect().toMap
      assert(got === Map(10L -> "exact_dup", 11L -> "near_dup", 13L -> "new"))
    } finally q.stop()
  }

  test("IVF ingest streams the standing-cell assignment statelessly") {
    // Train the coarse quantizer ONCE in batch, then assign arriving
    // vectors per micro-batch: row-level parity with the batch
    // assignment, zero stateful operators, and a shuffle-free plan —
    // the add-without-train ANN ingest contract.
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    def vec(seed: Int): Seq[Long] = {
      val r = new scala.util.Random(seed)
      Seq.fill(64)((r.nextInt(4001) - 2000).toLong)
    }
    val corpus = (0 until 20).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "q").withColumn("norm", expr("dot_long(q, q)"))
    val parts = graft.llm.Similarity.ivfTrainStats(corpus)
    val delta = (100 until 106).map(i => (i.toLong, vec(i)))
    val batchDf = Streams.ivfIngest(
      delta.toDF("vec_id", "q").withColumn("norm", expr("dot_long(q, q)")),
      parts)
    assert(!batchDf.queryExecution.executedPlan.toString.contains("Exchange"),
      "ingest assignment must be a pure scan-side projection")
    val batch = batchDf.select("vec_id", "cell", "cell2")
      .as[(Long, Int, Int)].collect().toSet
    val in = MemoryStream[(Long, Seq[Long])]
    val q = Streams.ivfIngest(
        in.toDF().toDF("vec_id", "q")
          .withColumn("norm", expr("dot_long(q, q)")), parts)
      .writeStream.format("memory").queryName("ivfingest")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(delta.take(3): _*)
      q.processAllAvailable()
      in.addData(delta.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("ivfingest").select("vec_id", "cell", "cell2")
        .as[(Long, Int, Int)].collect()
      assert(got.length == delta.size) // exactly-once, no replay dup
      assert(got.toSet === batch)      // row-level batch parity
      assert(q.lastProgress.stateOperators.isEmpty,
        "assignment must hold no stream state")
    } finally q.stop()
  }

  test("forget screen resolves tombstones against the standing purge index statelessly") {
    // Standing (content_hash, keeper, n_copies) index built once in
    // batch; deletion requests stream against it. Pins: (1) streamed
    // union == batch rows; (2) zero stream state; (3) flags match an
    // independent map model — unknown ids surface known=false (the
    // idempotent-delete contract), tombstoned keepers flag
    // was_keeper so the cluster re-election (q_forget_docs) triggers.
    implicit val sqlCtx = spark.sqlContext
    // docs 0/1 share text (keeper 0), 2 is unique
    val corpus = Seq((0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "delta epsilon")).toDF("doc_id", "text")
    val index = Streams.forgetIndex(corpus).localCheckpoint(true)
    val tombs = Seq(Tuple1(0L), Tuple1(2L), Tuple1(99L))
    val batch = Streams.forgetScreen(tombs.toDF("doc_id"), index)
      .as[(Long, Boolean, Option[String], Option[Long], Option[Long],
        Boolean)].collect().toSet
    val byId = batch.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 && byId(0L)._6 && byId(0L)._5.contains(2L),
      s"doc 0 is a known 2-copy keeper: ${byId(0L)}")
    assert(byId(2L)._2 && byId(2L)._6 && byId(2L)._5.contains(1L))
    assert(!byId(99L)._2 && !byId(99L)._6 && byId(99L)._3.isEmpty,
      "unknown id must resolve known=false with no payload")
    val in = MemoryStream[Tuple1[Long]]
    val q = Streams.forgetScreen(in.toDF().toDF("doc_id"), index)
      .writeStream.format("memory").queryName("forgetscreen")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(tombs.take(2): _*)
      q.processAllAvailable()
      in.addData(tombs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("forgetscreen")
        .as[(Long, Boolean, Option[String], Option[Long], Option[Long],
          Boolean)].collect().toSet
      assert(got == batch, "streamed union must equal the batch screen")
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("CDC ingest screen flags known chunks statelessly per micro-batch") {
    // Standing chunk store built once in batch; arriving docs chunk
    // and probe it. Pins: (1) streamed union == batch rows; (2) zero
    // stream state; (3) the known flags match an independent set
    // model (corpus chunk set recomputed here with collect, none of
    // the screen's join machinery).
    implicit val sqlCtx = spark.sqlContext
    val corpusDocs = (0 until 8).map(i =>
      (i.toLong, (0 until 120).map(j => s"c${(i * 131 + j * 7) % 97}")
        .mkString(" ")))
    val corpus = corpusDocs.toDF("doc_id", "text")
    val index = Streams.cdcChunkIndex(corpus).localCheckpoint(true)
    // delta: one doc recycling corpus text with a prefix edit (CDC
    // locality → mostly known), one novel doc (all new)
    val delta = Seq(
      (100L, "PAD " + corpusDocs(3)._2),
      (101L, (0 until 90).map(j => s"n$j").mkString(" ")))
    val batch = Streams.cdcIngestScreen(delta.toDF("doc_id", "text"), index)
      .as[(Long, String, Boolean)].collect().toSet
    // independent model: chunk set membership
    val corpusChunks = graft.llm.Dedup.cdcChunks(corpus)
      .select("chunk").as[String].collect().toSet
    assert(batch.forall { case (_, ch, known) =>
      known == corpusChunks.contains(ch) })
    val recycled = batch.filter(_._1 == 100L)
    assert(recycled.count(_._3) * 10 > recycled.size * 5,
      s"CDC locality lost: only ${recycled.count(_._3)}/${recycled.size} known")
    assert(batch.filter(_._1 == 101L).forall(!_._3),
      "novel doc must be all-new chunks")
    val in = MemoryStream[(Long, String)]
    val q = Streams.cdcIngestScreen(
        in.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("cdcscreen")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(delta.head)
      q.processAllAvailable()
      in.addData(delta(1))
      q.processAllAvailable()
      val got = spark.table("cdcscreen")
        .as[(Long, String, Boolean)].collect()
      assert(got.length == batch.size) // exactly-once, no replay dup
      assert(got.toSet === batch)      // row-level batch parity
      assert(q.lastProgress.stateOperators.isEmpty,
        "the screen must hold no stream state")
    } finally q.stop()
  }

  test("ANN serving ranks arriving queries against the standing index per micro-batch") {
    // The query side of the IVF lifecycle: the index (coarse stats +
    // cell-bucketed corpus) is the only standing artifact; each
    // micro-batch of query vectors is assigned and ranked through the
    // exact batch plan via foreachBatch (per-query top-k needs a rank
    // window, which append-mode streaming forbids — the
    // globalIdIngest production shape). Pins: (1) the streamed union
    // equals the one-shot batch ranking row for row; (2) replaying a
    // micro-batch re-derives byte-identical rows (no hidden state);
    // (3) every served query returns exactly k neighbors.
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    def vec(seed: Int): Seq[Long] = {
      val r = new scala.util.Random(seed)
      Seq.fill(64)((r.nextInt(4001) - 2000).toLong)
    }
    val corpus = (0 until 20).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "q").withColumn("norm", expr("dot_long(q, q)"))
    val parts = graft.llm.Similarity.ivfTrainStats(corpus)
    val cells = graft.llm.Similarity.ivfAssignWith(parts, corpus)
      .localCheckpoint(true) // the standing index, built once
    val panel = (100 until 106).map(i => (i.toLong, vec(i * 31)))
    def df(rows: Seq[(Long, Seq[Long])]) = rows.toDF("vec_id", "q")
      .withColumn("norm", expr("dot_long(q, q)"))
    def collectServe(
        d: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
      Streams.annServe(d, parts, cells, k = 3, nprobe = 2)
        .select("query_id", "rnk", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSeq
    val batch = collectServe(df(panel)).toSet
    assert(batch.groupBy(_._1).forall(_._2.size == 3),
      "every query must return exactly k neighbors")
    // replay determinism: the same micro-batch serves identical rows
    assert(collectServe(df(panel.take(3))).toSet ===
      collectServe(df(panel.take(3))).toSet)
    val got =
      scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]()
    val in = MemoryStream[(Long, Seq[Long])]
    val q = in.toDF().toDF("vec_id", "q").writeStream
      .foreachBatch { (d: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= collectServe(d.withColumn("norm", expr("dot_long(q, q)")))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(panel.take(3): _*)
      q.processAllAvailable()
      in.addData(panel.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.size == batch.size, s"${got.size} vs ${batch.size}")
    assert(got.toSet === batch,
      "streamed serving must equal the one-shot batch ranking")
  }

  test("global-ID ingest assigns dense IDs above the standing watermark per micro-batch") {
    // q_global_ids run incrementally: each micro-batch goes through
    // the EXACT batch plan (per-shard row_number + prefix-summed
    // offsets broadcast) with gids lifted above a standing watermark.
    // Pins: (1) exchange profile matches the batch query — ONE
    // SinglePartition exchange (the 32-row offsets window), never a
    // global corpus sort; (2) micro-batch 1 is row-identical to the
    // batch assignment (determinism in (delta, base)); (3) the union
    // across batches stays dense 0..N−1.
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(7L, 3L, 64L, 35L, 12L)
    val b2 = Seq(99L, 5L, 40L)
    val batchDf = Streams.globalIdIngest(b1.toDF("doc_id"), 0L)
    val p = batchDf.queryExecution.executedPlan.toString
    assert("SinglePartition".r.findAllIn(p).size == 1,
      s"offsets prefix sum must be the ONE single-partition exchange:\n$p")
    assert(p.contains("BroadcastExchange"),
      "the S-row offsets frame must broadcast, not shuffle the delta")
    val batch = batchDf.select("doc_id", "gid")
      .as[(Long, Long)].collect().toSet
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var standingMax = -1L
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("doc_id").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = Streams.globalIdIngest(df, standingMax + 1)
          .select("doc_id", "gid").as[(Long, Long)].collect()
        if (rows.nonEmpty) {
          got ++= rows
          standingMax = math.max(standingMax, rows.map(_._2).max)
        }
      }
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(got.toSet === batch,
        "micro-batch 1 must equal the batch assignment row for row")
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.map(_._1).sorted.toSeq === (b1 ++ b2).sorted,
      "every arriving doc gets exactly one id")
    assert(got.map(_._2).sorted.toSeq === (0L until (b1.size + b2.size)).toSeq,
      "ids stay dense across micro-batches")
  }

  test("global-ID ingest watermark survives a restart (sink-derived base)") {
    // The standing max must come from DURABLE state, not driver
    // memory: base = max gid already in the parquet sink. A restart
    // from the checkpoint then continues the dense sequence instead
    // of re-issuing ids from 0 — the deploy-safe contract.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gid_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_gid_out").toString
    val in = MemoryStream[Long]
    def start() = in.toDF().toDF("doc_id").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val base = 1L + (scala.util.Try(spark.read.parquet(out)
          .agg(max(col("gid"))).as[Option[Long]].head)
          .getOrElse(None): Option[Long]).getOrElse(-1L)
        Streams.globalIdIngest(df, base)
          .write.mode("append").parquet(out)
      }
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      in.addData(10L, 20L, 30L)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // restart from the same checkpoint
    try {
      in.addData(40L, 50L)
      q2.processAllAvailable()
    } finally q2.stop()
    val sink = spark.read.parquet(out).select("doc_id", "gid")
      .as[(Long, Long)].collect()
    assert(sink.map(_._1).sorted.toSeq === Seq(10L, 20L, 30L, 40L, 50L))
    assert(sink.map(_._2).sorted.toSeq === (0L until 5L).toSeq,
      "post-restart ids must continue the dense sequence, not restart at 0")
  }

  test("PSI monitor scores each micro-batch against the standing reference histogram") {
    // The q_drift_psi arithmetic run per micro-batch against a
    // standing (literal) reference histogram — PSI needs whole-batch
    // totals, so the production shape is foreachBatch (the
    // globalIdIngest pattern). Pins: batch parity (a micro-batch
    // scores identically to the same frame through the batch path),
    // and the verdict flips when a batch's length distribution
    // genuinely shifts.
    implicit val sqlCtx = spark.sqlContext
    def text(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val refCounts = Seq.tabulate(24)(i => text(10 + (i % 5) * 16))
      .toDF("text")
      .select(expr(graft.ops.Analytics.psiTokenBin).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c_ref"))
      .as[(Long, Long)].collect().toSeq
    val b1 = Seq.tabulate(12)(i => text(10 + (i % 5) * 16)) // ref-shaped
    val b2 = Seq.fill(12)(text(120))                        // all bin 7
    val batch1 = Streams.psiMonitor(b1.toDF("text"), refCounts)
      .orderBy("bin").as[(Long, Long, Long, Double, Double, String)]
      .collect().toSeq
    val results = scala.collection.mutable
      .Map[Long, Seq[(Long, Long, Long, Double, Double, String)]]()
    val in = MemoryStream[String]
    val q = in.toDF().toDF("text").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        results(id) = Streams.psiMonitor(df, refCounts)
          .orderBy("bin").as[(Long, Long, Long, Double, Double, String)]
          .collect().toSeq
      }
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(results(0) == batch1, "micro-batch must score exactly as batch")
    assert(results(0).forall(_._6 == "stable"),
      s"a ref-shaped batch must read stable: ${results(0)}")
    assert(results(1).forall(_._6 == "shifted"),
      s"an all-long batch must flag: ${results(1)}")
  }

  test("C4 line gate streams the rule stage statelessly and agrees with the batch recipe") {
    // the in-row form must (1) plan with no Exchange, (2) stream with
    // no state and exact batch parity, and (3) agree per-doc with
    // q_c4_clean's exploded n_drop_rule on page-ok docs (the batch
    // recipe reports rule drops only for surviving pages)
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val batchDf = Streams.c4Gate(docs)
    assert(!batchDf.queryExecution.executedPlan.toString.contains("Exchange"),
      "gate must be a pure scan-side projection")
    val batch = batchDf.select("doc_id", "n_drop_rule", "page_bad")
      .as[(Long, Long, Boolean)].collect()
    val full = graft.ops.TextOps.queries("q_c4_clean")(spark, sf)
      .select("doc_id", "n_drop_rule")
      .as[(Long, Long)].collect().toMap
    batch.filter(!_._3).foreach { case (id, nd, _) =>
      assert(full(id) == nd, s"doc $id: gate $nd vs recipe ${full(id)}")
    }
    val in = MemoryStream[(Long, String)]
    val q = Streams.c4Gate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("c4gate")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.select("doc_id", "text")
        .as[(Long, String)].collect().take(40)
      in.addData(rows.take(15).toSeq: _*)
      q.processAllAvailable()
      in.addData(rows.drop(15).toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("c4gate")
        .select("doc_id", "n_drop_rule", "page_bad")
        .as[(Long, Long, Boolean)].collect()
      assert(got.length == 40)
      val want = batch.map(r => r._1 -> r).toMap
      got.foreach(r => assert(want(r._1) === r, s"stream mismatch: $r"))
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("URL-filter and robots gates stream statelessly and agree with the batch census") {
    // both crawl-frontier gates must (1) plan with no Exchange (pure
    // scan projections), (2) stream with no state and exact per-doc
    // batch parity, and (3) roll up to exactly the registered census
    // rows when the consumer groupBys the streamed decisions
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val urlBatch = Streams.urlFilterGate(docs)
    val robBatch = Streams.robotsGate(docs)
    for ((df, n) <- Seq((urlBatch, "url"), (robBatch, "robots")))
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
        s"$n gate must be a pure scan-side projection")
    // census parity: consumer rollup == the registered gated queries
    val urlCensus = urlBatch.groupBy("reason")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon")).as("n_urls"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val urlWant = graft.llm.Dedup.queries("q_url_filter")(spark, sf)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(urlCensus.toSeq == urlWant.toSeq, "url census mismatch")
    val urlRows = urlBatch.select("doc_id", "reason")
      .as[(Long, String)].collect().toMap
    val robRows = robBatch.select("doc_id", "domain", "disallow", "blocked")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val in = MemoryStream[(Long, String)]
    val src = in.toDF().toDF("doc_id", "text")
    val qu = Streams.urlFilterGate(src)
      .writeStream.format("memory").queryName("urlgate")
      .outputMode(OutputMode.Append()).start()
    val qr = Streams.robotsGate(src)
      .writeStream.format("memory").queryName("robgate")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.select("doc_id", "text")
        .as[(Long, String)].collect().take(40)
      in.addData(rows.take(15).toSeq: _*)
      qu.processAllAvailable(); qr.processAllAvailable()
      in.addData(rows.drop(15).toSeq: _*)
      qu.processAllAvailable(); qr.processAllAvailable()
      val gotU = spark.table("urlgate").select("doc_id", "reason")
        .as[(Long, String)].collect()
      assert(gotU.length == 40)
      gotU.foreach { case (id, r) =>
        assert(urlRows(id) == r, s"url stream mismatch: doc $id") }
      val gotR = spark.table("robgate")
        .select("doc_id", "domain", "disallow", "blocked")
        .as[(Long, String, String, Boolean)].collect()
      assert(gotR.length == 40)
      gotR.foreach(r =>
        assert(robRows(r._1) == r, s"robots stream mismatch: doc ${r._1}"))
      assert(qu.lastProgress.stateOperators.isEmpty)
      assert(qr.lastProgress.stateOperators.isEmpty)
    } finally { qu.stop(); qr.stop() }
  }

  test("LR gate streams the standing-weight scoring statelessly") {
    // train in batch on the separable corpus (aa=en / bb=de — the
    // TextAnalysisSpec fixture), redeploy the 17-long artifact on a
    // stream: per-row fold features must reproduce the batch
    // explode+groupBy probabilities exactly, with no state and no
    // exchange in the plan.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lrgate").toString
    Seq((1L, "aa aa aa", "en"), (2L, "aa aa aa", "en"), (3L, "aa aa aa", "en"),
      (5L, "bb bb bb", "de"), (6L, "bb bb bb", "de"), (7L, "bb bb bb", "de"))
      .map { case (id, t, l) => (id, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = graft.llm.TextAnalysis.lrTrainedWeights(spark, docs)
    assert(w.size == 17 && w.exists(_ != 0L))
    val batchDf = Streams.lrGate(docs, w)
    assert(!batchDf.queryExecution.executedPlan.toString.contains("Exchange"),
      "gate must be a pure scan-side projection")
    val batch = batchDf.select("doc_id", "lr_p", "keep")
      .as[(Long, Double, Boolean)].collect().toSet
    assert(batch.forall { case (id, _, keep) => keep == (id <= 3) },
      s"separable corpus must gate by class: $batch")
    val in = MemoryStream[(Long, String)]
    val q = Streams.lrGate(in.toDF().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("lrgate")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, "aa aa aa"), (5L, "bb bb bb"))
      q.processAllAvailable()
      in.addData((2L, "aa aa aa"), (6L, "bb bb bb"), (3L, "aa aa aa"),
        (7L, "bb bb bb"))
      q.processAllAvailable()
      val got = spark.table("lrgate").select("doc_id", "lr_p", "keep")
        .as[(Long, Double, Boolean)].collect()
      assert(got.length == 6)              // exactly-once
      assert(got.toSet === batch)          // row-level batch parity
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("funnel keeper state survives a checkpoint restart") {
    // The dropDuplicates keeper state must round-trip the state store:
    // a post-restart document that duplicates a pre-restart one must
    // be suppressed, not re-chunked — the exactly-once guarantee a
    // continuous ingest depends on across deploys.
    // memory sink refuses append-mode recovery — the parquet FILE sink
    // is the fault-tolerant one (and the sink a real ingest writes)
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_funnel_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_funnel_out").toString
    val in = MemoryStream[(Long, String)]
    // enough tokens for quality >= 0.5, 'the'/'a' for the en argmax
    def text(tag: String) =
      s"the a $tag " + (0 until 17).map(i => s"tok$tag$i").mkString(" ")
    def start() = Streams.pipelineChunks(
        in.toDF().toDF("doc_id", "text"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      in.addData((0L, text("A")), (1L, text("B")))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // restart from the same checkpoint
    try {
      in.addData((2L, text("A")), (3L, text("C"))) // doc 2 = dup of doc 0
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("doc_id", "chunk_idx", "chunk_hash")
        .as[(Long, Int, String)].collect()
      assert(got.map(_._1).distinct.sorted.toSeq === Seq(0L, 1L, 3L),
        "the post-restart duplicate must be suppressed by restored state")
      assert(got.length == got.toSet.size) // no replay doubling either
    } finally q2.stop()
  }

  test("runningUserCounts keeps per-key state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = Streams.runningUserCounts(in.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData((1L, 10L), (1L, 11L), (2L, 20L)); q.processAllAvailable()
      in.addData((1L, 12L)); q.processAllAvailable()
      val last = spark.table("running").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      // user 1 saw 2 then 3 cumulative; user 2 saw 1.
      assert(last === Map(1L -> 3L, 2L -> 1L))
    } finally q.stop()
  }

  test("streamed .jsonl.zst ingest equals the batch record fan-out, zero state, checkpointed restart") {
    // the compressed-JSONL front door streamed: blobs fan out to JSON
    // records through the same stateless flatMap as q_zstd_jsonl's
    // transport stage — parity covers multi-record fan-out, the
    // skippable-frame walk, and the truncation arm; the checkpointed
    // restart pins exactly-once across a stop/start.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.llm.{BinaryDoc, Multimodal}
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine ten",
      "packed records ride compressed jsonl shards end to end")
    val blobsData = (0 until 36).map { i =>
      val t = texts(i % texts.length) + s" tail$i"
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jz-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString
      (i.toLong, Multimodal.zstdJsonlBlob(t, h))
    }
    val batch = Multimodal.zstdJsonlFanout(
        blobsData.toDF("doc_id", "payload").as[BinaryDoc])
      .as[(Long, String, Int, Option[String], Option[Int], Option[String])]
      .collect().toSet
    assert(batch.exists(_._2 == "truncated"), "no truncation arm")
    assert(batch.exists(_._3 == 2), "no skippable-frame blob")
    assert(batch.groupBy(_._1).exists(_._2.size >= 2),
      "no multi-record fan-out")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_jz_ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_jz_out").toString
    val in = MemoryStream[(Long, Array[Byte])]
    def start() = Streams.zstdJsonlIngest(
        in.toDS().map { case (id, p) => BinaryDoc(id, p) })
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val (h1, h2) = blobsData.splitAt(18)
    val q1 = start()
    try {
      in.addData(h1: _*); q1.processAllAvailable()
      assert(q1.lastProgress.stateOperators.isEmpty, "zero state")
    } finally q1.stop()
    val q2 = start() // restart from the same checkpoint
    try { in.addData(h2: _*); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(out)
      .as[(Long, String, Int, Option[String], Option[Int], Option[String])]
      .collect()
    assert(got.length == batch.size,
      "exactly-once across the restart — no replay doubling")
    assert(got.toSet == batch, "streamed records == batch records row for row")
  }

  test("contamination screen: stream-static broadcast over standing benchmark fps, zero state, checkpointed restart") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf, "documents")
    // the standing artifact: benchmark fps computed once in batch and
    // LOADED (a local frame here — at deployment a read of the stored
    // table); only then is the stream side provably shuffle-free.
    // Deliberately NOT deduped: fingerprintsOn is per-doc distinct
    // only, so this multi-doc artifact repeats shared fps — the
    // screen's own static-side distinct must absorb them to keep the
    // one-row-per-shared-fp contract (r18 advice finding).
    val bench = graft.llm.TextAnalysis.fingerprintsOn(
      docs.filter(col("doc_id") < 10)).select("fp")
      .as[String].collect().toSeq.toDF("fp")
    assert(bench.count() > bench.distinct().count(),
      "fixture must contain duplicate benchmark fps to exercise the screen's dedup")
    val corpus = docs.filter(col("doc_id") >= 10).select("doc_id", "text")
    val batchDf = Streams.contaminationScreen(corpus, bench)
    // scale shape: the CORPUS side must never shuffle — the benchmark
    // fingerprint set is the broadcast build side (whose static-side
    // distinct may exchange its own tiny frame), the fingerprint
    // generate stays fused into the scan
    locally {
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val sp = batchDf.queryExecution.sparkPlan
      val bhj = sp.collectFirst { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, s"screen must broadcast the benchmark side:\n$sp")
      val streamShuffles =
        bhj.get.left.collect { case e: ShuffleExchangeExec => e }
      assert(streamShuffles.isEmpty,
        s"corpus side must not shuffle:\n$sp")
    }
    val want = batchDf.as[(Long, String)].collect().toSet
    assert(want.nonEmpty, "fixture must contain contaminated docs")
    // the screen's doc set IS the registered report's corpus_doc set
    val reportDocs = graft.llm.TextAnalysis
      .queries("q_contamination")(spark, sf)
      .select("corpus_doc").distinct().as[Long].collect().toSet
    assert(want.map(_._1) == reportDocs,
      "screen hits must flag exactly the q_contamination docs")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_contam_ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_contam_out").toString
    val in = MemoryStream[(Long, String)]
    def start() = Streams.contaminationScreen(
        in.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val rows = corpus.as[(Long, String)].collect()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val q1 = start()
    try {
      in.addData(h1.toSeq: _*); q1.processAllAvailable()
      assert(q1.lastProgress.stateOperators.isEmpty, "zero state")
    } finally q1.stop()
    val q2 = start() // restart from the same checkpoint
    try { in.addData(h2.toSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(out).as[(Long, String)].collect()
    assert(got.length == want.size,
      "exactly-once across the restart — no replay doubling")
    assert(got.toSet == want, "streamed hits == batch hits row for row")
  }
}

object StreamsSpec {
  /** Top-level (not nested in the suite class): a case class inside the
    * spec instance makes the Dataset encoder's generated code reference
    * the enclosing instance, which Janino can't compile — Spark falls
    * back to interpreted projections for every streaming test batch. */
  private[streaming] case class Ev(event_id: Long, ts: Timestamp,
    user_id: Long, event_type: String, value: Double)
}

/** The multimodal decode stage under Structured Streaming: the decoder
  * is a stateless typed mapPartitions, so the SAME function runs
  * unchanged on a stream — the property that lets a 100 TB ingest
  * decode incrementally. Pinned by row-level parity with the batch
  * decode over identical payloads, failure arms included. */
class StreamedDecodeSpec extends graft.SparkSuite {
  import graft.llm.{BinaryDoc, Multimodal}
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.streaming.OutputMode

  test("streamed QOI decode equals the batch decode, arm for arm") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // md5-style hexes covering ok / bad-magic / unsupported / truncated
    val hexes = (0 until 40).map { i =>
      val h = Integer.toHexString(i)
      (i.toLong, (h + "0123456789abcdef0123456789abcdef").substring(0, 32))
    }
    val batch = Multimodal.decodeQoi(
        spark.createDataset(hexes.map { case (id, h) => BinaryDoc(id, Multimodal.qoiBytes(h)) }))
      .collect().toSet
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.decodeQoi(
        in.toDS().map { case (id, h) => BinaryDoc(id, Multimodal.qoiBytes(h)) })
      .writeStream.format("memory").queryName("qoi_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(hexes.take(20): _*); q.processAllAvailable()
      in.addData(hexes.drop(20): _*); q.processAllAvailable()
      val got = spark.table("qoi_stream")
        .as[graft.llm.QoiMeta].collect().toSet
      assert(got.nonEmpty)
      assert(got == batch)
      assert(got.map(_.status).intersect(Set("ok")).nonEmpty)
    } finally q.stop()
  }

  test("streamed PDF extraction equals the batch extraction, arm for arm") {
    // the twelfth decoder streams like the rest: synth + xref walk +
    // inflate + Tj/TJ tokenizer are one stateless mapPartitions, so
    // pdfExtractStats runs UNCHANGED per micro-batch — parity covers
    // every failure arm and the extracted-text md5s
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().take(40)
    val batch = Multimodal.pdfExtractStats(
        docs.toSeq.toDF("doc_id", "text"))
      .as[graft.llm.PdfMeta].collect().toSet
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.pdfExtractStats(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pdf_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docs.take(15).toSeq: _*); q.processAllAvailable()
      in.addData(docs.drop(15).toSeq: _*); q.processAllAvailable()
      val got = spark.table("pdf_stream")
        .as[graft.llm.PdfMeta].collect().toSet
      assert(got.size == 40)
      assert(got == batch)
      assert(got.exists(_.status == "ok") &&
        got.exists(_.status != "ok"), "arms must be represented")
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streamed zstd ingest equals the batch ingest, arm for arm") {
    // the thirteenth decoder streams like the rest: synth + frame
    // walk (FSE/Huffman/sequences/xxh64) are one stateless
    // mapPartitions, so zstdIngestStats runs UNCHANGED per
    // micro-batch — parity covers every failure arm and content md5s
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().take(40)
    val batch = Multimodal.zstdIngestStats(
        docs.toSeq.toDF("doc_id", "text"))
      .as[graft.llm.ZstdMeta].collect().toSet
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.zstdIngestStats(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("zstd_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docs.take(15).toSeq: _*); q.processAllAvailable()
      in.addData(docs.drop(15).toSeq: _*); q.processAllAvailable()
      val got = spark.table("zstd_stream")
        .as[graft.llm.ZstdMeta].collect().toSet
      assert(got.size == 40)
      assert(got == batch)
      assert(got.exists(_.status == "ok") &&
        got.exists(_.status != "ok"), "arms must be represented")
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streamed WARC record parse equals the batch parse, URIs included") {
    // the crawl front-door's decode+extract stage is stateless, so the
    // SAME parseWarc runs unchanged on a stream — incremental ingest of
    // new crawl records needs no batch re-run; parity covers the
    // failure arms AND the extracted canonical-input URLs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // genuine md5s, not a synthetic hex pattern: the failure arms key
    // off tail digits a shared-suffix panel would hold constant
    val hexes = (0 until 40).map { i =>
      (i.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(s"warc-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    val batch = hexes.map { case (id, h) =>
      Multimodal.parseWarc(id, Multimodal.warcBytes(h))
    }.toSet
    val in = MemoryStream[(Long, String)]
    val q = in.toDS()
      .map { case (id, h) => Multimodal.parseWarc(id, Multimodal.warcBytes(h)) }
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(hexes.take(20): _*); q.processAllAvailable()
      in.addData(hexes.drop(20): _*); q.processAllAvailable()
      val got = spark.table("warc_stream")
        .as[graft.llm.WarcMeta].collect().toSet
      assert(got == batch)
      assert(got.exists(m => m.status == "ok" && m.url.isDefined))
      assert(got.exists(_.status != "ok"), "no failure arm in the panel")
    } finally q.stop()
  }

  test("streamed HTML extraction equals the batch extraction, arm for arm") {
    // the WARC-to-text markup strip is a stateless per-row map, so the
    // SAME parseHtml runs unchanged on a stream — continuous crawl
    // ingest extracts content without a batch re-run; parity covers
    // the script/comment skips, the no_markup dispatch, the truncation
    // arm, and the boilerplate filter's kept-hash
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      val t = (0 to i % 9).map(j => s"w$j$i").mkString(" ")
      (i.toLong, t, java.security.MessageDigest.getInstance("MD5")
        .digest(s"html-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    val batch = rows.map { case (id, t, h) =>
      Multimodal.parseHtml(id, Multimodal.htmlOf(t, h))
    }.toSet
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDS()
      .map { case (id, t, h) =>
        Multimodal.parseHtml(id, Multimodal.htmlOf(t, h)) }
      .writeStream.format("memory").queryName("html_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(rows.take(20): _*); q.processAllAvailable()
      in.addData(rows.drop(20): _*); q.processAllAvailable()
      val got = spark.table("html_stream")
        .as[graft.llm.HtmlExtract].collect().toSet
      assert(got == batch)
      assert(got.exists(r => r.status == "ok" && r.kept_hash.isDefined))
      assert(got.exists(_.n_kept == 0), "no boilerplate-only page in the panel")
    } finally q.stop()
  }

  test("streamed ZIP archive ingest equals the batch member fan-out, arm for arm") {
    // The 1→N container walk is a stateless per-partition flatMap, so
    // the SAME decodeZip runs unchanged on a stream — each arriving
    // archive blob fans out to one row PER MEMBER inside its
    // micro-batch; parity covers healthy multi-member archives and
    // every container- and member-level failure arm.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hexes = (0 until 48).map { i =>
      (i.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(s"zip-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    val batch = hexes.flatMap { case (id, h) =>
      Multimodal.parseZip(id, Multimodal.zipBytes(h))
    }.toSet
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.decodeZip(
        in.toDS().map { case (id, h) => BinaryDoc(id, Multimodal.zipBytes(h)) })
      .writeStream.format("memory").queryName("zip_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(hexes.take(24): _*); q.processAllAvailable()
      in.addData(hexes.drop(24): _*); q.processAllAvailable()
      val got = spark.table("zip_stream")
        .as[graft.llm.ZipMember].collect()
      assert(got.length == got.toSet.size, "fan-out must not replay-duplicate")
      assert(got.toSet == batch)
      assert(got.exists(m => m.status == "ok" && m.member >= 1),
        "no multi-member archive in the panel")
      assert(got.exists(_.member == -1), "no container-level failure arm")
      assert(got.exists(m => m.status == "bad_data" && m.member >= 0),
        "no member-level CRC arm")
    } finally q.stop()
  }

  test("archive-member dedup screen: container fan-out + full screen, stateless batch parity") {
    // The composed crawl front door: archive blobs fan out to member
    // texts (decodeZipText's flatMap) which flow straight through the
    // exact + LSH screen's stream-static joins against the standing
    // corpus index — one stateless stream, no unpack staging. The
    // standing index holds the members of the first 20 archives; the
    // stream replays archives 10..39, so members 10..19 must come back
    // exact_dup and the rest new — with row-level batch parity.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hexes = (0 until 40).map { i =>
      (i.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(s"amd-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    val corpus = hexes.take(20).flatMap { case (id, h) =>
      Multimodal.parseZipText(id, Multimodal.zipBytes(h))
    }.collect { case m if m.status == "ok" =>
      (m.doc_id * 65536L + m.member, m.text.get)
    }.toDF("doc_id", "text")
    val exactIdx = corpus.groupBy(md5(col("text")).as("chash"))
      .agg(min(col("doc_id")).as("exact_match"))
    val bandIdx = graft.llm.Dedup.bandsAt(graft.llm.Dedup.shinglesOf(corpus), 4)
      .groupBy(col("band"), col("bkey"))
      .agg(min(col("doc_id")).as("cdoc"))
    val streamed = hexes.drop(10)
    val batch = Streams.archiveMemberScreen(
        streamed.toDF("doc_id", "h").as[(Long, String)]
          .map { case (id, h) => BinaryDoc(id, Multimodal.zipBytes(h)) },
        exactIdx, bandIdx)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(batch.exists(_._2 == "exact_dup"), "no exact arm in the panel")
    assert(batch.exists(_._2 == "new"), "no new arm in the panel")
    val in = MemoryStream[(Long, String)]
    val q = Streams.archiveMemberScreen(
        in.toDS().map { case (id, h) => BinaryDoc(id, Multimodal.zipBytes(h)) },
        exactIdx, bandIdx)
      .writeStream.format("memory").queryName("amd_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(streamed.take(15): _*); q.processAllAvailable()
      in.addData(streamed.drop(15): _*); q.processAllAvailable()
      val got = spark.table("amd_stream")
        .as[(Long, String, Option[Long])].collect()
      assert(got.length == got.toSet.size, "fan-out must not replay-duplicate")
      assert(got.toSet == batch)
      assert(q.lastProgress.stateOperators.isEmpty,
        "the composed screen must hold no stream state")
    } finally q.stop()
  }

  test("streamed TAR archive ingest equals the batch member fan-out, arm for arm") {
    // Second 1→N container, same stateless-flatMap contract as the
    // ZIP twin: decodeTar runs unchanged per micro-batch; parity
    // covers multi-member archives, the prefix-joined ustar name, and
    // the container- and header-level stop-with-a-row arms.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hexes = (0 until 48).map { i =>
      (i.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(s"tar-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    val batch = hexes.flatMap { case (id, h) =>
      Multimodal.parseTar(id, Multimodal.tarBytes(h))
    }.toSet
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.decodeTar(
        in.toDS().map { case (id, h) => BinaryDoc(id, Multimodal.tarBytes(h)) })
      .writeStream.format("memory").queryName("tar_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(hexes.take(24): _*); q.processAllAvailable()
      in.addData(hexes.drop(24): _*); q.processAllAvailable()
      val got = spark.table("tar_stream")
        .as[graft.llm.TarMember].collect()
      assert(got.length == got.toSet.size, "fan-out must not replay-duplicate")
      assert(got.toSet == batch)
      assert(got.exists(m => m.status == "ok" && m.member >= 1),
        "no multi-member archive in the panel")
      assert(got.exists(m => m.status == "ok" && m.name.exists(_.contains("/"))),
        "no prefix-joined ustar name in the panel")
      assert(got.exists(m => m.member == -1 || m.status == "bad_checksum" ||
        m.status == "short_data"), "no failure arm in the panel")
    } finally q.stop()
  }

  test("streamed .tar.gz ingest equals the batch layered walk, arm for arm") {
    // the LAYERED container (gzip transport around ustar) is still one
    // stateless flatMap — inflate and walk run inside the same task
    // per micro-batch, so the plan streams unchanged; parity covers
    // the gzip_-prefixed transport arms AND the inner tar arms
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hexes = (0 until 48).map { i =>
      (i.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(s"tgz-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    val batch = hexes.flatMap { case (id, h) =>
      Multimodal.parseTgz(id, Multimodal.tgzBytes(h))
    }.toSet
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.decodeTgz(
        in.toDS().map { case (id, h) => BinaryDoc(id, Multimodal.tgzBytes(h)) })
      .writeStream.format("memory").queryName("tgz_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(hexes.take(24): _*); q.processAllAvailable()
      in.addData(hexes.drop(24): _*); q.processAllAvailable()
      val got = spark.table("tgz_stream")
        .as[graft.llm.TarMember].collect()
      assert(got.length == got.toSet.size, "fan-out must not replay-duplicate")
      assert(got.toSet == batch)
      assert(got.exists(m => m.status == "ok" && m.member >= 1),
        "no multi-member archive in the panel")
      assert(got.exists(_.status.startsWith("gzip_")),
        "no transport-layer arm in the panel")
    } finally q.stop()
  }

  test("streamed JPEG decode equals the batch decode, arm for arm") {
    // Eleventh decoder under the same stateless-mapPartitions
    // contract: parseJpeg runs unchanged per micro-batch; parity
    // covers ok (exact sums), bad_magic, unsupported (SOF2 with
    // header dims), and truncated arms.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hexes = (0 until 48).map { i =>
      (i.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(s"jpeg-stream-$i".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString)
    }
    val batch = hexes.map { case (id, h) =>
      Multimodal.parseJpeg(id, Multimodal.jpegBytes(h))
    }.toSet
    assert(batch.map(_.status).intersect(
      Set("ok", "bad_magic", "unsupported", "truncated")).size >= 3,
      s"panel arms too thin: ${batch.map(_.status)}")
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.decodeJpeg(
        in.toDS().map { case (id, h) => BinaryDoc(id, Multimodal.jpegBytes(h)) })
      .writeStream.format("memory").queryName("jpeg_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(hexes.take(24): _*); q.processAllAvailable()
      in.addData(hexes.drop(24): _*); q.processAllAvailable()
      val got = spark.table("jpeg_stream")
        .as[graft.llm.JpegMeta].collect()
      assert(got.toSet == batch)
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streamed image near-dup screen: batch parity, independent model, stateless") {
    // decode -> dHash -> band probe -> Hamming verify, stream-static
    // against the standing band index. The expectation is computed by
    // an INDEPENDENT local model (dhashPpm + the band split + the
    // Hamming rule in plain Scala), so parity covers the whole
    // composed screen, not just stream-vs-batch plumbing.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ppm(seed: Int): Array[Byte] = {
      val hdr = "P6\n4 4\n255\n".getBytes("US-ASCII")
      hdr ++ Array.tabulate(4 * 4 * 3)(i => ((seed * 7 + i * 13) % 256).toByte)
    }
    val corpus = (0L until 20L).map(id => BinaryDoc(id, ppm(id.toInt)))
    val bandIdx = Streams.imageBandIndex(corpus.toDS()).persist()
    bandIdx.count()
    // delta: one exact copy, one near copy (single pixel nudged), one
    // fresh image, one undecodable blob
    val nearBytes = ppm(5).clone(); nearBytes(20) = (nearBytes(20) + 40).toByte
    val delta = Seq(
      BinaryDoc(103L, ppm(3)),
      BinaryDoc(105L, nearBytes),
      BinaryDoc(110L, ppm(110)),
      BinaryDoc(120L, "notappm".getBytes("US-ASCII")))
    // independent model
    def bands(hi: Long, lo: Long): Seq[Long] =
      Seq(lo % 65536L, lo >> 16, hi % 65536L, hi >> 16)
    val corpusH = corpus.map(d => Multimodal.dhashPpm(d.doc_id, d.payload))
      .filter(_.status == "ok")
    val expected: Set[(Long, String, Option[Int], Option[Long], Option[Int])] =
      delta.flatMap { d =>
        val m = Multimodal.dhashPpm(d.doc_id, d.payload)
        if (m.status != "ok")
          Seq((d.doc_id, m.status, None, None, None))
        else for {
          c <- corpusH
          g <- 0 to 3
          if bands(m.dhash_hi.get, m.dhash_lo.get)(g) ==
            bands(c.dhash_hi.get, c.dhash_lo.get)(g)
          hd = java.lang.Long.bitCount(m.dhash_lo.get ^ c.dhash_lo.get) +
            java.lang.Long.bitCount(m.dhash_hi.get ^ c.dhash_hi.get)
          if hd <= 8 && d.doc_id != c.doc_id
        } yield (d.doc_id, "near_dup", Some(g), Some(c.doc_id), Some(hd))
      }.toSet
    assert(expected.exists(e => e._1 == 103L && e._5.contains(0)),
      "the exact copy must verify at hamming 0")
    assert(expected.exists(_._2 == "bad_magic"), "undecodable arm missing")
    val batch = Streams.imageNearDupScreen(delta.toDS(), bandIdx)
      .as[(Long, String, Option[Int], Option[Long], Option[Int])]
      .collect().toSet
    assert(batch == expected, s"batch screen != model:\n$batch\n$expected")
    val in = MemoryStream[Long]
    val byId = delta.map(d => d.doc_id -> d).toMap
    val q = Streams.imageNearDupScreen(in.toDS().map(byId(_)), bandIdx)
      .writeStream.format("memory").queryName("img_near_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(103L, 105L); q.processAllAvailable()
      in.addData(110L, 120L); q.processAllAvailable()
      val got = spark.table("img_near_stream")
        .as[(Long, String, Option[Int], Option[Long], Option[Int])]
        .collect()
      assert(got.length == got.toSet.size, "no replay duplicates")
      assert(got.toSet == expected)
      assert(q.lastProgress.stateOperators.isEmpty,
        "the screen must hold no stream state")
    } finally q.stop()
    bandIdx.unpersist(false)
  }

  test("streamed image near-dup screen continues across a restart (checkpointed)") {
    // stop after chunk 1, restart from the same checkpoint, feed
    // chunk 2: the parquet sink must hold each chunk's evidence
    // exactly once — no replays, no losses.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ppm(seed: Int): Array[Byte] = {
      val hdr = "P6\n4 4\n255\n".getBytes("US-ASCII")
      hdr ++ Array.tabulate(4 * 4 * 3)(i => ((seed * 7 + i * 13) % 256).toByte)
    }
    val corpus = (0L until 10L).map(id => BinaryDoc(id, ppm(id.toInt)))
    val bandIdx = Streams.imageBandIndex(corpus.toDS())
    val byId = (100L to 103L).map(id =>
      id -> BinaryDoc(id, ppm((id % 10L).toInt))).toMap
    val ckpt = java.nio.file.Files.createTempDirectory("graft_img_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_img_out").toString
    val in = MemoryStream[Long]
    def start() = Streams.imageNearDupScreen(in.toDS().map(byId(_)), bandIdx)
      .writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try { in.addData(100L, 101L); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { in.addData(102L, 103L); q2.processAllAvailable() } finally q2.stop()
    val sink = spark.read.parquet(out)
      .as[(Long, String, Option[Int], Option[Long], Option[Int])]
      .collect()
    val batch = Streams.imageNearDupScreen(
        byId.values.toSeq.toDS(), bandIdx)
      .as[(Long, String, Option[Int], Option[Long], Option[Int])]
      .collect().toSet
    assert(sink.length == sink.toSet.size, "restart must not replay evidence")
    assert(sink.toSet == batch,
      "post-restart union must equal the batch screen of all chunks")
  }
}
