package graft

import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingAnalyticsSpec extends SparkTestBase {

  private def ev(userId: Long, minute: Long, typ: String = "click", v: Double = 1.0) =
    Event(userId, typ, new Timestamp(minute * 60000L), v)

  test("watermarked hourly window aggregates per event type") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[Event]
    val q = StreamingAnalytics
      .hourlyWindowCounts(source.toDF()
        .toDF("user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("win").outputMode(OutputMode.Update())
      .start()
    try {
      source.addData(ev(1, 5), ev(2, 20), ev(1, 65), ev(3, 70, "view", 2.5))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("win").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
      .sorted
    assert(out.toSeq === Seq((0L, "click", 2L), (60L, "click", 1L), (60L, "view", 1L)))
  }

  test("stream-stream interval join matches right events inside the window, " +
    "per user, and drops the rest") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = StreamingAnalytics.intervalJoin(
      views.toDF().toDF("user_id", "event_type", "ts", "value"),
      buys.toDF().toDF("user_id", "event_type", "ts", "value"),
      windowMillis = 10L * 60 * 1000)
      .writeStream.format("memory").queryName("ij").outputMode(OutputMode.Append())
      .start()
    try {
      // Times sit well past the epoch: the join's state watermark is
      // clamped at 0, so epoch-adjacent event times read as already-late
      // and never match (a real deployment never sees 1970 timestamps).
      views.addData(ev(1, 1000, "view"), ev(2, 1000, "view"))
      // user 1 buys inside the 10-minute window; a second buy outside it;
      // user 2's buy is in-window but a different user's view must not
      // match; user 3 buys with no view at all.
      buys.addData(ev(1, 1005, "buy", 9.99), ev(1, 1020, "buy", 5.0),
        ev(2, 1008, "buy", 3.0), ev(3, 1002, "buy", 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("ij").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime / 60000,
        r.getTimestamp(4).getTime / 60000, r.getDouble(5)))
      .sorted
    assert(out.toSeq === Seq((1L, 1000L, 1005L, 9.99), (2L, 1000L, 1008L, 3.0)))
  }

  test("streaming file-source window agg equals the batch aggregation " +
    "(lambda parity on the driver's events data)") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val schema = graft.queries.TemporalQueries.EventsSchemaTsRaw
    // The streaming reader long-reads the physical int64; normalize to ns
    // with the same footer-detected tick the batch entry point uses.
    val tick = graft.queries.TemporalQueries.tsNanosPerTick(s, s"$dir/events.parquet")
    def prep(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("ts"), col("value"))
    // The file stream source wants a directory: stream the sf dir with a
    // glob selecting just the events table.
    val stream = prep(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .withColumn("ts", col("ts") * lit(tick)))
    val q = StreamingAnalytics.hourlyWindowCounts(stream, watermark = "1 hour")
      .writeStream.format("memory").queryName("parity")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    // Update-mode memory sink may hold multiple versions per key: take the
    // last update per (window, type).
    val streamed = spark.table("parity").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap // later rows overwrite earlier versions
    val batch = StreamingAnalytics
      .hourlyWindowCounts(prep(graft.queries.TemporalQueries.eventsWithTs(s, dir)))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (k, (n, sum)) =>
      assert(streamed(k)._1 === n, s"count mismatch at $k")
      assert(math.abs(streamed(k)._2 - sum) < 1e-6, s"sum mismatch at $k")
    }
    assert(batch.nonEmpty)
  }

  test("streaming-native session windows over the real corpus, delivered " +
    "as shuffled micro-batches, equal the batch session_window aggregate") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = s.sqlContext
    val dir = "/root/testdata/sf0.001"
    val base = graft.queries.TemporalQueries.eventsWithTs(s, dir)
      .select(col("user_id"), expr("timestamp_micros(ts div 1000)").as("tstamp"))
    // Batch truth: the IDENTICAL aggregate, no watermark — what
    // q_events_session_native's oracle pins on the same corpus.
    val batch = base
      .groupBy(col("user_id"), session_window(col("tstamp"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getStruct(1).getTimestamp(0).getTime, r.getLong(2)))
      .toSet
    // Deliver the corpus as time-ordered chunks, fully SHUFFLED within
    // each micro-batch (the watermark only advances between batches, so
    // in-batch disorder is unbounded-tolerant; cross-batch order keeps
    // every event inside the watermark, the contract the equality needs).
    val rows = base.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
      .sortBy(_._2.getTime)
    val rnd = new scala.util.Random(7)
    val chunks = rows.grouped((rows.size + 6) / 7).map(c => rnd.shuffle(c)).toSeq
    val source = MemoryStream[(Long, Timestamp)]
    val q = StreamingAnalytics
      .streamingSessionCounts(source.toDF().toDF("user_id", "tstamp"))
      .writeStream.format("memory").queryName("sess_native")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
      // Sentinel flushes: advance the watermark far past the corpus so
      // every real session closes and emits (two batches — the watermark
      // computed in one batch takes effect in the next).
      val flushT = rows.last._2.getTime + 365L * 86400000L
      source.addData((-1L, new Timestamp(flushT)))
      q.processAllAvailable()
      source.addData((-1L, new Timestamp(flushT + 3600000L)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_native")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(3)))
      .toSet
    assert(streamed === batch)
    assert(batch.size > 10, s"degenerate corpus: ${batch.size} sessions")
  }

  test("a session event arriving beyond the watermark is DROPPED: the " +
    "streamed session under-counts vs batch — the documented bounded-state " +
    "trade of the native session window") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = s.sqlContext
    def t(min: Long) = new Timestamp(min * 60000L)
    val source = MemoryStream[(Long, Timestamp)]
    val q = StreamingAnalytics
      .streamingSessionCounts(source.toDF().toDF("user_id", "tstamp"),
        gap = "30 minutes", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append())
      .start()
    try {
      source.addData((1L, t(0)), (1L, t(5))); q.processAllAvailable()
      // Jump event time far ahead: next batch's watermark = 990 min.
      source.addData((2L, t(1000))); q.processAllAvailable()
      // LATE: minute 6 is far below watermark 990 — dropped, while user
      // 1's closed session [0, 35) emits this same trigger.
      source.addData((1L, t(6))); q.processAllAvailable()
      source.addData((3L, t(3000))); q.processAllAvailable()
      source.addData((3L, t(4000))); q.processAllAvailable()
    } finally q.stop()
    val user1 = spark.table("sess_late").filter(col("user_id") === 1L)
      .collect().map(r => (r.getTimestamp(1).getTime, r.getLong(3))).toSeq
    // Streamed: 2 events — the late minute-6 event never reached state.
    assert(user1 === Seq((0L, 2L)))
    // Batch over the COMPLETE data counts all 3 — the documented gap.
    val batchN = Seq((1L, t(0)), (1L, t(5)), (1L, t(6)), (2L, t(1000)),
      (3L, t(3000)), (3L, t(4000)))
      .toDF("user_id", "tstamp")
      .groupBy(col("user_id"), session_window(col("tstamp"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .filter(col("user_id") === 1L)
      .collect().map(_.getLong(2))
    assert(batchN.toSeq === Seq(3L))
  }

  test("streaming exact dedup: first doc per content hash passes, " +
    "duplicates across micro-batches are dropped") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[(Long, String, Timestamp)]
    val docs = source.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingAnalytics.streamingDedup(docs)
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    def ts(minute: Long) = new Timestamp(minute * 60000L)
    try {
      source.addData((1L, "alpha", ts(1)), (2L, "beta", ts(2)), (3L, "alpha", ts(3)))
      q.processAllAvailable()
      // A later micro-batch re-sends a seen text and adds a new one.
      source.addData((4L, "beta", ts(4)), (5L, "gamma", ts(5)))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("dedup").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(kept === Seq((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
  }

  test("per-row LSH bands equal the batch groupBy form on the real corpus") {
    import graft.queries.MinHashLsh
    import org.apache.spark.sql.functions.{col, explode}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = docs
      .select(col("doc_id"),
        explode(graft.functions.WordShingles.shingles(col("text"), 3)).as("sh"))
      .withColumn("h", MinHashLsh.h32(col("sh")))
    val batch = MinHashLsh.bandsOf(sh).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val perRow = MinHashLsh.perRowBands(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(perRow === batch)
    assert(perRow.nonEmpty)
  }

  test("stream-static near-dup probe flags docs colliding with the corpus " +
    "band index, stays silent for novel docs, keeps no stream state") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.queries.MinHashLsh
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely different corpus text about spark physical plans"))
      .toDF("doc_id", "text")
    val index = MinHashLsh.perRowBands(corpus)
    val source = MemoryStream[(Long, String)]
    val probe = StreamingAnalytics.streamStaticNearDupProbe(
      source.toDF().toDF("doc_id", "text"), index)
    val q = probe.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(
        // exact copy of corpus doc 100 → every band collides
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        // novel text → no collision
        (2L, "unrelated words that share no shingle with anything stored"),
        // too short to shingle → emits nothing at all
        (3L, "hi there"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.forall(_ == (1L, 100L)))
    assert(out.count(_ == (1L, 100L)) === 4, s"all 4 bands should collide: $out")
  }

  test("streaming dedup-keeper stats: per-hash state accumulates copies and " +
    "flushes one summary on event-time timeout") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import StreamingAnalytics.{DocEvent, DedupGroupOut}
    val source = MemoryStream[DocEvent]
    def ev(docId: Long, hash: String, minute: Long) =
      DocEvent(docId, hash, new Timestamp(minute * 60000L))
    val withWm = source.toDS().withWatermark("ts", "0 seconds")
    val q = StreamingAnalytics.dedupKeeperStats(withWm, horizonMillis = 10 * 60000L)
      .writeStream.format("memory").queryName("keeper")
      .outputMode(OutputMode.Append()).start()
    try {
      // h1 has 3 copies (keeper = min doc_id 2), h2 a single copy.
      source.addData(ev(5, "h1", 1), ev(2, "h1", 2))
      q.processAllAvailable()
      source.addData(ev(9, "h1", 3), ev(7, "h2", 4))
      q.processAllAvailable()
      assert(spark.table("keeper").isEmpty) // nothing idle yet
      // Advance the watermark past lastTs + horizon for both hashes.
      source.addData(ev(100, "h3", 60))
      q.processAllAvailable()
      q.processAllAvailable() // timeout fires on the batch after wm advance
    } finally q.stop()
    val out = spark.table("keeper").as[DedupGroupOut].collect()
      .map(o => o.textHash -> o).toMap
    assert(out("h1").keeperDocId === 2L && out("h1").nCopies === 3L)
    assert(out("h1").firstTsMs === 60000L && out("h1").lastTsMs === 3 * 60000L)
    assert(out("h2").keeperDocId === 7L && out("h2").nCopies === 1L)
  }

  test("flatMapGroupsWithState sessionization: gap closes, watermark flushes idle") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[Event]
    val withWm = source.toDS().withWatermark("ts", "0 seconds")
    val q = StreamingAnalytics.sessionize(withWm, gapMillis = 10 * 60000L)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append())
      .start()
    try {
      // User 1: events at minutes 1, 5 (one session; minute 0 would land ON
      // the initial watermark and be dropped as late), then 30 (gap > 10min
      // closes the first and emits it). User 2: single event at minute 31.
      source.addData(ev(1, 1), ev(1, 5))
      q.processAllAvailable()
      source.addData(ev(1, 30), ev(2, 31))
      q.processAllAvailable()
      val afterGap = spark.table("sess").as[SessionOut].collect()
      assert(afterGap.length === 1)
      val sess = afterGap.head
      assert(sess.userId === 1L)
      assert(sess.sessionStartMs === 60000L && sess.sessionEndMs === 5 * 60000L)
      assert(sess.nEvents === 2L && sess.sumValue === 2.0)
      // Advance the watermark past user 2's lastTs + gap (31 + 10 = 41min):
      // the event-time timeout fires and flushes the idle session.
      source.addData(ev(3, 60))
      q.processAllAvailable()
      q.processAllAvailable() // timeout fires on the batch after wm advance
      val flushed = spark.table("sess").as[SessionOut].collect()
      assert(flushed.exists(o => o.userId === 2L && o.nEvents === 1L))
    } finally q.stop()
  }

  test("streaming quality gate routes docs identically to the batch Gopher " +
    "rules (shared expressions) and stays stateless") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // The real corpus exercises both routes (sf0.001 has keep and drop docs).
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(100)
    val source = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.qualityGate(
      source.toDF().toDF("doc_id", "text"))
      .select("doc_id", "route")
      .writeStream.format("memory").queryName("gate")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(corpus.take(50): _*)
      q.processAllAvailable()
      source.addData(corpus.drop(50): _*)
      q.processAllAvailable()
      // Stateless: no state-store operator in the executed streaming plan.
      assert(!q.lastProgress.json.contains("stateOperators\":[{"))
    } finally q.stop()
    val streamed = spark.table("gate").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val batch = graft.queries.GopherRules.withFlags(
      corpus.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.getLong(r.fieldIndex("keep")) == 1L) "keep" else "quarantine"))
      .sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(streamed.map(_._2).distinct.length === 2,
      "corpus should exercise both routes")
  }

  test("online curation gate E2E: the composed stream (quality -> near-dup " +
    "-> decontamination) routes every doc exactly as the batch screening " +
    "operators do on the same corpus, with no stream state") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val isEval = col("source").isin("src0", "src1")
    // Batch-materialized statics: the corpus band index (train slice) and
    // the eval-shingle Bloom sketch — what a deployment maintains anyway.
    val train = raw.filter(!isEval).select("doc_id", "text")
    val bandIndex = graft.queries.MinHashLsh.bandsOf(
      train.select(col("doc_id"),
        explode(graft.functions.WordShingles.shingles(col("text"), 3)).as("sh"))
        .withColumn("h", graft.queries.MinHashLsh.h32(col("sh"))))
    val evalSh = raw.filter(isEval)
      .select(explode(
        graft.functions.WordShingles.shingles(col("text"), 3)).as("sh"))
      .distinct()
    val sketch = graft.functions.BloomSketch.build(evalSh, "sh", 0.001)

    // Stream the SAME train corpus through the gate (self-screening: the
    // batch pipeline's shape — every doc judged against the full corpus).
    val corpus = train.collect().map(r => (r.getLong(0), r.getString(1)))
    val source = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.onlineCurationGate(
      source.toDF().toDF("doc_id", "text"), bandIndex, sketch)
      .select("doc_id", "keep", "cls_keep", "neardup_flag", "flagged", "route")
      .writeStream.format("memory").queryName("curation_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(corpus.take(60): _*)
      q.processAllAvailable()
      source.addData(corpus.drop(60): _*)
      q.processAllAvailable()
      assert(!q.lastProgress.json.contains("stateOperators\":[{"),
        "the gate must hold no stream state")
    } finally q.stop()
    val got = spark.table("curation_gate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toMap
    assert(got.size === corpus.length, "exactly one verdict row per doc")

    // Batch ground truths, from the operators the gate mirrors.
    val batchKeep = graft.queries.GopherRules.withFlags(
        corpus.toSeq.toDF("doc_id", "text"))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A doc near-dup-flags iff any of its band keys is shared with some
    // OTHER doc — i.e. it appears in the batch candidate-pair set.
    val ba = bandIndex.select(col("doc_id").as("da"), col("band"), col("bkey"))
    val bb = bandIndex.select(col("doc_id").as("db"), col("band"), col("bkey"))
    val inPair = ba.join(bb, Seq("band", "bkey"))
      .filter(col("da") =!= col("db"))
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    // Decontamination ground truth: the probe's own batch run (same
    // sketch — bit-identical flags, FPs included).
    val batchDecon = StreamingAnalytics.decontaminationProbe(
        corpus.toSeq.toDF("doc_id", "text"), sketch)
      .select("doc_id", "flagged").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Classifier ground truth: the batch operator's own scoring code.
    val batchCls = graft.queries.QualityClassifier.withScore(
        corpus.toSeq.toDF("doc_id", "text"))
      .select("doc_id", "cls_keep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    corpus.foreach { case (id, _) =>
      val (keep, cls, nd, fl, route) = got(id)
      assert(keep === batchKeep(id), s"doc $id quality verdict")
      assert(cls === batchCls(id), s"doc $id classifier verdict")
      assert(nd === (if (inPair(id)) 1L else 0L), s"doc $id neardup verdict")
      assert(fl === batchDecon(id), s"doc $id decontamination verdict")
      val expectedRoute =
        if (keep == 0L) "quarantine_quality"
        else if (nd == 1L) "quarantine_neardup"
        else if (fl == 1L) "quarantine_contaminated"
        else if (cls == 0L) "quarantine_classifier"
        else "keep"
      assert(route === expectedRoute, s"doc $id route")
    }
    assert(got.values.map(_._5).toSet.size >= 3,
      "corpus should exercise several routes")
  }

  test("streaming weighted reservoir equals the batch priority sample " +
    "after arbitrary micro-batch splits and at-least-once redelivery " +
    "(order independence of priority sampling)") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val source = MemoryStream[(String, Long, String)]
    val q = StreamingAnalytics.streamingWeightedSample(
      source.toDF().toDF("source", "doc_id", "text"))
      .writeStream.format("memory").queryName("reservoir")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      // Three arbitrary micro-batches + a full redelivery of batch 1
      // (at-least-once): the reservoir must not double-count.
      val batches = corpus.groupBy(c => (c._2 % 3).toInt)
      source.addData(batches(0).toSeq: _*); q.processAllAvailable()
      source.addData(batches(1).toSeq: _*); q.processAllAvailable()
      source.addData(batches(0).toSeq: _*); q.processAllAvailable() // redelivery
      source.addData(batches(2).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    // Update-mode sink: later rows overwrite earlier versions per key.
    val got = spark.table("reservoir").collect()
      .map(r => (r.getString(0), r.getLong(4)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expected = SparkEntry.queries("p_sample_weighted")(s, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(4)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming decontamination probe: online flags dominate the exact " +
    "batch overlap (one-sided sketch error) and agree on the clean docs") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    // Batch side: sketch of the eval slice's distinct 3-grams + exact
    // per-doc overlap for the train docs (ground truth).
    val isEval = org.apache.spark.sql.functions.col("source")
      .isin("src0", "src1")
    val evalSh = raw.filter(isEval)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.WordShingles.shingles(
          org.apache.spark.sql.functions.col("text"), 3)).as("sh"))
      .distinct()
    val sketch = graft.functions.BloomSketch.build(evalSh, "sh", 0.001)
    val evalSet = evalSh.collect().map(_.getString(0)).toSet
    val train = raw.filter(!isEval).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(100)
    // Stream the train docs through the probe.
    val source = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.decontaminationProbe(
      source.toDF().toDF("doc_id", "text"), sketch)
      .select("doc_id", "n_shingles", "n_hits", "flagged")
      .writeStream.format("memory").queryName("decon")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(train: _*)
      q.processAllAvailable()
      assert(!q.lastProgress.json.contains("stateOperators\":[{"))
    } finally q.stop()
    val got = spark.table("decon").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size === train.length)
    // Fully codegen'd: the built-in might_contain probe leaves no UDF
    // node anywhere in the physical plan.
    val batchPlan = StreamingAnalytics.decontaminationProbe(
        raw.filter(!isEval).select("doc_id", "text"), sketch)
      .queryExecution.executedPlan.toString
    assert(!batchPlan.contains("ScalaUDF"), "probe must not plan a Scala UDF")
    train.foreach { case (id, text) =>
      val sh = text.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
      val exactHits = sh.count(evalSet.contains).toLong
      val (ns, hits, flagged) = got(id)
      assert(ns === sh.size.toLong, s"doc $id shingle count")
      assert(hits >= exactHits, s"doc $id: sketch hits below exact")
      if (exactHits * 100 >= 10 * math.max(sh.size.toLong, 1L))
        assert(flagged === 1L, s"doc $id lost its exact flag")
    }
  }
}
