package graft

import graft.model._
import graft.store.StateStore
import graft.streaming.{ForkDB, IngestionPipeline, StreamedBlock}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class ForkStreamingSpec extends SparkTestBase {

  private def ref(n: Long, fork: String = "a") = BlockRef(s"$fork$n", n)
  private def wr(n: Long, fork: String = "a") =
    WriteRequest(n, ref(n, fork),
      Seq(TabletRowM(1, "t1", n, "pk", s"$fork$n".getBytes, false)), Nil)

  test("ForkDB: reversible segment walks parent links back to LIB") {
    val db = new ForkDB
    db.moveLIB(ref(0))
    db.addLink(ref(1), "a0", wr(1))
    db.addLink(ref(2), "a1", wr(2))
    // A competing fork at height 2.
    db.addLink(BlockRef("b2", 2), "a1", wr(2, "b"))
    assert(db.reversibleSegment("a2").get.map(_.block.id) === Seq("a1", "a2"))
    assert(db.reversibleSegment("b2").get.map(_.block.id) === Seq("a1", "b2"))
    assert(db.reversibleSegment("unknown").isEmpty)
    assert(db.head.id === "a2" || db.head.id === "b2")
  }

  test("ForkDB: moveLIB purges links deeper than the purge depth") {
    val db = new ForkDB
    (1L to 300L).foreach(n => db.addLink(ref(n), s"a${n - 1}", wr(n)))
    db.moveLIB(ref(290), purgeDepth = 10)
    assert(db.size === 20) // heights 281..300
    assert(db.reversibleSegment("a300").get.map(_.height) === (291L to 300L))
  }

  test("ingestion end-to-end: only irreversible blocks reach storage; " +
    "speculative reads overlay the fork branch") {
    implicit val s = spark
    import s.implicits._
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[StreamedBlock]

    def block(n: Long, step: String, fork: String = "a") = StreamedBlock(
      s"$fork$n", s"$fork${n - 1}", n, step,
      Seq(TabletRowM(1, "t1", n, s"pk${n % 2}", s"$fork$n-v".getBytes, false)), Nil)

    val q = pipeline.start(source.toDS(), tmpDir("ckpt"), triggerMillis = 50)
    try {
      // Heights 0..3 irreversible; 4..5 only seen as new (speculative).
      source.addData(
        block(0, "irreversible"), block(1, "irreversible"),
        block(2, "irreversible"), block(3, "irreversible"),
        block(4, "new"), block(5, "new"))
      q.processAllAvailable()
    } finally q.stop()

    // Durable: exactly heights 0..3.
    assert(store.tabletRows.select("height").collect().map(_.getLong(0)).sorted
      === Array(0L, 1L, 2L, 3L))
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 3L)

    // Speculative read at a5 sees the fork branch (heights 4,5).
    val spec = pipeline.speculativeTabletRows("a5").get
    assert(spec.map(_.count()).sum === 2L)
    val asOf = graft.read.TemporalReads
      .readTabletAt(store.tabletRows, "t1", 5, spec)
      .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](2))))
    assert(asOf.toSeq === Seq(("pk0", "a4-v"), ("pk1", "a5-v")))
  }

  test("FetchSpeculativeWrites parity: NotReady before any head, by-num in " +
    "the current chain, RequestedBlockNotFound above head or off-chain") {
    import graft.streaming.SpeculativeFetch
    val db = new ForkDB
    // No block processed yet: ErrNotReady.
    assert(db.fetchSpeculativeWrites() === SpeculativeFetch.NotReady)
    db.moveLIB(ref(0))
    // An all-irreversible stream is ready, with an empty overlay at LIB 0.
    assert(db.fetchSpeculativeWrites() === SpeculativeFetch.Writes(Nil, 0L))
    db.addLink(ref(1), "a0", wr(1))
    db.addLink(ref(2), "a1", wr(2))
    db.addLink(ref(3), "a2", wr(3))
    db.addLink(BlockRef("b2", 2), "a1", wr(2, "b")) // competing fork
    // None -> the whole current overlay (LIB, head].
    val SpeculativeFetch.Writes(all, lib0) = db.fetchSpeculativeWrites(): @unchecked
    assert(all.map(_.block.id) === Seq("a1", "a2", "a3") && lib0 === 0L)
    def ids(f: SpeculativeFetch): Seq[String] = (f: @unchecked) match {
      case SpeculativeFetch.Writes(ws, _) => ws.map(_.block.id)
    }
    // Bare num: current chain truncated at that num (pipeline.go:263).
    assert(ids(db.fetchSpeculativeWrites(Some(BlockRef("", 2)))) === Seq("a1", "a2"))
    // Bare num equal to head num: up-to-head fast path.
    assert(ids(db.fetchSpeculativeWrites(Some(BlockRef("", 3)))) === Seq("a1", "a2", "a3"))
    // By id on a fork branch.
    assert(ids(db.fetchSpeculativeWrites(Some(BlockRef("b2", 2)))) === Seq("a1", "b2"))
    // Above head / unknown id: ErrRequestedBlockNotFound.
    assert(db.fetchSpeculativeWrites(Some(BlockRef("", 9)))
      === SpeculativeFetch.RequestedBlockNotFound)
    assert(db.fetchSpeculativeWrites(Some(BlockRef("zz", 2)))
      === SpeculativeFetch.RequestedBlockNotFound)
  }

  test("singlet speculative overlay: pipeline facade feeds readSingletEntryAt " +
    "with fork-branch entries, tombstones erase") {
    implicit val s = spark
    import s.implicits._
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    def block(n: Long, step: String, value: String, del: Boolean = false) =
      StreamedBlock(s"a$n", s"a${n - 1}", n, step, Nil,
        Seq(SingletEntryM(1, "s1", n, value.getBytes, del)))
    // Heights 0..1 irreversible, 2..3 speculative on singlet s1.
    pipeline.commitBatch(Seq(
      block(0, "irreversible", "v0"), block(1, "irreversible", "v1"),
      block(2, "new", "v2"), block(3, "new", "v3")).toDS(), 0)
    assert(store.singletEntries.count() === 2L)
    // Overlay at a3: the speculative entry v3 wins over durable v1.
    val spec = pipeline.speculativeSingletEntries("a3").get
    val at3 = store.readSingletEntryAt("s1", 3L, spec).collect()
    assert(at3.length === 1 && new String(at3.head.getAs[Array[Byte]](2)) === "v3")
    // At height 2 the overlay serves v2.
    val at2 = store.readSingletEntryAt("s1", 2L, pipeline.speculativeSingletEntries("a2").get)
      .collect()
    assert(new String(at2.head.getAs[Array[Byte]](2)) === "v2")
    // A speculative deletion erases the entry (read.go:337–341).
    pipeline.commitBatch(Seq(block(4, "new", "", del = true)).toDS(), 1)
    val at4 = store.readSingletEntryAt("s1", 4L, pipeline.speculativeSingletEntries("a4").get)
    assert(at4.count() === 0L)
    // FetchSpeculativeWrites through the pipeline: by bare num.
    import graft.streaming.SpeculativeFetch
    val SpeculativeFetch.Writes(byNum, atFinal) =
      pipeline.fetchSpeculativeWrites(Some(BlockRef("", 3))): @unchecked
    assert(byNum.map(_.height) === Seq(2L, 3L) && atFinal === 1L)
  }

  test("block-archive FILE source end-to-end: pipeline ingests one-block " +
    "files from disk, serves an as-of read mid-stream, and tails files " +
    "that appear while running (S1/S2, pipeline.go:37–62, 93–108)") {
    implicit val s = spark
    import graft.streaming.BlockArchiveSource
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    val archive = tmpDir("archive")
    def block(n: Long, step: String = "irreversible") = StreamedBlock(
      s"a$n", s"a${n - 1}", n, step,
      Seq(TabletRowM(1, "t1", n, s"pk${n % 3}", s"v$n".getBytes, false)),
      if (n % 2 == 0) Seq(SingletEntryM(1, "s1", n, s"e$n".getBytes, false)) else Nil)
    // Historical archive: two files on DISK before the query starts.
    BlockArchiveSource.writeArchiveFile(Seq(block(0), block(1), block(2)), archive)
    BlockArchiveSource.writeArchiveFile(
      Seq(block(3), block(4), block(5), block(6, "new")), archive)
    val q = pipeline.start(
      BlockArchiveSource.readStream(s, archive), tmpDir("ckpt"), triggerMillis = 50)
    try {
      q.processAllAvailable()
      // Replay drained: durable rows 0..5 committed, block 6 on the fork
      // overlay only.
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 5L)
      assert(store.tabletRows.count() === 6L)
      // As-of read MID-STREAM (query still running), with the speculative
      // head overlaid.
      val at4 = store.readTabletAt("t1", 4L).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(at4 === Seq(("pk0", 3L), ("pk1", 4L), ("pk2", 2L)))
      val spec = pipeline.speculativeTabletRows("a6").get
      val at6 = store.readTabletAt("t1", 6L, spec).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(at6 === Seq(("pk0", 6L), ("pk1", 4L), ("pk2", 5L)))
      // TAIL: new files appear while the query runs; the file source picks
      // them up and the pipeline advances LIB over the old fork head.
      BlockArchiveSource.writeArchiveFile(
        Seq(block(6), block(7), block(8)), archive)
      q.processAllAvailable()
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 8L)
      val at8 = store.readTabletAt("t1", 8L).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(at8 === Seq(("pk0", 6L), ("pk1", 7L), ("pk2", 8L)))
      // Singlet entries rode along from the same files.
      assert(store.readSingletEntries("s1").count() === 5L)
    } finally q.stop()
  }

  test("block-archive source: rate-limited replay (maxFilesPerTrigger=1) " +
    "stays ordered across triggers, and a RESTART from the same streaming " +
    "checkpoint resumes without re-delivery") {
    implicit val s = spark
    import graft.streaming.BlockArchiveSource
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    val archive = tmpDir("archive")
    val ckpt = tmpDir("ckpt")
    def block(n: Long) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, "irreversible",
      Seq(TabletRowM(1, "t1", n, "pk", s"v$n".getBytes, false)), Nil)
    // Three files; one file per trigger forces multi-batch replay where
    // any misordering would trip the linearity guard and fail the query.
    BlockArchiveSource.writeArchiveFile(Seq(block(0), block(1)), archive)
    BlockArchiveSource.writeArchiveFile(Seq(block(2), block(3)), archive)
    BlockArchiveSource.writeArchiveFile(Seq(block(4)), archive)
    val q1 = pipeline.start(
      BlockArchiveSource.readStream(s, archive, maxFilesPerTrigger = Some(1)),
      ckpt, triggerMillis = 50)
    try q1.processAllAvailable() finally q1.stop()
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 4L)
    assert(store.tabletRows.count() === 5L)
    // Restart against the SAME checkpoint dir: already-committed files are
    // not re-delivered (file-source offsets) — and even a redelivery would
    // be dropped by the idempotent replay guard. New files continue.
    BlockArchiveSource.writeArchiveFile(Seq(block(5), block(6)), archive)
    val pipeline2 = new IngestionPipeline(store)
    val q2 = pipeline2.start(
      BlockArchiveSource.readStream(s, archive, maxFilesPerTrigger = Some(1)),
      ckpt, triggerMillis = 50)
    try q2.processAllAvailable() finally q2.stop()
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 6L)
    assert(store.tabletRows.count() === 7L) // no duplicates from the restart
  }

  test("ingestion triggers index builds past the heuristic; snapshot-aware " +
    "read equals the direct read") {
    implicit val s = spark
    import s.implicits._
    val store = new StateStore(tmpDir("store"))
    // Tiny threshold so 30 mutations on tablet t1 cross it mid-stream.
    val pipeline = new IngestionPipeline(store, indexMinMutations = 10)
    def block(n: Long) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, "irreversible",
      TabletRowM(1, "t1", n, s"pk${n % 5}", s"v$n".getBytes, n % 7 == 3) +:
        // t2 mutates every 5th block only: stays under the threshold.
        (if (n % 5 == 0) Seq(TabletRowM(1, "t2", n, "pk", s"w$n".getBytes, false))
         else Nil),
      Nil)
    pipeline.commitBatch((0L until 15L).map(block).toDS(), 0)   // t1: 15 muts -> index
    pipeline.commitBatch((15L until 30L).map(block).toDS(), 1)  // tail past snapshot
    val snaps = store.tabletSnapshots.select("tablet_id", "at_height").distinct().collect()
    assert(snaps.exists(r => r.getString(0) == "t1"), "no snapshot for t1")
    // Each 15-mutation batch crosses the threshold: snapshots at both batch
    // heads, and the read path picks the newest at-or-below one.
    val t1Heights = snaps.filter(_.getString(0) == "t1").map(_.getLong(1)).sorted
    assert(t1Heights.toSeq === Seq(14L, 29L))
    assert(store.latestTabletSnapshot("t1").get._1 === 29L)
    assert(store.latestTabletSnapshot("t1", maxHeight = 20L).get._1 === 14L)
    // The height-29 build was INCREMENTAL off the height-14 snapshot:
    // squelch carries forward as prev + tail (15 + 15), identical to what a
    // from-scratch scan of [0, 29] would have counted.
    val squelches = store.tabletSnapshots
      .filter(org.apache.spark.sql.functions.col("tablet_id") === "t1")
      .select("at_height", "squelch_count").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(squelches === Map(14L -> 15L, 29L -> 30L))
    assert(store.latestTabletSnapshotMeta("t1").get._2 === 30L)
    // Snapshot-aware read ≡ direct full-scan read, across the snapshot
    // boundary and at the head.
    for (h <- Seq(14L, 20L, 29L)) {
      val viaStore = store.readTabletAt("t1", h)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val direct = graft.read.TemporalReads.readTabletAt(store.tabletRows, "t1", h)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(viaStore === direct, s"at height $h")
    }
    // t2 stayed under the threshold: no snapshot, read falls back cleanly.
    assert(store.latestTabletSnapshot("t2").isEmpty)
    assert(store.readTabletAt("t2", 29).count() === 1L)
  }

  test("asyncIndexMaintenance: builds leave the commit path — the " +
    "maintenance thread lands the same snapshots at committed heights, " +
    "snapshot-aware reads stay identical to direct reads, stop is clean") {
    implicit val s = spark
    import s.implicits._
    val store = new StateStore(tmpDir("store-async-idx"))
    val pipeline = new IngestionPipeline(store, indexMinMutations = 10,
      asyncIndexMaintenance = true)
    def block(n: Long) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, "irreversible",
      TabletRowM(1, "t1", n, s"pk${n % 5}", s"v$n".getBytes, n % 7 == 3) +:
        (if (n % 5 == 0) Seq(TabletRowM(1, "t2", n, "pk", s"w$n".getBytes, false))
         else Nil),
      Nil)
    pipeline.commitBatch((0L until 15L).map(block).toDS(), 0)
    pipeline.commitBatch((15L until 30L).map(block).toDS(), 1)
    // The commits only signal; the builds land asynchronously — wait for
    // the backlog to drain (CI-safe bound), then stop the thread.
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!pipeline.indexBacklogEmpty && System.nanoTime() < deadline)
      Thread.sleep(100L)
    assert(pipeline.indexBacklogEmpty,
      "maintenance thread must drain the index backlog")
    pipeline.stopIndexMaintenance()
    // Maintenance observability: backlog depth / last build duration /
    // build count read off the PipelineMetrics gauges (listener-bus
    // surface; sampled directly here since no query is running).
    val maintMetrics = new graft.streaming.PipelineMetrics(
      pipeline.forkDB, maintenanceOf = Some(() => pipeline.maintenanceStats),
      contentionOf = Some(() => store.publishContentionStats))
    maintMetrics.sample()
    assert(maintMetrics.indexBacklogDepth === 0L)
    assert(maintMetrics.indexBuildsCompleted >= 1L,
      "the drained backlog implies at least one completed build")
    assert(maintMetrics.indexLastBuildMillis >= 0L,
      "a completed build must stamp its wall time")
    assert(maintMetrics.snapshot.keySet.contains("index_backlog_depth"))
    // Publish-contention gauges ride the same hook plumbing: wired (>= 0,
    // not the -1 unwired default) and flat on an uncontended store.
    assert(maintMetrics.publishLostRaces === 0L)
    assert(maintMetrics.publishLeaseTakeovers === 0L)
    assert(maintMetrics.publishFenced === 0L)
    assert(maintMetrics.publishRebasedMerges === 0L)
    assert(maintMetrics.publishEscalatedMerges === 0L)
    assert(maintMetrics.snapshot.keySet.contains("publish_lost_races"))
    assert(maintMetrics.snapshot.keySet.contains("publish_rebased_merges"))
    assert(maintMetrics.snapshot.keySet.contains("publish_escalated_merges"))
    // Snapshots landed, pinned at COMMITTED heights only (14 and/or 29 —
    // how many depends on where the thread caught the commit sequence;
    // both are valid pinned floors, never an uncommitted height).
    val t1Heights = store.tabletSnapshots
      .filter(org.apache.spark.sql.functions.col("tablet_id") === "t1")
      .select("at_height").distinct().collect().map(_.getLong(0)).sorted
    assert(t1Heights.nonEmpty, "async maintenance must build t1's snapshot")
    assert(t1Heights.forall(h => h == 14L || h == 29L),
      s"snapshots must pin committed batch heads, got ${t1Heights.toSeq}")
    assert(store.latestTabletSnapshot("t1").get._1 === 29L,
      "the drained backlog must include the head snapshot")
    // The with-snapshot ≡ without-snapshot invariant holds under builds
    // that ran concurrently with commits.
    for (h <- Seq(14L, 20L, 29L)) {
      val viaStore = store.readTabletAt("t1", h)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val direct = graft.read.TemporalReads.readTabletAt(store.tabletRows, "t1", h)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(viaStore === direct, s"at height $h")
    }
    // Under-threshold tablet: untouched, reads fall back cleanly.
    assert(store.latestTabletSnapshot("t2").isEmpty)
    assert(store.readTabletAt("t2", 29).count() === 1L)
    // Stop is idempotent.
    pipeline.stopIndexMaintenance()

    // Stop is STICKY: a later batch's signal (the stream still running)
    // must not silently resurrect the maintenance thread.
    def maintThreadAlive(): Boolean = {
      val all = new Array[Thread](Thread.activeCount() + 16)
      Thread.enumerate(all)
      all.exists(t => t != null && t.isAlive && t.getName == "graft-index-maint")
    }
    pipeline.commitBatch((30L until 45L).map(block).toDS(), 2)
    Thread.sleep(300L)
    assert(!maintThreadAlive(),
      "a post-stop commit signal must not restart maintenance")
    // Explicit resume clears the latch; the next signal rebuilds.
    pipeline.resumeIndexMaintenance()
    pipeline.commitBatch((45L until 60L).map(block).toDS(), 3)
    val deadline2 = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!pipeline.indexBacklogEmpty && System.nanoTime() < deadline2)
      Thread.sleep(100L)
    assert(pipeline.indexBacklogEmpty, "resume must restore maintenance")
    assert(store.latestTabletSnapshot("t1").get._1 === 59L)
    pipeline.stopIndexMaintenance()
  }

  test("PipelineMetrics gauges update from a streaming run: head, LIB, " +
    "reversible lag, time drift, batch/row counters") {
    implicit val s = spark
    import s.implicits._
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    // Deterministic clock + block->time mapping: block n "happened" at
    // n*1000 ms, the wall clock is pinned at 10_000 ms.
    val metrics = new graft.streaming.PipelineMetrics(
      pipeline.forkDB, Some((n: Long) => n * 1000L), () => 10000L)
    s.streams.addListener(metrics)
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[StreamedBlock]
    def block(n: Long, step: String) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, step,
      Seq(TabletRowM(1, "t1", n, "pk", s"a$n".getBytes, false)), Nil)
    val q = pipeline.start(source.toDS(), tmpDir("ckpt"), triggerMillis = 50)
    try {
      source.addData(
        block(0, "irreversible"), block(1, "irreversible"),
        block(2, "irreversible"), block(3, "new"), block(4, "new"))
      q.processAllAvailable()
      // Listener events are delivered asynchronously — poll briefly.
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (metrics.headBlockNumber < 4L && System.nanoTime() < deadline)
        Thread.sleep(20)
    } finally {
      q.stop()
      s.streams.removeListener(metrics)
    }
    assert(metrics.headBlockNumber === 4L)
    assert(metrics.libBlockNumber === 2L)
    assert(metrics.reversibleLag === 2L)
    // Drift = pinned clock 10_000 - head event-time 4_000.
    assert(metrics.headTimeDriftMillis === 6000L)
    assert(metrics.batchesObserved >= 1L)
    assert(metrics.inputRowsObserved >= 5L)
    assert(metrics.snapshot("head_block_num") === 4L)
  }

  test("ingestion replay is idempotent: re-delivered batch below checkpoint is skipped") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    import s.implicits._
    def block(n: Long) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, "irreversible",
      Seq(TabletRowM(1, "t1", n, "pk", s"a$n".getBytes, false)), Nil)
    pipeline.commitBatch(Seq(block(0), block(1)).toDS(), 0)
    // Redelivery of the same batch (foreachBatch at-least-once).
    pipeline.commitBatch(Seq(block(0), block(1)).toDS(), 0)
    assert(store.tabletRows.count() === 2L)
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 1L)
  }

  test("joining source: archive catch-up ∪ live stream commits every height " +
    "exactly once across a byte-identical overlap seam, within and across " +
    "micro-batches (bstream joining-source parity)") {
    implicit val s = spark
    import s.implicits._
    import graft.streaming.{BlockArchiveSource, JoiningSource}
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    val archive = tmpDir("archive")
    def block(n: Long) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, "irreversible",
      Seq(TabletRowM(1, "t1", n, s"pk${n % 3}", s"v$n".getBytes, false)), Nil)
    // Catch-up side on disk before the query starts; live side already
    // holds an OVERLAPPING window (3..5) — both land in the first batch,
    // so the seam dedup is exercised within one micro-batch.
    BlockArchiveSource.writeArchiveFile(Seq(block(0), block(1), block(2)), archive)
    BlockArchiveSource.writeArchiveFile(Seq(block(3), block(4)), archive)
    implicit val sqlCtx = s.sqlContext
    val live = MemoryStream[StreamedBlock]
    live.addData(block(3), block(4), block(5))
    val q = pipeline.start(
      JoiningSource.fromArchiveWithLive(s, archive, live.toDS()),
      tmpDir("ckpt"), triggerMillis = 50)
    try {
      q.processAllAvailable()
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 5L)
      assert(store.tabletRows.count() === 6L) // 0..5 exactly once
      // CROSS-batch seam: the archive's tail re-serves heights live already
      // committed (plus one new one) — the linearity guard drops the
      // already-checkpointed heights, the new one commits.
      live.addData(block(6), block(7))
      q.processAllAvailable()
      BlockArchiveSource.writeArchiveFile(Seq(block(6), block(7), block(8)), archive)
      q.processAllAvailable()
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 8L)
      assert(store.tabletRows.count() === 9L) // 0..8, still exactly once
      // Live handover complete: the live side alone advances the head.
      live.addData(block(9))
      q.processAllAvailable()
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 9L)
      assert(store.tabletRows.count() === 10L)
    } finally q.stop()
  }

  test("joining source: DISAGREEING payloads for one height are corruption, " +
    "not overlap — the batch fails loudly instead of picking a side") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    import s.implicits._
    def block(n: Long, v: String) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, "irreversible",
      Seq(TabletRowM(1, "t1", n, "pk", v.getBytes, false)), Nil)
    val ex = intercept[IllegalArgumentException] {
      pipeline.commitBatch(
        Seq(block(0, "v0"), block(1, "v1"), block(1, "OTHER")).toDS(), 0)
    }
    assert(ex.getMessage.contains("non-contiguous"))
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).isEmpty)
  }
}
