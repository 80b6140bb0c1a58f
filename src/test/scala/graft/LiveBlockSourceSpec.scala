package graft

import graft.model.TabletRowM
import graft.store.StateStore
import graft.streaming.{IngestionPipeline, LiveBlockSource, StreamedBlock}

/** Live NETWORK source connectors (S2, reference pipeline.go:93–108): the
  * JSON wire framing, the socket connector end-to-end through
  * [[IngestionPipeline]] (same fork/commit assertions as the MemoryStream
  * and file-tail E2Es in [[ForkStreamingSpec]]), and the rate-driven
  * synthetic soak source. */
class LiveBlockSourceSpec extends SparkTestBase {

  private def block(n: Long, step: String, fork: String = "a") = StreamedBlock(
    s"$fork$n", s"$fork${n - 1}", n, step,
    Seq(TabletRowM(1, "t1", n, s"pk${n % 2}", s"$fork$n-v".getBytes, false)), Nil)

  test("JSON wire framing round-trips blocks exactly (binary payloads included)") {
    implicit val s = spark
    import s.implicits._
    val blocks = Seq(block(0, "irreversible"), block(1, "new"),
      StreamedBlock("b2", "a1", 2, "new", Nil,
        Seq(graft.model.SingletEntryM(7, "s1", 2, Array[Byte](0, 1, -1), true))))
    val frames = LiveBlockSource.toJsonFrames(blocks)
    assert(frames.forall(f => !f.contains("\n")), "frames must be line-safe")
    val parsed = LiveBlockSource.parseJsonFrames(frames.toDS()).collect()
    // Byte arrays break case-class equality; compare via the JSON projection.
    assert(LiveBlockSource.toJsonFrames(parsed.toSeq) === frames)
  }

  test("a malformed frame FAILS the parse (FAILFAST) instead of dropping a block") {
    implicit val s = spark
    import s.implicits._
    val frames = LiveBlockSource.toJsonFrames(Seq(block(0, "irreversible"))) :+
      "{not json"
    val ex = intercept[org.apache.spark.SparkException] {
      LiveBlockSource.parseJsonFrames(frames.toDS()).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("socket live source end-to-end: pipeline commits irreversible blocks " +
    "arriving over TCP and overlays the speculative head (S2)") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    val frames = LiveBlockSource.toJsonFrames(
      (0L to 3L).map(block(_, "irreversible")) ++ Seq(block(4, "new"), block(5, "new")))

    val server = new java.net.ServerSocket(0)
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      frames.foreach(out.println)
      out.flush() // keep the connection open; the query owns shutdown
    })
    writer.setDaemon(true)
    writer.start()

    val q = pipeline.start(
      LiveBlockSource.fromSocket(s, "localhost", server.getLocalPort),
      tmpDir("ckpt"), triggerMillis = 50)
    try {
      // The socket receiver buffers asynchronously: processAllAvailable only
      // covers frames that have ARRIVED, so poll until the checkpoint lands.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!store.checkpoint(StateStore.GlobalCheckpointKey).exists(_.height == 3L)
          && System.nanoTime() < deadline) {
        q.processAllAvailable()
        Thread.sleep(50)
      }
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 3L)
      assert(store.tabletRows.select("height").collect().map(_.getLong(0)).sorted
        === Array(0L, 1L, 2L, 3L))
      // The reversible head rode the same wire: speculative overlay at a5.
      val spec = pipeline.speculativeTabletRows("a5").get
      assert(spec.map(_.count()).sum === 2L)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("multi-partition live delivery E2E: a partitioned line-oriented " +
    "source (Kafka-shaped) feeds parseJsonFrames with partition-interleaved " +
    "arrival; a delivery GAP trips the contiguity guard without committing; " +
    "late redelivery of the missing range recovers idempotently") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    val inDir = new java.io.File(tmpDir("frames"))
    def dropFile(name: String, nums: Seq[Long]): Unit = {
      val frames = LiveBlockSource.toJsonFrames(nums.map(block(_, "irreversible")))
      val f = new java.io.File(inDir, name)
      val w = new java.io.PrintWriter(f, "UTF-8")
      try frames.foreach(w.println) finally w.close()
    }
    // Blocks 1..40 STRIPED across 4 files (file k holds num % 4 == k) — the
    // multi-partition shape: Spark assigns each file its own partition(s),
    // so rows reach commitBatch partition-interleaved and unordered. The
    // guard must accept the batch after its height sort proves contiguity.
    (0 until 4).foreach(k => dropFile(s"stripe$k.jsonl", (1L to 40L).filter(_ % 4 == k)))
    val src = LiveBlockSource.parseJsonFrames(
      s.readStream.text(inDir.getAbsolutePath).select(col("value")).as[java.lang.String])
    val q = pipeline.start(src, tmpDir("ckpt"), triggerMillis = 50)
    try {
      q.processAllAvailable()
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 40L)
      assert(store.tabletRows.select("height").collect().map(_.getLong(0)).sorted
        === (1L to 40L).toArray)

      // OUT-OF-ORDER DELIVERY: blocks 45..50 arrive while 41..44 are still
      // in flight. The batch is internally contiguous but does not follow
      // the checkpoint — the T4 guard must kill the query, not skip ahead.
      dropFile("late-head.jsonl", 45L to 50L)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
      assert(messages(ex).exists(_.contains("does not follow checkpoint")),
        messages(ex).mkString(" | "))
      // Nothing from the rejected batch committed; checkpoint unmoved.
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 40L)
      assert(store.tabletRows.filter(col("height") > 40).count() === 0L)
    } finally q.stop()

    // RECOVERY: the missing range lands; a fresh query over the directory
    // re-reads everything, the idempotent replay filter (num > checkpoint)
    // drops the already-committed 1..40, and 41..50 commit as one
    // contiguous batch.
    dropFile("gap-fill.jsonl", 41L to 44L)
    val src2 = LiveBlockSource.parseJsonFrames(
      s.readStream.text(inDir.getAbsolutePath).select(col("value")).as[java.lang.String])
    val q2 = pipeline.start(src2, tmpDir("ckpt2"), triggerMillis = 50)
    try {
      q2.processAllAvailable()
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 50L)
      assert(store.tabletRows.select("height").collect().map(_.getLong(0)).sorted
        === (1L to 50L).toArray)
    } finally q2.stop()
  }

  // Registry for the proto wire: collection 1 tablets use 2-char ids
  // ("t1"), collection 7 singlets use 2-char ids ("s1").
  private val idWidths = Map(1 -> 2, 7 -> 2)

  test("proto wire framing round-trips blocks exactly (binary payloads, " +
    "deletions, singlets); frames carry the gRPC flag+length header") {
    val blocks = Seq(block(0, "irreversible"), block(1, "new"),
      StreamedBlock("b2", "a1", 2, "new",
        Seq(TabletRowM(1, "t1", 2, "pk0", Array.emptyByteArray, true)),
        Seq(graft.model.SingletEntryM(7, "s1", 2, Array[Byte](0, 1, -1), false))))
    val wire = LiveBlockSource.toProtoFrames(blocks)
    // gRPC message header: flag byte 0, then 4-byte BE length.
    assert(wire(0) === 0.toByte)
    val len0 = ((wire(1) & 0xFF) << 24) | ((wire(2) & 0xFF) << 16) |
      ((wire(3) & 0xFF) << 8) | (wire(4) & 0xFF)
    assert(len0 > 0 && 5 + len0 < wire.length)
    val parsed = LiveBlockSource.decodeProtoFrames(wire, idWidths)
    assert(parsed.map(b => (b.id, b.parentId, b.num, b.step)) ===
      blocks.map(b => (b.id, b.parentId, b.num, b.step)))
    // Row/entry content round-trips; byte arrays compared via deep copy.
    parsed.zip(blocks).foreach { case (got, want) =>
      assert(got.tabletRows.map(r =>
        (r.collection, r.tabletId, r.height, r.primaryKey, r.value.toSeq, r.isDeletion)) ===
        want.tabletRows.map(r =>
          (r.collection, r.tabletId, r.height, r.primaryKey, r.value.toSeq, r.isDeletion)))
      assert(got.singletEntries.map(e =>
        (e.collection, e.singletId, e.height, e.value.toSeq, e.isDeletion)) ===
        want.singletEntries.map(e =>
          (e.collection, e.singletId, e.height, e.value.toSeq, e.isDeletion)))
    }
    // Re-encoding the parse reproduces the wire bytes — no drift possible.
    assert(LiveBlockSource.toProtoFrames(parsed).toSeq === wire.toSeq)
  }

  test("a torn proto frame FAILS the decode (FAILFAST) instead of dropping " +
    "the tail; compressed frames are rejected") {
    val wire = LiveBlockSource.toProtoFrames(Seq(block(0, "irreversible")))
    val torn = wire.dropRight(3)
    val ex = intercept[IllegalArgumentException] {
      LiveBlockSource.decodeProtoFrames(torn, idWidths)
    }
    assert(ex.getMessage.contains("torn frame"))
    // Truncated mid-header.
    intercept[IllegalArgumentException] {
      LiveBlockSource.decodeProtoFrames(wire ++ Array[Byte](0, 0), idWidths)
    }
    // Compressed flag over a payload that is NOT compressed (no codec
    // magic): loud, not a garbage decode.
    val compressed = wire.clone(); compressed(0) = 1
    assert(intercept[IllegalArgumentException] {
      LiveBlockSource.decodeProtoFrames(compressed, idWidths)
    }.getMessage.contains("compressed"))
    // Unknown flag value: loud.
    val badFlag = wire.clone(); badFlag(0) = 2
    assert(intercept[IllegalArgumentException] {
      LiveBlockSource.decodeProtoFrames(badFlag, idWidths)
    }.getMessage.contains("unknown frame flag"))
    // Unregistered collection: loud, not a silent skip.
    assert(intercept[IllegalArgumentException] {
      LiveBlockSource.decodeProtoFrames(wire, Map(9 -> 2))
    }.getMessage.contains("identifier width"))
  }

  test("compressed proto frames (flag=1, zstd and gzip): exact round-trip, " +
    "mixed plain/compressed chunks decode, torn and bit-flipped compressed " +
    "frames FAIL the decode instead of dropping or garbling a block") {
    val blocks = Seq(block(0, "irreversible"), block(1, "new"),
      StreamedBlock("b2", "a1", 2, "new",
        Seq(TabletRowM(1, "t1", 2, "pk0", Array.emptyByteArray, true)),
        Seq(graft.model.SingletEntryM(7, "s1", 2, Array[Byte](0, 1, -1), false))))
    val plain = LiveBlockSource.toProtoFrames(blocks)
    for (codec <- Seq("zstd", "gzip")) {
      val wire = LiveBlockSource.toProtoFrames(blocks, Some(codec))
      assert(wire(0) === 1.toByte, codec)
      val parsed = LiveBlockSource.decodeProtoFrames(wire, idWidths)
      // Decode is codec-transparent: re-encoding the parse plain
      // reproduces the plain wire byte-for-byte.
      assert(LiveBlockSource.toProtoFrames(parsed).toSeq === plain.toSeq, codec)
      // Torn inside the compressed payload → torn-frame error (the length
      // header spans bytes that never arrived).
      assert(intercept[IllegalArgumentException] {
        LiveBlockSource.decodeProtoFrames(wire.dropRight(3), idWidths)
      }.getMessage.contains("torn frame"), codec)
      // A producer/relay may interleave plain and compressed frames.
      val mixed = plain ++ wire
      assert(LiveBlockSource.decodeProtoFrames(mixed, idWidths).size
        === blocks.size * 2, codec)
      // Bit-flip fuzz over the compressed payload: every corruption must
      // surface loudly — either the codec's own integrity check, the
      // proto decode's write-field requirement, or the key parse — never
      // a silently different block set.
      val rnd = new scala.util.Random(42)
      (1 to 25).foreach { i =>
        val at = 5 + rnd.nextInt(wire.length - 5)
        val fuzzed = wire.clone()
        fuzzed(at) = (fuzzed(at) ^ (1 << rnd.nextInt(8))).toByte
        try {
          val out = LiveBlockSource.decodeProtoFrames(fuzzed, idWidths)
          assert(LiveBlockSource.toProtoFrames(out).toSeq === plain.toSeq,
            s"$codec flip #$i at byte $at decoded to DIFFERENT content silently")
        } catch { case _: Exception => () /* loud is the contract */ }
      }
    }
    // Unsupported codec name on the producer side: loud.
    assert(intercept[IllegalArgumentException] {
      LiveBlockSource.toProtoFrames(blocks, Some("lz4"))
    }.getMessage.contains("unsupported frame codec"))
  }

  test("proto-framed live source end-to-end: binary frame files drive the " +
    "pipeline, commits and speculative overlay match the JSON transport; a " +
    "torn frame kills the query instead of skipping a block") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    val inDir = new java.io.File(tmpDir("proto-frames"))
    def dropFile(name: String, blocks: Seq[StreamedBlock]): Unit = {
      val f = new java.io.File(inDir, name)
      val out = new java.io.FileOutputStream(f)
      try out.write(LiveBlockSource.toProtoFrames(blocks)) finally out.close()
    }
    dropFile("seg0.bin", (0L to 2L).map(block(_, "irreversible")))
    dropFile("seg1.bin", Seq(block(3, "irreversible"), block(4, "new"), block(5, "new")))
    val q = pipeline.start(
      LiveBlockSource.fromBinaryFiles(s, inDir.getAbsolutePath, idWidths),
      tmpDir("ckpt"), triggerMillis = 50)
    try {
      q.processAllAvailable()
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 3L)
      assert(store.tabletRows.select("height").collect().map(_.getLong(0)).sorted
        === Array(0L, 1L, 2L, 3L))
      val spec = pipeline.speculativeTabletRows("a5").get
      assert(spec.map(_.count()).sum === 2L)

      // A torn trailing frame in a later file is a query-killing error.
      val whole = LiveBlockSource.toProtoFrames(Seq(block(6, "irreversible")))
      val f = new java.io.File(inDir, "seg2-torn.bin")
      val out = new java.io.FileOutputStream(f)
      try out.write(whole, 0, whole.length - 2) finally out.close()
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
      assert(messages(ex).exists(_.contains("torn frame")), messages(ex).mkString(" | "))
      // Nothing from the torn file committed.
      assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 3L)
    } finally q.stop()
  }

  test("synthetic rate source soaks the commit path: contiguous chain from " +
    "startNum, checkpoint advances, payloads round-trip") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    val pipeline = new IngestionPipeline(store)
    val q = pipeline.start(
      LiveBlockSource.syntheticRate(s, blocksPerSecond = 100, collection = 1, startNum = 1L),
      tmpDir("ckpt"), triggerMillis = 50)
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!store.checkpoint(StateStore.GlobalCheckpointKey).exists(_.height >= 5L)
          && System.nanoTime() < deadline) {
        q.processAllAvailable()
        Thread.sleep(50)
      }
    } finally q.stop()
    val cp = store.checkpoint(StateStore.GlobalCheckpointKey).get
    assert(cp.height >= 5L)
    // Every height from startNum to the checkpoint committed exactly once.
    val heights = store.tabletRows.select("height").collect().map(_.getLong(0)).sorted
    assert(heights.takeWhile(_ <= cp.height).toSeq === (1L to cp.height))
    // Payload content is the deterministic generator's (hex of the height).
    val row = store.readTabletRowAt("synthetic", "pk001", cp.height).collect()
    assert(row.length === 1 &&
      new String(row.head.getAs[Array[Byte]]("value"), "UTF-8")
        === java.lang.Long.toHexString(row.head.getAs[Long]("height")))
  }
}
