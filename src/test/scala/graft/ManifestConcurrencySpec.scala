package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import graft.store.ManifestTable
import graft.store.ManifestTable.ConcurrentPublishException

/** Optimistic concurrency on the manifest commit protocol: the
  * generation-numbered delta sidecar is the mutual-exclusion token
  * (exclusive create before any shared metadata write), so two publishers
  * computing next = gen+1 can never both win — the round-15 soak's
  * compact-vs-merge race (both published, the later pointer swap silently
  * discarded the earlier commit) now loses LOUDLY and retries/recomputes.
  *
  * The deterministic interleavings use `beforeOwnHook` (fires after the
  * data write, immediately before the own attempt — the exact window a
  * concurrent publisher races in) and `failAfterOwn` (a crash between
  * sidecar create and pointer swap — the window the lease/takeover logic
  * exists for).
  */
class ManifestConcurrencySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("height", LongType),
    StructField("del", BooleanType), StructField("v", StringType)))

  private def df(rows: (String, Long, Boolean, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "height", "del", "v")
  }

  private def table(path: String, interval: Int = 1): ManifestTable =
    new ManifestTable(path, schema, statsCols = Seq("k"),
      checkpointInterval = interval)(spark)

  private def values(t: ManifestTable): Set[String] =
    t.read().collect().map(_.getAs[String]("v")).toSet

  private def byKeyOf(t: ManifestTable): Map[String, String] =
    t.read().collect().map(r =>
      r.getAs[String]("k") -> r.getAs[String]("v")).toMap

  private def oneShot(body: => Unit): () => Unit = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    () => if (fired.compareAndSet(false, true)) body
  }

  test("commit loses the generation race, retries, and BOTH commits land " +
    "— zero lost generations") {
    val path = tmpDir("occ-commit")
    val a = table(path)
    val b = table(path)
    // B publishes in exactly A's vulnerable window (data written, about
    // to own): A's own attempt then collides on the sidecar for gen 1,
    // re-reads the head, and retries at gen 2.
    a.beforeOwnHook = oneShot { b.commit(df(("kb", 1L, false, "vb")), "cB") }
    assert(a.commit(df(("ka", 1L, false, "va")), "cA"))
    assert(a.currentGeneration() === Some(2L))
    assert(values(a) === Set("va", "vb"))
    // Both generations resolve with the right commit order: B won gen 1.
    assert(a.manifestEntries(2L).map(_._1) === Seq("cB", "cA"))
  }

  test("interleaved committers under delta-only generations " +
    "(checkpointInterval > 1) keep reconstruction intact") {
    val path = tmpDir("occ-delta")
    val a = table(path, interval = 4)
    val b = table(path, interval = 4)
    a.beforeOwnHook = oneShot { b.commit(df(("kb", 1L, false, "vb")), "cB") }
    assert(a.commit(df(("ka", 1L, false, "va")), "cA"))
    (2 to 5).foreach(i => assert(a.commit(df((s"k$i", i.toLong, false, s"v$i")), s"c$i")))
    assert(a.currentGeneration() === Some(6L))
    assert(values(b) === Set("va", "vb", "v2", "v3", "v4", "v5"))
  }

  test("replaceAll that loses the race throws ConcurrentPublishException " +
    "(stale input must not clobber the winner)") {
    val path = tmpDir("occ-replace")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    val staleCompacted = a.read() // file list frozen at gen 1
    a.beforeOwnHook = oneShot { b.commit(df(("k2", 2L, false, "v2")), "c2") }
    val e = intercept[ConcurrentPublishException] {
      a.replaceAll(staleCompacted, "compact-1")
    }
    assert(e.getMessage.contains("stale"))
    // The winner's commit is fully intact.
    assert(values(b) === Set("v1", "v2"))
  }

  test("replaceAllRetrying re-derives from the new head: compaction beside " +
    "a live writer loses no commits and needs no pause") {
    val path = tmpDir("occ-replace-retry")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    a.beforeOwnHook = oneShot { b.commit(df(("k2", 2L, false, "v2")), "c2") }
    a.replaceAllRetrying(() => a.read().coalesce(1), "compact-1")
    // The recomputed replacement carried the concurrent commit through.
    assert(values(a) === Set("v1", "v2"))
    // And the table is actually compacted: one live entry.
    val gen = a.currentGeneration().get
    assert(a.manifestEntries(gen).map(_._1) === Seq("compact-1"))
  }

  test("replaceAllRetrying RESERVES the generation: a writer racing the " +
    "held derivation window blocks-and-retries, lands after the " +
    "compaction, and nothing is lost") {
    val path = tmpDir("occ-reserve")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    val writerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    var writer: Thread = null
    val mkDf: () => DataFrame = () => {
      // Fire a concurrent committer INSIDE the held window, then derive
      // slowly: the commit must conflict on our reserved sidecar and keep
      // retrying rather than publishing into the frozen base.
      if (writer == null) {
        writer = new Thread(() => {
          try { table(path).commit(df(("k2", 2L, false, "v2")), "c2") }
          catch { case e: Throwable => writerErr.set(e) }
          finally writerDone.set(true)
        }, "occ-racing-writer")
        writer.start()
        Thread.sleep(1500L)
        assert(!writerDone.get,
          "the racing commit must be BLOCKED while the reservation is held")
      }
      a.read().coalesce(1)
    }
    a.replaceAllRetrying(mkDf, "compact-1")
    writer.join(60000L)
    assert(writerErr.get() === null,
      s"racing commit must eventually land: ${writerErr.get()}")
    assert(writerDone.get)
    val t = table(path)
    val gen = t.currentGeneration().get
    assert(gen === 3L, "compact at gen 2, the blocked commit at gen 3")
    assert(t.manifestEntries(gen).map(_._1) === Seq("compact-1", "c2"))
    assert(values(t) === Set("v1", "v2"))
  }

  test("DEAD crash mid-reservation (no cleanup ran): the compactor's own " +
    "replay re-owns the placeholder and completes") {
    val path = tmpDir("occ-resv-crash")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    // failAfterOwn fires OUTSIDE the live-failure cleanup scope — the
    // process-death simulation, so the reservation stays behind.
    a.failAfterOwn = true
    intercept[IllegalStateException] {
      a.replaceAllRetrying(() => a.read(), "compact-1")
    }
    a.failAfterOwn = false
    // Nothing published; the orphaned reservation holds generation 2.
    assert(a.currentGeneration() === Some(1L))
    val replay = table(path)
    replay.replaceAllRetrying(() => replay.read().coalesce(1), "compact-1")
    assert(replay.currentGeneration() === Some(2L))
    assert(values(replay) === Set("v1"))
    assert(replay.manifestEntries(2L).map(_._1) === Seq("compact-1"))
  }

  test("COMPACTOR LEASE bounds the crash stall: a crashed replaceAll " +
    "reservation advertises the short heartbeating lease and is taken " +
    "over in seconds, not the global publish lease") {
    val path = tmpDir("occ-compact-lease")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    sys.props("graft.escalation.leaseMs") = "300"
    try {
      // Crash AFTER owning, BEFORE the heartbeat starts — the worst
      // case: the reservation is left behind with no beat ever written.
      a.failAfterOwn = true
      intercept[IllegalStateException] {
        a.replaceAllRetrying(() => a.read(), "compact-dead")
      }
      a.failAfterOwn = false
      Thread.sleep(400L) // past the advertised lease
      val b = table(path)
      val t0 = System.currentTimeMillis()
      assert(b.commit(df(("k2", 2L, false, "v2")), "c2"))
      val elapsed = System.currentTimeMillis() - t0
      assert(b.leaseTakeoverCount.get() === 1L,
        "the dead compactor reservation must be taken over at its " +
          "advertised lease")
      assert(elapsed < 30000L,
        s"takeover must ride the short advertised lease (${elapsed}ms), " +
          "not the global publish lease")
      assert(values(b) === Set("v1", "v2"))
      assert(b.verifyHead() === None)
    } finally sys.props.remove("graft.escalation.leaseMs")
  }

  test("COMPACTOR HEARTBEAT keeps a live replacement owned past the " +
    "short lease: a racing commit stays blocked through a derivation " +
    "3.5x the lease and lands after the compaction — no double publish") {
    val path = tmpDir("occ-compact-hb")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    sys.props("graft.escalation.leaseMs") = "1000"
    val racerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val racerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    var racer: Thread = null
    try {
      val hbBefore = a.reservationHeartbeatCount.get()
      a.replaceAllRetrying(() => {
        // Inside the held reservation: stall the derivation 3.5× the
        // advertised lease while a foreign commit polls. Without the
        // compactor heartbeat the racer would take the reservation over
        // at ~1 s and fence the live replacement.
        racer = new Thread(() => {
          try { table(path).commit(df(("k9", 9L, false, "v9")), "c9"); () }
          catch { case e: Throwable => racerErr.set(e) }
          finally racerDone.set(true)
        }, "compact-hb-racer")
        racer.start()
        Thread.sleep(3500L)
        assert(!racerDone.get,
          "the racing commit must stay blocked while the compactor's " +
            "heartbeats re-arm the short lease")
        a.read().coalesce(1)
      }, "compact-slow")
      assert(a.reservationHeartbeatCount.get() - hbBefore >= 2L,
        "the stalled compaction must have written heartbeats")
    } finally sys.props.remove("graft.escalation.leaseMs")
    racer.join(60000L)
    assert(racerErr.get() === null, s"racer must land after: ${racerErr.get()}")
    assert(racerDone.get)
    val t = table(path)
    // compact-slow at 2, the racer at 3 — generation ORDER proves the
    // compaction never lost its reservation.
    assert(t.currentGeneration() === Some(3L))
    assert(t.deltaEntry(2L).exists(_._1 == "compact-slow"))
    assert(t.deltaEntry(3L).exists(_._1 == "c9"))
    assert(byKeyOf(t) === Map("k1" -> "v1", "k9" -> "v9"))
    assert(t.verifyHead() === None)
    val fs = new org.apache.hadoop.fs.Path(s"$path/_manifests")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val markers = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_manifests"))
      .map(_.getPath.getName).filter(_.startsWith("hb-"))
    assert(markers.isEmpty, s"heartbeat markers must be reclaimed: ${markers.toSeq}")
  }

  test("LIVE derivation failure releases the reservation: other writers " +
    "proceed immediately instead of waiting out the lease") {
    val path = tmpDir("occ-resv-release")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    a.failBeforePublish = true // fails INSIDE the derivation (cleanup runs)
    intercept[IllegalStateException] {
      a.replaceAllRetrying(() => a.read(), "compact-1")
    }
    a.failBeforePublish = false
    // The reservation was released, so a writer lands with a TINY retry
    // budget — no lease wait, no takeover needed.
    sys.props("graft.publish.retryMs") = "300"
    try {
      val b = table(path)
      assert(b.commit(df(("k2", 2L, false, "v2")), "c2"))
      assert(values(b) === Set("v1", "v2"))
    } finally sys.props.remove("graft.publish.retryMs")
  }

  test("lease takeover MID-DERIVATION: the compactor detects the stolen " +
    "reservation before touching shared metadata, loses safely, and " +
    "re-derives — the takeover winner's commit survives") {
    val path = tmpDir("occ-takeover")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    sys.props("graft.publish.leaseMs") = "1"
    try {
      var calls = 0
      val mkDf: () => DataFrame = () => {
        calls += 1
        if (calls == 1) {
          // Inside A's held derivation: age the reservation past the
          // (tiny) lease, then let B take it over AND publish.
          Thread.sleep(50L)
          assert(b.commit(df(("k2", 2L, false, "v2")), "cB"),
            "B must take over the expired reservation and publish")
        }
        a.read().coalesce(1)
      }
      a.replaceAllRetrying(mkDf, "compact-1")
      assert(calls >= 2, "A must have re-derived after losing the takeover")
      // Zero lost commits: B's row survived A's compaction.
      assert(values(a) === Set("v1", "v2"))
      val gen = a.currentGeneration().get
      assert(gen === 3L, "B published gen 2; A re-derived and compacted at 3")
      assert(a.manifestEntries(gen).map(_._1) === Seq("compact-1"))
    } finally sys.props.remove("graft.publish.leaseMs")
  }

  test("merge that loses the race recomputes from the new head: the " +
    "winner's rows participate in the argmax") {
    val path = tmpDir("occ-merge")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B updates k2 at height 3 while A's merge (k2 at height 2) is in its
    // vulnerable window. Serializable outcome = merge-after-B: B's height-3
    // row must win the argmax over A's height-2 update.
    a.beforeOwnHook = oneShot { b.commit(df(("k2", 3L, false, "v2-b")), "cB") }
    val report = a.merge(df(("k2", 2L, false, "v2-a")), Seq("k"),
      orderCol = "height", deleteCol = "del", commitId = "m1")
    assert(report.applied)
    val byKey = a.read().collect().map(r =>
      r.getAs[String]("k") -> r.getAs[String]("v")).toMap
    assert(byKey("k2") === "v2-b",
      "the concurrent winner's later write must survive the recomputed merge")
    assert(byKey("k1") === "v1")
  }

  test("crash after owning: the same commitId's replay re-owns its sidecar " +
    "and completes") {
    val path = tmpDir("occ-replay")
    val a = table(path)
    a.failAfterOwn = true
    intercept[IllegalStateException] { a.commit(df(("k1", 1L, false, "v1")), "c1") }
    assert(a.currentGeneration() === None) // nothing published
    val replay = table(path)
    assert(replay.commit(df(("k1", 1L, false, "v1")), "c1"))
    assert(replay.currentGeneration() === Some(1L))
    assert(values(replay) === Set("v1"))
  }

  test("foreign dead attempt: blocks (loudly) inside the lease, taken over " +
    "after it expires") {
    val path = tmpDir("occ-lease")
    val a = table(path)
    a.failAfterOwn = true
    intercept[IllegalStateException] { a.commit(df(("k1", 1L, false, "vx")), "cDead") }
    val b = table(path)
    // Inside the lease: the orphan could be an in-flight publisher —
    // conflict, retry, give up loudly. Shrink the TIME budget so the
    // spec is fast.
    sys.props("graft.publish.retryMs") = "300"
    try {
      intercept[ConcurrentPublishException] {
        b.commit(df(("k2", 1L, false, "v2")), "cB")
      }
      assert(b.currentGeneration() === None)
      // Lease expired: the dead attempt is taken over and B's commit wins.
      sys.props("graft.publish.leaseMs") = "1"
      Thread.sleep(5L)
      assert(b.commit(df(("k2", 1L, false, "v2")), "cB"))
      assert(b.currentGeneration() === Some(1L))
      assert(values(b) === Set("v2"))
      val gen1 = b.manifestEntries(1L).map(_._1)
      assert(gen1 === Seq("cB"), s"dead attempt must not publish: $gen1")
    } finally {
      sys.props.remove("graft.publish.retryMs")
      sys.props.remove("graft.publish.leaseMs")
    }
  }

  test("published generations are immutable: a would-be publisher at an " +
    "already-published generation conflicts even past the lease") {
    val path = tmpDir("occ-immutable")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    sys.props("graft.publish.leaseMs") = "1"
    try {
      Thread.sleep(5L)
      // A fresh committer computes next = 2 normally; force a stale one by
      // replaying commitId c2 against an instance whose own attempt races a
      // sibling that already published gen 2 with a DIFFERENT id.
      val b = table(path)
      val c = table(path)
      b.beforeOwnHook = oneShot { c.commit(df(("k3", 3L, false, "v3")), "c3") }
      assert(b.commit(df(("k2", 2L, false, "v2")), "c2"))
      // c3 owns generation 2 (published, immutable even with leaseMs=1);
      // b retried to generation 3. History holds all three commits.
      assert(b.manifestEntries(3L).map(_._1) === Seq("c1", "c3", "c2"))
      assert(values(b) === Set("v1", "v2", "v3"))
    } finally sys.props.remove("graft.publish.leaseMs")
  }

  // ---------------------------------------------------------------------
  // Fencing token (g4): a paused-past-the-lease owner that wakes at its
  // pointer swap is rejected by CONTENT — the sidecar nonce (and, if it
  // re-clobbered the sidecar, the pointer frame's owner), never by timing.
  // ---------------------------------------------------------------------

  private def sidecarPath(root: String, gen: Long) =
    new org.apache.hadoop.fs.Path(f"$root/_manifests/d-$gen%09d.json")

  private def attemptDirs(root: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("d-")).toSet
  }

  test("FENCING: a committer paused at its swap past the lease wakes after " +
    "a takeover published — its swap is rejected by the sidecar nonce and " +
    "the commit re-lands at the next generation; zero lost commits") {
    val path = tmpDir("occ-fence")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    sys.props("graft.publish.leaseMs") = "1"
    try {
      a.beforePublishHook = oneShot {
        Thread.sleep(10L) // age a's reservation past the (tiny) lease
        assert(b.commit(df(("kb", 2L, false, "vb")), "cB"),
          "B must take over the expired reservation and publish generation 2")
      }
      assert(a.commit(df(("ka", 2L, false, "va")), "cA"))
      assert(a.fencedPublishCount.get() >= 1L,
        "A's first swap must have been fenced by content")
      assert(a.currentGeneration() === Some(3L),
        "B won generation 2; A's commit re-landed whole at 3")
      assert(a.manifestEntries(3L).map(_._1) === Seq("c1", "cB", "cA"))
      assert(values(a) === Set("v1", "vb", "va"))
      // The loser reclaimed its dead generation-2 staging; only live
      // attempt dirs remain — no sweep was run.
      assert(attemptDirs(path) === Set("d-c1-g1", "d-cB-g2", "d-cA-g3"))
      assert(table(path).verifyHead() === None)
    } finally sys.props.remove("graft.publish.leaseMs")
  }

  test("FENCING by the swap's CONTENT: a woken stale writer that " +
    "re-clobbers the sidecar with its own record is still rejected — the " +
    "g4 pointer frame names the real winner; verifyHead flags the damage") {
    val path = tmpDir("occ-fence-ptr")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    sys.props("graft.publish.leaseMs") = "1"
    try {
      a.beforePublishHook = oneShot {
        // Capture A's owned sidecar (A's record, A's nonce)...
        val sp = sidecarPath(path, 2L)
        val in = fs.open(sp)
        val aSidecar =
          try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
        Thread.sleep(10L)
        // ...let B take over and PUBLISH generation 2...
        assert(b.commit(df(("kb", 2L, false, "vb")), "cB"))
        // ...then simulate the worst interleaving: A's blind sidecar
        // overwrite lands AFTER B's publish (the one write the mtime
        // lease can never serialize).
        val out = fs.create(sp, true)
        try out.write(aSidecar) finally out.close()
        // The head is now inconsistent — pointer names B, sidecar says A —
        // and the cross-check SEES it.
        assert(table(path).verifyHead().isDefined,
          "verifyHead must flag a published generation whose sidecar was " +
            "overwritten after its publish")
      }
      val fencedBefore = a.fencedPublishCount.get()
      assert(a.commit(df(("ka", 2L, false, "va")), "cA"))
      assert(a.fencedPublishCount.get() > fencedBefore,
        "A's swap must have been rejected by the pointer frame's owner")
      assert(a.currentGeneration() === Some(3L))
      // Nothing lost: B's manifest for generation 2 survived (full-
      // manifest-wins), A re-landed at 3.
      assert(a.manifestEntries(3L).map(_._1) === Seq("c1", "cB", "cA"))
      assert(values(a) === Set("v1", "vb", "va"))
    } finally sys.props.remove("graft.publish.leaseMs")
  }

  test("FENCING on the compactor: replaceAllRetrying paused at its swap " +
    "past the lease loses to the takeover by content, reclaims its dead " +
    "staging, re-derives, and the takeover winner's commit survives") {
    val path = tmpDir("occ-fence-compact")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    sys.props("graft.publish.leaseMs") = "1"
    try {
      a.beforePublishHook = oneShot {
        Thread.sleep(10L)
        assert(b.commit(df(("kb", 2L, false, "vb")), "cB"),
          "B must take over the compactor's expired reservation")
      }
      a.replaceAllRetrying(() => a.read().coalesce(1), "compact-1")
      assert(a.fencedPublishCount.get() >= 1L)
      assert(a.currentGeneration() === Some(3L))
      assert(a.manifestEntries(3L).map(_._1) === Seq("compact-1"))
      assert(values(a) === Set("v1", "vb"),
        "the takeover winner's row must survive the re-derived compaction")
      // The fenced first attempt's staging (d-compact-1-g2) was reclaimed
      // by the loser itself; what remains is the live replacement plus
      // prior generations' dirs (retained for time travel, sweepOrphans'
      // contract) — no DEAD attempt dir lingers without a sweep.
      assert(attemptDirs(path) ===
        Set("d-c1-g1", "d-cB-g2", "d-compact-1-g3"))
    } finally sys.props.remove("graft.publish.leaseMs")
  }

  test("REPAIR at the swap: a clobber landing AFTER this attempt's " +
    "pointer swap is detected by the post-swap re-read and the sidecar " +
    "is repaired from the record in hand — the publish succeeds, the " +
    "head is coherent") {
    val path = tmpDir("occ-repair")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // Simulate a fenced concurrent publisher's blind overwrite landing
    // in the instant between A's swap and A's post-swap re-read: foreign
    // record, foreign nonce. (A real one would shortly lose at its own
    // pointer arbitration; its overwrite is what A must repair.)
    a.afterSwapHook = oneShot {
      val sp = sidecarPath(path, 2L)
      val out = fs.create(sp, true)
      try out.write(
        ("""{"owner":"deadbeefdeadbeefdeadbeefdeadbeef","commit_id":"intruder",""" +
          """"rewrite":false,"files":["d-intruder-g2/x.parquet"]}""" + "\n")
          .getBytes("UTF-8"))
      finally out.close()
    }
    assert(a.commit(df(("k2", 2L, false, "v2")), "c2"),
      "the publish must SUCCEED — the pointer names this attempt")
    assert(a.currentGeneration() === Some(2L))
    // The sidecar was repaired: generation 2's record is c2's again, and
    // the head cross-check is clean.
    assert(a.deltaRecord(2L).map(_.entry.commitId) === Some("c2"))
    assert(table(path).verifyHead() === None)
    assert(values(a) === Set("v1", "v2"))
  }

  test("MERGE REBASE: a merge that loses its race to a DISJOINT commit " +
    "re-stamps its staged attempt onto the new head — no recompute, the " +
    "staged directory publishes under the later generation") {
    val path = tmpDir("occ-rebase-merge")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B lands k3 in exactly A's own window — disjoint from A's touched
    // key k2, and c1's matched file is untouched, so the staged argmax
    // is still the serializable outcome at the new head.
    a.beforeOwnHook = oneShot { b.commit(df(("k3", 2L, false, "v3")), "cB") }
    val report = a.merge(df(("k2", 2L, false, "v2x")), Seq("k"),
      orderCol = "height", deleteCol = "del", commitId = "m1")
    assert(report.applied)
    assert(a.currentGeneration() === Some(3L))
    assert(a.rebasedMergeCount.get() === 1L)
    // The staged dir keeps its DERIVATION-time name (g2) and is published
    // under generation 3 — liveness is path references, not dir names.
    assert(attemptDirs(path) === Set("d-c1-g1", "d-cB-g2", "d-m1-g2"))
    val m1Files = a.manifestEntries(3L).collect { case ("m1", fs) => fs }.flatten
    assert(m1Files.nonEmpty && m1Files.forall(_.startsWith("d-m1-g2/")))
    val byKey = a.read().collect().map(r =>
      r.getAs[String]("k") -> r.getAs[String]("v")).toMap
    assert(byKey === Map("k1" -> "v1", "k2" -> "v2x", "k3" -> "v3"))
    // The reclaim guard and the sweep both treat the rebased dir as live.
    assert(a.sweepOrphans(retainGenerations = 1).forall(_ != s"$path/d-m1-g2"))
    assert(attemptDirs(path).contains("d-m1-g2"))
    assert(byKeyOf(a) === Map("k1" -> "v1", "k2" -> "v2x", "k3" -> "v3"))
  }

  test("MERGE REBASE rejected on OVERLAP: a lost race against a commit " +
    "touching the same key recomputes — the winner's row participates in " +
    "the argmax (serializable), the dead staged dir is reclaimed") {
    val path = tmpDir("occ-rebase-overlap")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B lands a HIGHER row for the same key A is merging: the rebase
    // check sees an added file whose bounds contain k2 and refuses; the
    // recompute's argmax then includes B's row, which outranks A's
    // update — merge-after-their-commit, exactly serializable.
    a.beforeOwnHook = oneShot { b.commit(df(("k2", 5L, false, "v2w")), "cB") }
    val report = a.merge(df(("k2", 2L, false, "v2x")), Seq("k"),
      orderCol = "height", deleteCol = "del", commitId = "m1")
    assert(report.applied)
    assert(a.currentGeneration() === Some(3L))
    assert(a.rebasedMergeCount.get() === 0L)
    assert(a.lostRaceCount.get() + a.fencedPublishCount.get() >= 1L)
    // The first derivation (g2) was reclaimed at recompute time; the
    // recomputed attempt published as g3.
    assert(attemptDirs(path) === Set("d-c1-g1", "d-cB-g2", "d-m1-g3"))
    assert(byKeyOf(a) === Map("k1" -> "v1", "k2" -> "v2w"))
  }

  test("MERGE REBASE rejected when a MATCHED file was rewritten: a " +
    "compaction landing in the window forces the recompute even though " +
    "the key sets are disjoint") {
    val path = tmpDir("occ-rebase-compact")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B compacts (rewrites every file, including the one A's derivation
    // consumed): A's staged argmax read rows that may no longer be the
    // head's truth — matched-file liveness fails, recompute.
    a.beforeOwnHook = oneShot {
      b.replaceAllRetrying(() => b.read().coalesce(1), "compact-B")
    }
    val report = a.merge(df(("k2", 2L, false, "v2x")), Seq("k"),
      orderCol = "height", deleteCol = "del", commitId = "m1")
    assert(report.applied)
    assert(a.currentGeneration() === Some(3L))
    assert(a.rebasedMergeCount.get() === 0L)
    assert(byKeyOf(a) === Map("k1" -> "v1", "k2" -> "v2x"))
  }

  test("LOSER CLEANUP: replaceAll that throws on a lost race reclaims its " +
    "dead staged replacement") {
    val path = tmpDir("occ-clean-replace")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    val stale = a.read()
    a.beforeOwnHook = oneShot { b.commit(df(("k2", 2L, false, "v2")), "c2") }
    intercept[ConcurrentPublishException] { a.replaceAll(stale, "compact-1") }
    assert(attemptDirs(path) === Set("d-c1-g1", "d-c2-g2"))
    assert(values(b) === Set("v1", "v2"))
  }

  test("ORPHAN-MANIFEST GUARD: a delta-only committer paused past the " +
    "lease between own and its orphan-manifest delete is fenced before " +
    "the delete — a takeover's PUBLISHED full manifest survives") {
    val path = tmpDir("occ-orphan-guard")
    val a = table(path, interval = 4)
    val b = table(path, interval = 4)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1")) // gen 1, delta-only
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // Full manifests are owner-suffixed objects (m-<gen>.<nonce>.json).
    def fullManifest2Exists: Boolean = {
      val d = new org.apache.hadoop.fs.Path(s"$path/_manifests")
      fs.exists(d) && fs.listStatus(d).exists { st =>
        val n = st.getPath.getName
        n.startsWith(f"m-${2L}%09d.") && n.endsWith(".json")
      }
    }
    sys.props("graft.publish.leaseMs") = "1"
    try {
      // A owns generation 2 (delta-only: 2 % 4 != 0), then pauses past
      // the lease. B's compaction takes over the reservation and
      // publishes generation 2 WITH a full manifest (replaceAll writes
      // one at every generation). A wakes exactly at its orphan-manifest
      // delete — the one write that, unguarded, would destroy B's
      // committed rewrite (whose content a delta walk cannot recover).
      a.afterOwnHook = oneShot {
        Thread.sleep(10L)
        b.replaceAllRetrying(() => b.read().coalesce(1), "compact-B")
        assert(fullManifest2Exists,
          "B's compaction must have published a full manifest at gen 2")
      }
      val fencedBefore = a.fencedPublishCount.get()
      assert(a.commit(df(("ka", 2L, false, "va")), "cA"))
      assert(a.fencedPublishCount.get() > fencedBefore,
        "A must have been fenced BEFORE the orphan-manifest delete")
      assert(fullManifest2Exists,
        "the takeover's published full manifest must survive A's wake-up")
      assert(a.currentGeneration() === Some(3L))
      assert(a.manifestEntries(3L).map(_._1) === Seq("compact-B", "cA"))
      assert(values(a) === Set("v1", "va"))
      assert(table(path, interval = 4).verifyHead() === None)
    } finally sys.props.remove("graft.publish.leaseMs")
  }

  test("LOSS ESCALATION: a merge whose derivation was invalidated past " +
    "rebasing recomputes under a RESERVATION — the recompute cannot lose " +
    "(a writer racing the reserved window blocks and lands after), " +
    "bounding derivations at two under any compactor cadence") {
    val path = tmpDir("occ-escalate")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B's compaction lands in A's first own window: A's derivation is
    // invalidated past rebasing (every matched file rewritten) — the
    // recompute-spiral trigger. The escalated recompute then RESERVES
    // its generation; a commit racing that window must block (the same
    // reservation contract replaceAllRetrying pins) and land after.
    val racerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val racerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    var racer: Thread = null
    a.beforeOwnHook = oneShot {
      b.replaceAllRetrying(() => b.read().coalesce(1), "compact-B")
    }
    val escalatedBefore = a.escalatedMergeCount.get()
    a.beforeManifestWriteHook = oneShot {
      // Fires inside the ESCALATED publish tail (first manifest write
      // after the recompute): the reservation is held here — launch a
      // racing commit and give it time to collide with the hold.
      racer = new Thread(() => {
        try { table(path).commit(df(("k9", 9L, false, "v9")), "c9") }
        catch { case e: Throwable => racerErr.set(e) }
        finally racerDone.set(true)
      }, "occ-escalate-racer")
      racer.start()
      Thread.sleep(1500L)
      assert(!racerDone.get,
        "the racing commit must be BLOCKED while the escalated merge " +
          "holds its reservation")
    }
    val report = a.merge(df(("k2", 5L, false, "v2x")), Seq("k"),
      orderCol = "height", deleteCol = "del", commitId = "m1")
    assert(report.applied)
    assert(a.escalatedMergeCount.get() === escalatedBefore + 1L,
      "the recompute must have run under the escalation reservation")
    racer.join(60000L)
    assert(racerErr.get() === null, s"racer must land after: ${racerErr.get()}")
    assert(racerDone.get)
    val t = table(path)
    // compact-B at 2, the escalated merge at 3, the blocked commit at 4.
    assert(t.currentGeneration() === Some(4L))
    assert(byKeyOf(t) ===
      Map("k1" -> "v1", "k2" -> "v2x", "k9" -> "v9"))
    assert(t.verifyHead() === None)
  }

  test("MANIFEST SHADOW closed (delta-only winner): a merge paused past " +
    "the lease between its stillOwns re-check and its manifest write " +
    "lands an ignored orphan OBJECT — the winner's delta-only generation " +
    "resolves to the winner, and the sweep reclaims the orphan") {
    val path = tmpDir("occ-manifest-shadow")
    val a = table(path, interval = 4)
    val b = table(path, interval = 4)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1")) // gen 1, delta-only
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def gen2Manifests: Seq[String] = {
      val d = new org.apache.hadoop.fs.Path(s"$path/_manifests")
      fs.listStatus(d).map(_.getPath.getName).toSeq
        .filter(n => n.startsWith(f"m-${2L}%09d.") && n.endsWith(".json"))
        .sorted
    }
    sys.props("graft.publish.leaseMs") = "1"
    try {
      // A's merge owns generation 2, passes its stillOwns re-check, then
      // pauses past the (shortened) lease AT the manifest write. B's
      // plain commit takes over and publishes generation 2 DELTA-ONLY
      // (2 % 4 != 0 — B writes no full manifest of its own). A wakes,
      // writes its manifest, and is fenced at the swap. On the old
      // unsuffixed layout A's late write WAS the generation-2 manifest:
      // full-manifest-wins would read A's uncommitted merge, B's commit
      // would vanish from every read, and the sweep would compute
      // liveness from the stale file set — silent loss that verifyHead
      // cannot see (pointer and sidecar both name B). Owner-suffixed
      // objects make A's write an orphan nobody consults.
      a.beforeManifestWriteHook = oneShot {
        Thread.sleep(10L)
        assert(b.commit(df(("kb", 2L, false, "vb")), "cB"))
      }
      val report = a.merge(df(("k1", 5L, false, "v1x")), Seq("k"),
        orderCol = "height", deleteCol = "del", commitId = "m1")
      assert(report.applied)
      assert(a.fencedPublishCount.get() >= 1L,
        "A must have been fenced at its swap after the takeover")
      assert(a.currentGeneration() === Some(3L))
      // Generation 2 resolves to B's COMMIT, not A's stale manifest: the
      // core assertion — B's row is visible at 2, A's merge only at 3.
      assert(byKeyOf(table(path, interval = 4)) ===
        Map("k1" -> "v1x", "kb" -> "vb"))
      val at2 = a.readAt(2L).collect()
        .map(r => r.getAs[String]("k") -> r.getAs[String]("v")).toMap
      assert(at2 === Map("k1" -> "v1", "kb" -> "vb"),
        "generation 2 must be the winner's delta-only state")
      // A's stale attempt manifest exists as an orphan object at gen 2
      // (the retried merge published ITS manifest at gen 3).
      assert(gen2Manifests.size === 1, gen2Manifests)
      // The sweep reclaims it once aged past lease + retry (shrunk here;
      // retryMs only shrinks AFTER the merge so the merge's own retry
      // budget was never in play).
      sys.props("graft.publish.retryMs") = "1"
      Thread.sleep(30L)
      val swept = a.sweepOrphans(retainGenerations = 3, minAgeMillis = 0L)
      assert(swept.exists(_.startsWith(f"m-${2L}%09d.")),
        s"the orphan attempt manifest must be swept: $swept")
      assert(gen2Manifests.isEmpty)
      // And the authoritative metadata is untouched by the sweep.
      assert(byKeyOf(table(path, interval = 4)) ===
        Map("k1" -> "v1x", "kb" -> "vb"))
    } finally {
      sys.props.remove("graft.publish.leaseMs")
      sys.props.remove("graft.publish.retryMs")
    }
  }

  test("MANIFEST SHADOW closed (full-manifest winner): a paused loser's " +
    "late manifest write cannot CLOBBER a takeover compaction's published " +
    "manifest — attempts never share a manifest object") {
    val path = tmpDir("occ-manifest-clobber")
    val a = table(path, interval = 4)
    val b = table(path, interval = 4)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    sys.props("graft.publish.leaseMs") = "1"
    try {
      // B's compaction publishes generation 2 WITH a full manifest while
      // A is paused at its own manifest write for the same generation.
      // Unsuffixed, A's wake-up overwrote B's committed rewrite manifest
      // in place — a corrupted committed generation (B's kept files
      // invisible, the sweep eating them). Now they are different
      // objects; resolution follows the sidecar owner (B).
      a.beforeManifestWriteHook = oneShot {
        Thread.sleep(10L)
        b.replaceAllRetrying(() => b.read().coalesce(1), "compact-B")
      }
      val report = a.merge(df(("k1", 5L, false, "v1x")), Seq("k"),
        orderCol = "height", deleteCol = "del", commitId = "m1")
      assert(report.applied)
      assert(a.currentGeneration() === Some(3L))
      // Generation 2 IS the compaction, fully intact.
      assert(a.manifestEntries(2L).map(_._1) === Seq("compact-B"))
      val at2 = a.readAt(2L).collect()
        .map(r => r.getAs[String]("k") -> r.getAs[String]("v")).toMap
      assert(at2 === Map("k1" -> "v1"))
      assert(byKeyOf(a) === Map("k1" -> "v1x"))
      assert(table(path, interval = 4).verifyHead() === None)
    } finally sys.props.remove("graft.publish.leaseMs")
  }

  test("legacy layout compatibility: a generation whose sidecar names an " +
    "owner but whose manifest is the pre-r18 UNSUFFIXED object (an r17 " +
    "writer) still resolves through the legacy fallback") {
    val path = tmpDir("occ-legacy-manifest")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    // Simulate the r17 layout: move the owned manifest to the unsuffixed
    // legacy name (r17 writers wrote m-<gen>.json with owner sidecars).
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mdir = new org.apache.hadoop.fs.Path(s"$path/_manifests")
    val owned = fs.listStatus(mdir).map(_.getPath)
      .filter(p => p.getName.startsWith(f"m-${1L}%09d.") &&
        p.getName != f"m-${1L}%09d.json")
    assert(owned.length === 1, owned.map(_.getName).toSeq)
    assert(fs.rename(owned.head,
      new org.apache.hadoop.fs.Path(mdir, f"m-${1L}%09d.json")))
    val fresh = table(path)
    assert(fresh.manifestEntries(1L).map(_._1) === Seq("c1"))
    assert(values(fresh) === Set("v1"))
    // And new commits on top of the legacy generation work unchanged.
    assert(fresh.commit(df(("k2", 2L, false, "v2")), "c2"))
    assert(values(table(path)) === Set("v1", "v2"))
  }

  test("LOSER CLEANUP defers while the generation is UNPUBLISHED: a " +
    "give-up against a live foreign reservation keeps its staged dir (a " +
    "same-commitId sibling may be mid-staging into the very same path); " +
    "the age-gated sweep reclaims it once provably dead") {
    val path = tmpDir("occ-defer-clean")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    // A live-looking FOREIGN reservation holds generation 2 (fresh
    // mtime, inside the default lease), so a's commit can neither own
    // nor take over — it gives up after its (shortened) retry budget.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sp = sidecarPath(path, 2L)
    fs.mkdirs(sp.getParent)
    val out = fs.create(sp, false)
    try out.write(
      ("""{"owner":"feedfacefeedfacefeedfacefeedface","commit_id":"foreign",""" +
        """"rewrite":false,"files":[]}""" + "\n").getBytes("UTF-8"))
    finally out.close()
    sys.props("graft.publish.retryMs") = "300"
    try {
      intercept[ConcurrentPublishException] {
        a.commit(df(("kx", 2L, false, "vx")), "cX")
      }
      // The staged dir SURVIVES the give-up: generation 2 is unpublished,
      // so "foreign-held" proves nothing about d-cX-g2 — a sibling replay
      // of cX could be staging into that exact path right now, invisible
      // to any holder check. Deleting here could hand it a partial file
      // set to publish.
      assert(attemptDirs(path).contains("d-cX-g2"),
        "give-up must NOT reclaim a staged dir under an unpublished generation")
      // Once the generation resolves (the foreign holder dies; a real
      // commit wins it), the dir is provably dead and the normal
      // reclamation paths apply — here via the sweep.
      assert(fs.delete(sp, false))
      val b = table(path)
      assert(b.commit(df(("kb", 2L, false, "vb")), "cB"))
      val swept = b.sweepOrphans(retainGenerations = 1, minAgeMillis = 0L)
      assert(swept.contains("d-cX-g2"), s"sweep must reclaim the dead dir: $swept")
      assert(values(b) === Set("v1", "vb"))
    } finally sys.props.remove("graft.publish.retryMs")
  }

  test("stress: two live MERGERS race barrier-synchronized rounds over " +
    "disjoint and shared keys with a mid-storm compaction — the final " +
    "state equals the sequential LWW oracle and generations = applied " +
    "merges + compactions (every loss reconciled, nothing lost, nothing " +
    "double-published)") {
    // The in-CI distillation of graft.SoakContend: same workload shape
    // (private key ranges → the rebase-eligible class; shared keys every
    // 4th round → overlap recomputes; one whole-table compaction → the
    // rebase-ineligible class), same exact-state obligation, two real
    // unsynchronized handles in one JVM instead of N processes. Heights
    // are globally unique (round*2 + writer), so the expected LWW state
    // is computable without reference to race outcomes — every merge
    // must APPLY (unique commitIds; a skip would be a lost commit).
    val path = tmpDir("occ-merge-storm")
    val rounds = 8
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val handles = Seq(table(path), table(path))
    assert(handles.head.commit(df(("seed", 0L, false, "v0")), "c-seed"))
    val threads = (0 to 1).map { w =>
      new Thread(() => {
        try {
          val t = handles(w)
          (1 to rounds).foreach { r =>
            val shared = r % 4 == 0
            val keys =
              if (shared) Seq("sh-k0", "sh-k1")
              else (0 until 3).map(j => s"own-$w-k$j")
            val h = r.toLong * 2 + w
            barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
            val report = t.merge(
              df(keys.map(k => (k, h, false, s"w$w-r$r")): _*),
              Seq("k"), orderCol = "height", deleteCol = "del",
              commitId = s"m-$w-$r")
            assert(report.applied, s"merge m-$w-$r must apply exactly once")
            if (w == 0 && r == 5)
              t.replaceAllRetrying(() => t.read().coalesce(1), "compact-mid")
          }
        } catch { case e: Throwable => errs.add(e) }
      }, s"occ-merger-$w")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(180000L))
    assert(errs.isEmpty, s"merger failed: ${Option(errs.peek()).map(_.toString)}")
    val t = table(path)
    // Exact LWW oracle: own keys end at their owner's last own round;
    // shared keys end at the highest shared-round height (writer 1's
    // round 8 = height 17); the seed row rides through untouched.
    val lastOwn = (1 to rounds).filter(_ % 4 != 0).max
    val expected = (for {
      w <- 0 to 1; j <- 0 until 3
    } yield s"own-$w-k$j" -> s"w$w-r$lastOwn").toMap ++
      Map("sh-k0" -> "w1-r8", "sh-k1" -> "w1-r8", "seed" -> "v0")
    assert(byKeyOf(t) === expected)
    // One generation per applied publish: seed + 16 merges + 1 compaction.
    assert(t.currentGeneration() === Some(2L * rounds + 2L))
    // Every commitId present exactly once in the final history.
    val ids = t.manifestEntries(2L * rounds + 2L).map(_._1)
    assert(ids.sorted === ids.distinct.sorted)
  }

  test("stress: two live writers race unsynchronized — every commit lands " +
    "exactly once, generations = total commits") {
    val path = tmpDir("occ-stress")
    val perWriter = 4
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("A", "B").map { who =>
      new Thread(() => {
        try {
          val t = table(path)
          (1 to perWriter).foreach { i =>
            assert(t.commit(df((s"k-$who-$i", i.toLong, false, s"v-$who-$i")),
              s"c-$who-$i"))
          }
        } catch { case e: Throwable => errs.add(e) }
      }, s"occ-writer-$who")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000L))
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
    val t = table(path)
    assert(t.currentGeneration() === Some(2L * perWriter))
    assert(values(t).size === 2 * perWriter)
    // Idempotency across the contended history: every commitId present once.
    val ids = t.manifestEntries(2L * perWriter).map(_._1)
    assert(ids.sorted === ids.distinct.sorted)
    assert(ids.size === 2 * perWriter)
  }

  // ---------------------------------------------------------------------
  // Orphan-manifest sweep vs a STALLED-BUT-LIVE publisher (round-19,
  // ADVICE): beyond the head, age alone is not death evidence — the
  // sidecar is.
  // ---------------------------------------------------------------------

  private def plantFile(root: String, rel: String, body: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$rel")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  test("ORPHAN-MANIFEST SWEEP consults the sidecar beyond the head: a " +
    "publisher stalled between its manifest write and its pointer swap " +
    "keeps its manifest at ANY age while its reservation is un-taken-over " +
    "— waking and committing yields an intact generation") {
    val path = tmpDir("occ-sweep-stalled")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    a.beforePublishHook = () => { entered.countDown(); gate.await() }
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val t = new Thread(() => {
      try { a.commit(df(("k2", 2L, false, "v2")), "c2"); () }
      catch { case e: Throwable => err.set(e) }
    }, "stalled-publisher")
    t.start()
    assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // A's generation-2 full manifest + owned sidecar exist; the pointer
    // is still at 1 and no contender will ever take the reservation
    // over. Age the manifest OBJECT far past the sweep's lease+retry
    // floor (the stall, fast-forwarded) — the sidecar keeps its fresh
    // content either way, and the sweep judges by content, not age. The
    // maintenance-sized minAge keeps the in-flight STAGED DATA out of
    // the directory-level sweep, per its beside-a-live-writer contract.
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mdir = new org.apache.hadoop.fs.Path(s"$path/_manifests")
    val aged = System.currentTimeMillis() - 2L * 3600L * 1000L
    fsys.listStatus(mdir).map(_.getPath)
      .filter(_.getName.startsWith(f"m-${2L}%09d."))
      .foreach(p => fsys.setTimes(p, aged, aged))
    val swept = b.sweepOrphans(retainGenerations = 1, minAgeMillis = 60000L)
    assert(!swept.exists(_.startsWith(f"m-${2L}%09d.")),
      s"a live un-taken-over attempt's manifest must survive the sweep: $swept")
    gate.countDown()
    t.join(60000L)
    assert(err.get() === null, s"the stalled commit must complete: ${err.get()}")
    // The woken publisher committed generation 2 WITH its full manifest
    // intact — before the sidecar-consulting sweep, the manifest was
    // gone and every read of the table threw 'metadata damaged'.
    val fresh = table(path)
    assert(fresh.currentGeneration() === Some(2L))
    assert(fresh.manifestEntries(2L).map(_._1) === Seq("c1", "c2"))
    assert(values(fresh) === Set("v1", "v2"))
    assert(fresh.verifyHead() === None)
  }

  test("ORPHAN-MANIFEST SWEEP still reclaims provably-dead attempts " +
    "beyond the head: reservation released (no sidecar) or taken over " +
    "(foreign nonce); an un-taken-over one is kept") {
    val path = tmpDir("occ-sweep-dead")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    val manifestLine = """{"commit_id":"x","files":[]}""" + "\n"
    // gen 5 > head, no sidecar: the attempt released its reservation.
    plantFile(path, f"_manifests/m-${5L}%09d.deadbeef.json", manifestLine)
    // gen 6 > head, sidecar taken over by a DIFFERENT nonce.
    plantFile(path, f"_manifests/m-${6L}%09d.deadbeef.json", manifestLine)
    plantFile(path, f"_manifests/d-${6L}%09d.json",
      """{"owner":"feedfacefeedface","commit_id":"y","rewrite":false,"files":[]}""" + "\n")
    // gen 7 > head, sidecar still carries the attempt's own nonce: a
    // stalled-but-live reservation — must be KEPT.
    plantFile(path, f"_manifests/m-${7L}%09d.cafebabe.json", manifestLine)
    plantFile(path, f"_manifests/d-${7L}%09d.json",
      """{"owner":"cafebabe","commit_id":"z","rewrite":false,"files":[]}""" + "\n")
    // HEARTBEAT MARKERS follow the same evidence rule: published (gen 1
    // <= head) always dead once aged; taken-over (gen 6) dead;
    // un-taken-over (gen 7) kept.
    plantFile(path, f"_manifests/hb-${1L}%09d.feedface", "1")
    plantFile(path, f"_manifests/hb-${6L}%09d.deadbeef", "1")
    plantFile(path, f"_manifests/hb-${7L}%09d.cafebabe", "1")
    sys.props("graft.publish.leaseMs") = "1"
    sys.props("graft.publish.retryMs") = "1"
    try {
      Thread.sleep(30L)
      val swept = a.sweepOrphans(retainGenerations = 1, minAgeMillis = 0L)
      assert(swept.contains(f"m-${5L}%09d.deadbeef.json"), swept)
      assert(swept.contains(f"m-${6L}%09d.deadbeef.json"), swept)
      assert(!swept.contains(f"m-${7L}%09d.cafebabe.json"), swept)
      assert(swept.contains(f"hb-${1L}%09d.feedface"), swept)
      assert(swept.contains(f"hb-${6L}%09d.deadbeef"), swept)
      assert(!swept.contains(f"hb-${7L}%09d.cafebabe"), swept)
    } finally {
      sys.props.remove("graft.publish.leaseMs")
      sys.props.remove("graft.publish.retryMs")
    }
  }

  test("ESCALATION LEASE bounds the crash stall: a dead escalated " +
    "reservation (sidecar advertising a short lease) is taken over in " +
    "seconds, while an equivalent record without one holds the full " +
    "publish lease") {
    val path = tmpDir("occ-esc-lease")
    val a = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    // A crashed escalated merge: a generation-2 reservation advertising
    // a 300 ms lease that no heartbeat will ever refresh again.
    plantFile(path, f"_manifests/d-${2L}%09d.json",
      """{"owner":"deadbeefdeadbeef","lease":300,"commit_id":"dead-esc",""" +
        """"rewrite":true,"fresh":[],"files":[]}""" + "\n")
    Thread.sleep(400L)
    val t0 = System.currentTimeMillis()
    val b = table(path)
    assert(b.commit(df(("k2", 2L, false, "v2")), "c2"))
    val elapsed = System.currentTimeMillis() - t0
    assert(b.leaseTakeoverCount.get() === 1L,
      "the dead escalation must be taken over at its advertised lease")
    assert(elapsed < 30000L,
      s"takeover must not wait out the 10-minute publish lease (${elapsed}ms)")
    assert(values(b) === Set("v1", "v2"))
    assert(b.verifyHead() === None)
    // CONTROL: the same record WITHOUT an advertised lease keeps the
    // generous global floor — a short-retry commit gives up loudly
    // instead of taking over.
    plantFile(path, f"_manifests/d-${3L}%09d.json",
      """{"owner":"deadbeefdeadbeef","commit_id":"dead-full",""" +
        """"rewrite":true,"fresh":[],"files":[]}""" + "\n")
    sys.props("graft.publish.retryMs") = "1500"
    try {
      intercept[ConcurrentPublishException] {
        table(path).commit(df(("k3", 3L, false, "v3")), "c3")
      }
    } finally sys.props.remove("graft.publish.retryMs")
  }

  test("ESCALATION HEARTBEAT keeps a live derivation owned past the " +
    "short lease: a commit racing the stalled-but-heartbeating window " +
    "blocks and lands after the merge; the merge never loses its " +
    "reservation") {
    val path = tmpDir("occ-esc-heartbeat")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B's compaction invalidates A's derivation past rebasing — the
    // escalation trigger (same scaffolding as the LOSS ESCALATION spec).
    a.beforeOwnHook = oneShot {
      b.replaceAllRetrying(() => b.read().coalesce(1), "compact-B")
    }
    sys.props("graft.escalation.leaseMs") = "1000"
    val racerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val racerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    var racer: Thread = null
    a.duringEscalatedDeriveHook = oneShot {
      // Inside the escalated reservation, before the derivation: stall
      // 3.5× the escalation lease. Without heartbeats the racing commit
      // below would take the reservation over at ~1 s and the merge
      // would lose mid-derivation; with them the reservation's mtime
      // keeps re-arming and the racer stays blocked.
      racer = new Thread(() => {
        try { table(path).commit(df(("k9", 9L, false, "v9")), "c9"); () }
        catch { case e: Throwable => racerErr.set(e) }
        finally racerDone.set(true)
      }, "esc-hb-racer")
      racer.start()
      Thread.sleep(3500L)
      assert(!racerDone.get,
        "the racing commit must stay blocked while heartbeats re-arm " +
          "the short escalation lease")
    }
    try {
      val hbBefore = a.reservationHeartbeatCount.get()
      val report = a.merge(df(("k2", 5L, false, "v2x")), Seq("k"),
        orderCol = "height", deleteCol = "del", commitId = "m1")
      assert(report.applied)
      assert(a.reservationHeartbeatCount.get() - hbBefore >= 2L,
        "the stalled derivation must have written heartbeats")
    } finally sys.props.remove("graft.escalation.leaseMs")
    racer.join(60000L)
    assert(racerErr.get() === null, s"racer must land after: ${racerErr.get()}")
    assert(racerDone.get)
    val t = table(path)
    // compact-B at 2, the heartbeat-protected merge at 3, the racer at
    // 4 — generation ORDER proves the merge never lost its reservation.
    assert(t.currentGeneration() === Some(4L))
    assert(t.deltaEntry(3L).exists(_._1 == "m1"),
      "the escalated merge must have published at its reserved generation")
    assert(t.deltaEntry(4L).exists(_._1 == "c9"))
    assert(byKeyOf(t) ===
      Map("k1" -> "v1", "k2" -> "v2x", "k9" -> "v9"))
    assert(t.verifyHead() === None)
    // The heartbeat MARKER (attempt-unique hb-<gen>.<nonce>) is reclaimed
    // when the heartbeat stops — no shared metadata was ever written.
    val fs = new org.apache.hadoop.fs.Path(s"$path/_manifests")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val markers = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_manifests"))
      .map(_.getPath.getName).filter(_.startsWith("hb-"))
    assert(markers.isEmpty, s"heartbeat markers must be reclaimed: ${markers.toSeq}")
  }

  test("ESCALATION HEARTBEAT spans the publish TAIL: a merge whose " +
    "derivation-to-publish tail outlives the short lease keeps its " +
    "reservation — the marker is reclaimed only after the pointer swap, " +
    "so no takeover window opens between derivation end and publish") {
    val path = tmpDir("occ-esc-hb-tail")
    val a = table(path)
    val b = table(path)
    assert(a.commit(df(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B's compaction invalidates A's derivation past rebasing — the
    // escalation trigger (same scaffolding as the heartbeat spec above).
    a.beforeOwnHook = oneShot {
      b.replaceAllRetrying(() => b.read().coalesce(1), "compact-B")
    }
    sys.props("graft.escalation.leaseMs") = "1000"
    val racerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val racerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    var racer: Thread = null
    a.beforeEscalatedTailHook = oneShot {
      // AFTER the derivation returns, BEFORE the publish tail: stall
      // 3.5× the escalation lease. The old design stopped the heartbeat
      // (deleting the marker) at exactly this point, dropping the
      // takeover clock back to the placeholder's mtime — a polling
      // contender would read the reservation as expired and take over,
      // fencing a COMPLETED derivation. With the marker armed through
      // the tail the racer must stay blocked.
      racer = new Thread(() => {
        try { table(path).commit(df(("k9", 9L, false, "v9")), "c9"); () }
        catch { case e: Throwable => racerErr.set(e) }
        finally racerDone.set(true)
      }, "esc-hb-tail-racer")
      racer.start()
      Thread.sleep(3500L)
      assert(!racerDone.get,
        "the racing commit must stay blocked while heartbeats keep the " +
          "finished-but-unpublished derivation's reservation armed")
    }
    try {
      val report = a.merge(df(("k2", 5L, false, "v2x")), Seq("k"),
        orderCol = "height", deleteCol = "del", commitId = "m1")
      assert(report.applied,
        "the merge must publish — a takeover during the tail would fence it")
      assert(a.fencedPublishCount.get() === 0L,
        "no tail-window fencing: the heartbeat kept the reservation")
    } finally sys.props.remove("graft.escalation.leaseMs")
    racer.join(60000L)
    assert(racerErr.get() === null, s"racer must land after: ${racerErr.get()}")
    assert(racerDone.get)
    val t = table(path)
    // compact-B at 2, the tail-stalled merge at 3, the racer at 4 —
    // generation ORDER proves the reservation survived the stalled tail.
    assert(t.currentGeneration() === Some(4L))
    assert(t.deltaEntry(3L).exists(_._1 == "m1"),
      "the escalated merge must have published at its reserved generation")
    assert(t.deltaEntry(4L).exists(_._1 == "c9"))
    assert(byKeyOf(t) === Map("k1" -> "v1", "k2" -> "v2x", "k9" -> "v9"))
    assert(t.verifyHead() === None)
    val fs = new org.apache.hadoop.fs.Path(s"$path/_manifests")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val markers = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_manifests"))
      .map(_.getPath.getName).filter(_.startsWith("hb-"))
    assert(markers.isEmpty, s"heartbeat markers must be reclaimed: ${markers.toSeq}")
  }

  test("MIXED-FLEET SHADOW suppressed: a published generation whose " +
    "winner was a pre-fencing delta-only writer (ownerless sidecar) does " +
    "NOT resolve to a surviving post-upgrade loser's attempt manifest") {
    val path = tmpDir("occ-mixed-shadow")
    val a = table(path, interval = 4) // gens 1-3 delta-only
    assert(a.commit(df(("k1", 1L, false, "v1")), "c1"))
    assert(a.commit(df(("k2", 2L, false, "v2")), "c2"))
    assert(a.commit(df(("k3", 3L, false, "v3")), "c3"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // Simulate the pre-fencing winner: strip the owner from generation
    // 2's sidecar (an r16-era writer records no nonce).
    val sp = sidecarPath(path, 2L)
    val in = fs.open(sp)
    val line =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val stripped = line.replaceFirst(""""owner":"[0-9a-fA-F]+",""", "")
    assert(stripped != line, "sidecar must have carried an owner")
    plantFile(path, f"_manifests/d-${2L}%09d.json", stripped)
    // The surviving post-upgrade loser: a fenced attempt's manifest whose
    // listing points at files the committed history never had.
    plantFile(path, f"_manifests/m-${2L}%09d.deadbeef.json",
      """{"commit_id":"loser","files":["d-evil-g2/part-0.parquet"]}""" + "\n")
    // Resolution must follow the delta reconstruction (the ownerless
    // sidecar proves a delta-only winner), never the loser's listing.
    val fresh = table(path, interval = 4)
    assert(fresh.manifestEntries(2L).map(_._1) === Seq("c1", "c2"))
    val at2 = fresh.readAt(2L).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("v")).toMap
    assert(at2 === Map("k1" -> "v1", "k2" -> "v2"))
    assert(byKeyOf(fresh) ===
      Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v3"))
  }
}
