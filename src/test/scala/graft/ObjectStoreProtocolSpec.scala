package graft

import graft.model._
import graft.store.StateStore

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The ManifestTable commit protocol driven over [[RenamelessFileSystem]] —
  * a store where rename is copy+delete and can fail between the halves.
  * Every prior spec ran on POSIX, where directory rename is atomic anyway;
  * these cases prove the "S3-safe by design" claim the same way
  * StateStoreSpec's crash injection proved checkpoint-last:
  *
  *  - visibility metadata (_gen pointer, manifests, checkpoint log) only
  *    ever moves via single-FILE operations; directory renames are confined
  *    to the committer's staging inside each `d-<commit>` attempt dir,
  *    where atomicity is irrelevant (nothing references the files yet);
  *  - a pointer swap that fails OUTRIGHT leaves the old generation whole;
  *  - a pointer swap that fails AFTER the copy (visible-but-reported-
  *    failed, the classic non-atomic-rename hazard) replays as an
  *    idempotent skip — no duplication, checkpoint catches up;
  *  - time travel and orphan sweep behave identically through the shim.
  */
class ObjectStoreProtocolSpec extends SparkTestBase {

  spark.sparkContext.hadoopConfiguration.set(
    s"fs.${RenamelessFileSystem.Scheme}.impl",
    classOf[RenamelessFileSystem].getName)

  private def objDir(prefix: String): String =
    s"${RenamelessFileSystem.Scheme}:" + tmpDir(prefix)

  private def req(h: Long, rows: (String, String, String)*): WriteRequest =
    WriteRequest(h, BlockRef(s"blk-$h", h),
      rows.map { case (t, pk, v) =>
        TabletRowM(1, t, h, pk, v.getBytes("UTF-8"), v.isEmpty) },
      Nil)

  test("object-store commit: publish rides on single-file operations only; " +
    "directory renames stay inside unpublished attempt dirs") {
    implicit val s = spark
    RenamelessFileSystem.reset()
    val root = objDir("obj-store")
    val store = new StateStore(root, StateStore.ManifestCommit)
    store.writeBatch(Seq(req(0, ("t1", "a", "a0")), req(1, ("t1", "b", "b1"))))
    store.writeBatch(Seq(req(2, ("t1", "c", "c2"))))
    assert(store.tabletRows.count() === 3L)
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 2L)
    assert(store.readTabletAt("t1", 2L).count() === 3L)

    val renames = RenamelessFileSystem.recorded
    assert(renames.nonEmpty)
    // The generation pointer swap is a single small FILE, tmp → _gen.
    val pointerSwaps = renames.filter(_.dst.endsWith("/_gen"))
    assert(pointerSwaps.nonEmpty)
    pointerSwaps.foreach { r =>
      assert(!r.srcIsDir, s"pointer swap must be a file: $r")
      // Attempt-unique staging: `_gen.<nonce>.tmp`, never a shared tmp
      // two live publishers could interleave on.
      assert(r.src.matches(".*/_gen\\.[0-9a-f]+\\.tmp"),
        s"unexpected pointer source: $r")
    }
    // Manifests are never renamed into place (create-overwrite only).
    assert(!renames.exists(_.dst.contains("/_manifests/")))
    // Any directory rename is committer staging INSIDE a d-<commit> attempt
    // dir — invisible until the manifest references its files.
    renames.filter(_.srcIsDir).foreach { r =>
      assert(r.dst.contains("/d-"),
        s"directory rename outside an attempt dir: $r")
    }
    // The checkpoint log moves via single-file staged renames too.
    renames.filter(_.dst.contains("/checkpoints/")).foreach { r =>
      assert(!r.srcIsDir, s"checkpoint publish must be a file: $r")
    }
  }

  test("pointer swap fails outright: old generation intact, checkpoint " +
    "holds, replay commits exactly once") {
    implicit val s = spark
    RenamelessFileSystem.reset()
    val store = new StateStore(objDir("obj-fail"), StateStore.ManifestCommit)
    store.writeBatch(Seq(req(0, ("t1", "a", "a0")), req(1, ("t1", "b", "b1"))))

    RenamelessFileSystem.arm(RenamelessFileSystem.FailBeforeCopy, "/_gen")
    intercept[java.io.IOException] {
      store.writeBatch(Seq(req(2, ("t1", "c", "c2"))))
    }
    // Readers resolve pointer → manifest → files: nothing advanced.
    assert(store.tabletRows.count() === 2L)
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 1L)
    // Restart replay: the linearity guard re-admits the batch; the
    // deterministic attempt dir is rewritten, not duplicated.
    store.writeBatch(Seq(req(2, ("t1", "c", "c2"))))
    assert(store.tabletRows.count() === 3L)
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 2L)
    assert(store.readTabletAt("t1", 2L).collect()
      .map(_.getString(0)).sorted.toSeq === Seq("a", "b", "c"))
  }

  test("pointer swap fails AFTER the copy (visible-but-failed window): " +
    "replay is an idempotent skip, no duplication, checkpoint catches up, " +
    "lingering tmp is harmless") {
    implicit val s = spark
    RenamelessFileSystem.reset()
    val store = new StateStore(objDir("obj-window"), StateStore.ManifestCommit)
    store.writeBatch(Seq(req(0, ("t1", "a", "a0"))))

    RenamelessFileSystem.arm(
      RenamelessFileSystem.FailBetweenCopyAndDelete, "/_gen")
    intercept[java.io.IOException] {
      store.writeBatch(Seq(req(1, ("t1", "b", "b1"))))
    }
    // The copy landed whole, so the batch IS visible — the hazard is the
    // writer believing it failed. The checkpoint (ordered last) did not
    // advance, so the guard re-admits the height…
    assert(store.tabletRows.count() === 2L)
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 0L)
    // …and the replay deduplicates on commit id instead of double-writing.
    store.writeBatch(Seq(req(1, ("t1", "b", "b1"))))
    assert(store.tabletRows.count() === 2L)
    assert(store.checkpoint(StateStore.GlobalCheckpointKey).get.height === 1L)
    // The orphaned _gen.tmp from the failed swap does not block later
    // commits (created with overwrite).
    store.writeBatch(Seq(req(2, ("t1", "c", "c2"))))
    assert(store.tabletRows.count() === 3L)
  }

  test("checkpoint-log publish fails after the copy: checkpoint became " +
    "visible, the cache self-heals on replay, no double-write") {
    implicit val s = spark
    RenamelessFileSystem.reset()
    val store = new StateStore(objDir("obj-cp"), StateStore.ManifestCommit)
    store.writeBatch(Seq(req(0, ("t1", "a", "a0"))))
    // Arm the fault for the NEXT checkpoint file publish (cp-…-1.json):
    // the copy lands (checkpoint durable) but the writer sees a failure
    // AFTER the data table already advanced.
    RenamelessFileSystem.arm(
      RenamelessFileSystem.FailBetweenCopyAndDelete, "-1.json")
    intercept[java.io.IOException] {
      store.writeBatch(Seq(req(1, ("t1", "b", "b1"))))
    }
    // Data committed (checkpoint is ordered last, so the batch is whole);
    // the durable log holds height 1 even though the writer crashed.
    assert(store.tabletRows.count() === 2L)
    // A RESTARTED store (fresh cache) reads the durable log: height 1.
    val reopened = new StateStore(store.root, StateStore.ManifestCommit)
    assert(reopened.checkpoint(StateStore.GlobalCheckpointKey).get.height === 1L)
    // The crashed writer's own replay attempt is rejected by the guard
    // read from the durable log — no double-write window.
    intercept[IllegalArgumentException] {
      reopened.writeBatch(Seq(req(1, ("t1", "b", "b1"))))
    }
    reopened.writeBatch(Seq(req(2, ("t1", "c", "c2"))))
    assert(reopened.tabletRows.count() === 3L)
    assert(reopened.checkpoint(StateStore.GlobalCheckpointKey).get.height === 2L)
  }

  test("time travel and retention sweep through the shim match the POSIX " +
    "behavior exactly") {
    implicit val s = spark
    import s.implicits._
    RenamelessFileSystem.reset()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val mt = new graft.store.ManifestTable(objDir("obj-tt"), schema)
    def df(rows: (Long, String)*) = rows.toDF("id", "v")
    def setAt(g: Long) = mt.readAt(g).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mt.commit(df(1L -> "a"), "c1"))
    assert(mt.commit(df(2L -> "b"), "c2"))
    mt.replaceAll(df(9L -> "z"), "c3")
    assert(mt.currentGeneration() === Some(3L))
    assert(setAt(1) === Set(1L -> "a"))
    assert(setAt(2) === Set(1L -> "a", 2L -> "b"))
    assert(setAt(3) === Set(9L -> "z"))
    val swept = mt.sweepOrphans()
    assert(swept.toSet === Set("d-c1-g1", "d-c2-g2"))
    assert(setAt(3) === Set(9L -> "z"))
    intercept[Exception] { setAt(2) }
  }

  test("CONDITIONAL CREATE store class (HDFS / S3 with conditional PUT): " +
    "two publishers racing the same generation through the shim — the " +
    "atomic create-if-absent serializes them end-to-end, zero loss, " +
    "clean fencing metadata") {
    implicit val s = spark
    import s.implicits._
    RenamelessFileSystem.reset() // default mode: ConditionalCreate
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val root = objDir("obj-cond")
    val a = new graft.store.ManifestTable(root, schema)
    val b = new graft.store.ManifestTable(root, schema)
    def df(rows: (Long, String)*) = rows.toDF("id", "v").coalesce(1)
    assert(a.commit(df(1L -> "v1"), "c1"))
    // B commits INSIDE A's create call, immediately before A's atomic
    // PUT for the generation-2 sidecar: the conditional create must
    // reject A (the object now exists), never silently overwrite.
    RenamelessFileSystem.armCreateWindow(
      f"/_manifests/d-${2L}%09d.json") {
      assert(b.commit(df(2L -> "vb"), "cB"))
    }
    assert(a.commit(df(3L -> "va"), "cA"))
    assert(a.currentGeneration() === Some(3L))
    assert(a.manifestEntries(3L).map(_._1) === Seq("c1", "cB", "cA"))
    assert(a.read().collect().map(_.getString(1)).toSet ===
      Set("v1", "vb", "va"))
    // Generation 2's metadata is the WINNER's, coherently: sidecar and
    // manifest agree, head cross-check is clean.
    assert(a.deltaRecord(2L).map(_.entry.commitId) === Some("cB"))
    assert(a.verifyHead() === None)
  }

  test("TOCTOU store class (raw local mount, no conditional create): a " +
    "racer landing inside the exists-to-create window is silently " +
    "overwritten — mutual exclusion demonstrably fails at the primitive, " +
    "and the protocol degrades to fenced-but-corrupted metadata (the " +
    "README's store-requirements table names the required config)") {
    implicit val s = spark
    import s.implicits._
    RenamelessFileSystem.reset()
    RenamelessFileSystem.createMode = RenamelessFileSystem.ToctouCreate
    try {
      // PRIMITIVE level: create(overwrite=false) with a racer in the
      // window raises no error and truncates the racer's object — the
      // exact contract violation the protocol's safety note documents.
      val fs = new org.apache.hadoop.fs.Path(objDir("obj-toctou-prim"))
        .getFileSystem(spark.sessionState.newHadoopConf())
      val probe = new org.apache.hadoop.fs.Path(
        objDir("obj-toctou-prim"), "token.json")
      RenamelessFileSystem.armCreateWindow("/token.json") {
        val out = fs.create(probe, true)
        try out.write("racer".getBytes("UTF-8")) finally out.close()
      }
      val out = fs.create(probe, false) // must throw on a safe store
      try out.write("blind".getBytes("UTF-8")) finally out.close()
      val in = fs.open(probe)
      val won = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      assert(won === "blind",
        "TOCTOU create silently overwrote the racer — mutual exclusion " +
          "does NOT hold on this store class")

      // PROTOCOL level: the same race through commit(), on an
      // interval-1 table (every generation checkpointed). The fencing
      // keeps both commits' ROWS: the stale publisher is rejected by
      // the pointer's content and re-lands — and its RETRY reads the
      // winner's manifest because resolution follows the POINTER's
      // owner while the damaged generation is the head (the one object
      // the clobberer cannot fake). But generation 2's sidecar was
      // blindly overwritten AFTER the winner published, so once the
      // head moves on, that generation's attribution follows the lying
      // sidecar (delta reconstruction) — the winner's own manifest
      // object survives on disk as evidence, unreferenced. On
      // DELTA-ONLY generations (checkpointInterval > 1) the same
      // overwrite is strictly worse: the winner's commit is silently
      // lost (README scopes the claim). Detectable at the head
      // (verifyHead), not preventable without a conditional create:
      // this store class is documented UNSAFE for multi-writer
      // deployments, full stop.
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      val root = objDir("obj-toctou")
      val a = new graft.store.ManifestTable(root, schema)
      val b = new graft.store.ManifestTable(root, schema)
      def df(rows: (Long, String)*) = rows.toDF("id", "v").coalesce(1)
      assert(a.commit(df(1L -> "v1"), "c1"))
      RenamelessFileSystem.armCreateWindow(
        f"/_manifests/d-${2L}%09d.json") {
        assert(b.commit(df(2L -> "vb"), "cB"))
      }
      assert(a.commit(df(3L -> "va"), "cA"))
      // Zero lost ROWS here (the fencing held the pointer)...
      assert(a.currentGeneration() === Some(3L))
      assert(a.read().collect().map(_.getString(1)).toSet ===
        Set("v1", "vb", "va"))
      // ...but generation 2's sidecar carries the LOSER's record, so
      // its HISTORICAL attribution now follows the lie — the metadata
      // corruption a conditional create prevents. The winner's manifest
      // object survives under its own nonce (attempt-unique manifests),
      // and the winner's files stay live through the head's manifest.
      assert(a.deltaRecord(2L).map(_.entry.commitId) === Some("cA"))
      assert(a.manifestEntries(2L).map(_._1) === Seq("c1", "cA"))
      val mdir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
      val gen2Objects = fs.listStatus(mdir).map(_.getPath.getName)
        .filter(n => n.startsWith(f"m-${2L}%09d.") && n.endsWith(".json"))
      assert(gen2Objects.length === 1,
        "the winner's gen-2 manifest object must survive the clobber " +
          s"as on-disk evidence: ${gen2Objects.toSeq}")
      assert(a.manifestEntries(3L).map(_._1) === Seq("c1", "cB", "cA"))
    } finally RenamelessFileSystem.reset()
  }

  test("sweep races a concurrent cleaner: a directory vanishing between " +
    "the root listing and the age probe is skipped, never thrown — the " +
    "16-min two-writer soak's observed interleaving, pinned") {
    implicit val s = spark
    import s.implicits._
    RenamelessFileSystem.reset()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val root = objDir("obj-sweep-race")
    val mt = new graft.store.ManifestTable(root, schema)
    def df(rows: (Long, String)*) = rows.toDF("id", "v").coalesce(1)
    assert(mt.commit(df(1L -> "a"), "c1"))
    assert(mt.commit(df(2L -> "b"), "c2"))
    mt.replaceAll(df(9L -> "z"), "c3") // d-c1-g1 and d-c2-g2 now orphans
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // A "concurrent cleaner" (a lost-race publisher reclaiming its own
    // dead attempt, another process's sweep) deletes d-c1-g1 exactly
    // between the sweep's root listing and its per-directory age probe
    // — the interleaving that killed the first round-17 soak run.
    RenamelessFileSystem.armListWindow("/d-c1-g1") {
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/d-c1-g1"), true)
    }
    Thread.sleep(5L) // both orphans older than the 1 ms age guard
    val swept = mt.sweepOrphans(retainGenerations = 1, minAgeMillis = 1L)
    // No throw; the vanished dir is simply not a victim (already gone —
    // the sweep's goal state); the other orphan swept normally.
    assert(swept === Seq("d-c2-g2"))
    assert(mt.read().collect().map(_.getString(1)).toSet === Set("z"))
  }

  test("merge through the shim: a publish that lands its pointer copy but " +
    "reports failure replays as an idempotent skip; fail-before-copy " +
    "leaves the old generation whole and a retry completes") {
    implicit val s = spark
    import s.implicits._
    RenamelessFileSystem.reset()
    val schema = StructType(Seq(
      StructField("k", org.apache.spark.sql.types.StringType),
      StructField("h", LongType),
      StructField("v", org.apache.spark.sql.types.StringType),
      StructField("del", org.apache.spark.sql.types.BooleanType)))
    val mt = new graft.store.ManifestTable(objDir("obj-merge"), schema,
      statsCols = Seq("k"))
    def df(rows: (String, Long, String, Boolean)*) =
      rows.toDF("k", "h", "v", "del").coalesce(1)
    def live = mt.read().where(!org.apache.spark.sql.functions.col("del"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    mt.commit(df(("a", 1, "a1", false), ("b", 1, "b1", false)), "c0")

    // Fail OUTRIGHT before the pointer copy: old generation intact, the
    // same-commitId retry completes (crash replay rewrites the same dir).
    RenamelessFileSystem.arm(RenamelessFileSystem.FailBeforeCopy, "/_gen")
    intercept[java.io.IOException] {
      mt.merge(df(("a", 2, "a2", false)), Seq("k"), "h", "del", "m1")
    }
    assert(mt.currentGeneration() === Some(1L))
    assert(live === Set(("a", 1L, "a1"), ("b", 1L, "b1")))
    assert(mt.merge(df(("a", 2, "a2", false)), Seq("k"), "h", "del", "m1").applied)
    assert(live === Set(("a", 2L, "a2"), ("b", 1L, "b1")))

    // Pointer COPY lands, caller sees failure (the classic non-atomic
    // rename window): the generation is already visible, and the replayed
    // merge under the SAME commitId skips instead of double-applying.
    RenamelessFileSystem.arm(RenamelessFileSystem.FailBetweenCopyAndDelete, "/_gen")
    intercept[java.io.IOException] {
      mt.merge(df(("b", 3, "b3", false)), Seq("k"), "h", "del", "m2")
    }
    assert(mt.currentGeneration() === Some(3L), "the copy half landed")
    assert(live === Set(("a", 2L, "a2"), ("b", 3L, "b3")))
    assert(!mt.merge(df(("b", 3, "b3", false)), Seq("k"), "h", "del", "m2").applied)
    assert(live === Set(("a", 2L, "a2"), ("b", 3L, "b3")))
  }

  test("changefeed + materializer over the shim: a merge-publish fault " +
    "mid-stream kills the query; a restarted materializer converges to " +
    "readTabletAt with no duplication") {
    implicit val s = spark
    RenamelessFileSystem.reset()
    val root = objDir("obj-mat")
    val target = objDir("obj-mat-target")
    val ck = tmpDir("obj-mat-ck") // checkpoint on reliable local storage
    val store = new StateStore(root, StateStore.ManifestCommit)

    def serving = graft.streaming.StateMaterializer.read(target)
      .collect().map(r => (r.getString(1), r.getString(3), r.getLong(2),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toSet
    def asOf(h: Long) = store.readTabletAt("t1", h)
      .collect().map(r => ("t1", r.getString(0), r.getLong(1),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toSet

    val q1 = graft.streaming.StateMaterializer.start(store, target, ck)
    val died =
      try {
        store.writeBatch(Seq(req(1, ("t1", "a", "a1")), req(2, ("t1", "b", "b2"))))
        q1.processAllAvailable()
        assert(serving === asOf(2))
        // Arm a fault on the TARGET's pointer swap BEFORE committing (the
        // stream polls asynchronously, so arming after the commit races
        // the trigger loop), scoped to the target's own pointer path so
        // the source store's generation swap cannot consume it: the merge
        // of the next batch publishes its generation (copy landed) but
        // reports failure, killing the streaming query mid-batch.
        RenamelessFileSystem.arm(
          RenamelessFileSystem.FailBetweenCopyAndDelete,
          target.stripPrefix(s"${RenamelessFileSystem.Scheme}:") + "/_gen")
        store.writeBatch(Seq(req(3, ("t1", "a", "a3"))))
        q1.processAllAvailable()
        None
      } catch { case e: Throwable => Some(e) }
      finally {
        try q1.stop()
        catch { case _: Throwable => () } // a failed query may rethrow on stop
      }
    assert(died.exists(e => Option(e.getMessage).exists(_.contains("injected")) ||
      Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("injected")))),
      s"expected the injected fault to kill the query, got $died")

    // Restart: the engine replays the uncommitted batch (new run token →
    // new merge commitId); the half-published generation is visible and
    // the argmax absorbs the re-merge — no duplication, state converges.
    val q2 = graft.streaming.StateMaterializer.start(store, target, ck)
    try {
      q2.processAllAvailable()
      assert(serving === asOf(3))
      store.writeBatch(Seq(req(4, ("t1", "c", "c4"))))
      q2.processAllAvailable()
      assert(serving === asOf(4))
    } finally q2.stop()
  }

  // ------------------------------------------------------------------
  // CONDITIONAL-WRITE store class ([[ConditionalFileSystem]] — the same
  // object-store shim plus If-Match preconditions). These pin that the
  // capability CLOSES the residual mtime-lease TOCTOU family outright;
  // stores WITHOUT it keep the guarded behavior the specs above and
  // ManifestConcurrencySpec pin (re-checks + head-check-detectable
  // damage). README "Store requirements" documents both classes.
  // ------------------------------------------------------------------

  spark.sparkContext.hadoopConfiguration.set(
    s"fs.${ConditionalFileSystem.Scheme}.impl",
    classOf[ConditionalFileSystem].getName)

  private val mtSchema = StructType(Seq(
    StructField("k", StringType), StructField("height", LongType),
    StructField("del", org.apache.spark.sql.types.BooleanType),
    StructField("v", StringType)))

  private def mdf(rows: (String, Long, Boolean, String)*) = {
    import spark.implicits._
    rows.toDF("k", "height", "del", "v")
  }

  private def mtable(path: String): graft.store.ManifestTable =
    new graft.store.ManifestTable(path, mtSchema, statsCols = Seq("k"))(spark)

  private def oneShot(body: => Unit): () => Unit = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    () => if (fired.compareAndSet(false, true)) body
  }

  private def condDir(prefix: String): String =
    s"${ConditionalFileSystem.Scheme}:" + tmpDir(prefix)

  private def rawSidecar(path: String, gen: Long): String = {
    val p = new org.apache.hadoop.fs.Path(
      f"$path/_manifests/d-$gen%09d.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  test("conditional store, uncontended path: commits/merges ride the " +
    "ordinary protocol and never consult the precondition machinery") {
    implicit val s = spark
    RenamelessFileSystem.reset(); ConditionalFileSystem.reset()
    val path = condDir("cond-smoke")
    val t = mtable(path)
    assert(t.commit(mdf(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    assert(t.merge(mdf(("k2", 5L, false, "v2x")), Seq("k"),
      orderCol = "height", deleteCol = "del", commitId = "m1").applied)
    assert(t.read().collect().map(_.getAs[String]("v")).toSet ===
      Set("v1", "v2x"))
    assert(t.verifyHead() === None)
    assert(ConditionalFileSystem.casAttempts.get() === 0,
      "an uncontended publish must never pay a conditional call")
  }

  test("conditional store closes the escalated-tail TOCTOU: a legal " +
    "takeover in the check-to-write instant is REFUSED by the store's " +
    "If-Match — zero sidecar damage, both commits land at distinct " +
    "generations") {
    implicit val s = spark
    RenamelessFileSystem.reset(); ConditionalFileSystem.reset()
    val path = condDir("cond-esc-tail")
    val a = mtable(path)
    val b = mtable(path)
    assert(a.commit(mdf(("k1", 1L, false, "v1"), ("k2", 1L, false, "v2")), "c1"))
    // B's compaction invalidates A's derivation past rebasing — the
    // escalation trigger (ManifestConcurrencySpec scaffolding).
    a.beforeOwnHook = oneShot {
      b.replaceAllRetrying(() => b.read().coalesce(1), "compact-B")
    }
    sys.props("graft.escalation.leaseMs") = "1000"
    a.beforeEscalatedSwapHook = oneShot {
      // Simulate a HOST FREEZE inside the stillOwns-to-write instant:
      // beats stop, the reservation ages past its advertised lease, and
      // a foreign publisher performs a fully LEGAL takeover + publish.
      a.pauseEscalationHeartbeat = true
      Thread.sleep(700L) // let any in-flight beat land before aging
      val dir = new org.apache.hadoop.fs.Path(s"$path/_manifests")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("hb-")).foreach(fs.delete(_, false))
      val sidecar = new org.apache.hadoop.fs.Path(
        f"$path/_manifests/d-${3L}%09d.json")
      fs.setTimes(sidecar, System.currentTimeMillis() - 10000L, -1L)
      assert(b.commit(mdf(("k9", 9L, false, "v9")), "c9"),
        "the takeover commit must land at the escalated generation")
      assert(b.leaseTakeoverCount.get() === 1L)
    }
    try {
      val report = a.merge(mdf(("k2", 5L, false, "v2x")), Seq("k"),
        orderCol = "height", deleteCol = "del", commitId = "m1")
      assert(report.applied, "the fenced merge must recover and publish")
    } finally {
      sys.props.remove("graft.escalation.leaseMs")
      a.pauseEscalationHeartbeat = false
    }
    // The store REFUSED A's late placeholder→record swap: c9's published
    // record at generation 3 was never clobbered (a blind overwrite
    // would have replaced it with m1's entry before any re-check).
    assert(ConditionalFileSystem.casRefusals.get() >= 1,
      "the late swap must be refused by the precondition, not guarded after")
    assert(a.fencedPublishCount.get() >= 1L)
    val t = mtable(path)
    assert(t.currentGeneration() === Some(4L))
    assert(t.deltaEntry(3L).exists(_._1 == "c9"),
      s"generation 3 must be the takeover's record: ${rawSidecar(path, 3L)}")
    assert(t.deltaEntry(4L).exists(_._1 == "m1"))
    assert(t.read().collect().map(r =>
      r.getAs[String]("k") -> r.getAs[String]("v")).toMap ===
      Map("k1" -> "v1", "k2" -> "v2x", "k9" -> "v9"))
    assert(t.verifyHead() === None)
  }

  test("conditional store refuses a takeover racing a woken holder: the " +
    "holder's re-owned sidecar survives byte-intact and the contender " +
    "conflicts loudly instead of clobbering") {
    implicit val s = spark
    RenamelessFileSystem.reset(); ConditionalFileSystem.reset()
    val path = condDir("cond-takeover")
    val b = mtable(path)
    assert(b.commit(mdf(("k1", 1L, false, "v1")), "c1"))
    // A dead-LOOKING reservation at generation 2: short advertised
    // lease, no heartbeat — expired by the time the contender probes.
    val fs = new org.apache.hadoop.fs.Path(s"$path/_manifests")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sidecar = new org.apache.hadoop.fs.Path(
      f"$path/_manifests/d-${2L}%09d.json")
    val deadLine = """{"owner":"deadbeefdeadbeef","lease":300,""" +
      """"commit_id":"slow-holder","rewrite":false,"files":[]}""" + "\n"
    val out = fs.create(sidecar, true)
    try out.write(deadLine.getBytes("UTF-8")) finally out.close()
    Thread.sleep(400L) // past the advertised lease
    // The holder WAKES inside the contender's check-to-write instant and
    // re-owns its reservation under a fresh nonce — on the GLOBAL lease
    // now (no "lease" field), as a woken holder's real re-own would be.
    val wokenLine = """{"owner":"feedfacefeedface",""" +
      """"commit_id":"slow-holder","rewrite":false,"files":[]}""" + "\n"
    b.beforeTakeoverWriteHook = oneShot {
      val o2 = fs.create(sidecar, true)
      try o2.write(wokenLine.getBytes("UTF-8")) finally o2.close()
    }
    sys.props("graft.publish.retryMs") = "1500"
    try {
      intercept[graft.store.ManifestTable.ConcurrentPublishException] {
        b.commit(mdf(("k2", 2L, false, "v2")), "c2")
      }
    } finally sys.props.remove("graft.publish.retryMs")
    assert(ConditionalFileSystem.casRefusals.get() >= 1,
      "the takeover's overwrite must be refused by the precondition")
    assert(b.leaseTakeoverCount.get() === 0L,
      "a refused takeover must never count as performed")
    assert(rawSidecar(path, 2L) === wokenLine,
      "the woken holder's record must survive byte-intact")
  }
}
