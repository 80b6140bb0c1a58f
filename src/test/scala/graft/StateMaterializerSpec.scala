package graft

import graft.model._
import graft.store.{ManifestTable, StateStore}
import graft.streaming.StateMaterializer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[ManifestTable.merge]] (copy-on-write, manifest-stats file pruning)
  * and [[StateMaterializer]] (changefeed → incrementally maintained
  * serving table ≡ readTabletAt). */
class StateMaterializerSpec extends SparkTestBase {

  private val mergeSchema = StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("del", BooleanType, nullable = false)))

  private def mkTable(dir: String): ManifestTable = {
    implicit val s = spark
    new ManifestTable(dir, mergeSchema, statsCols = Seq("k"))
  }

  private def df(rows: (String, Long, String, Boolean)*) = {
    import spark.implicits._
    rows.toDF("k", "h", "v", "del").coalesce(1)
  }

  private def contents(t: ManifestTable): Set[(String, Long, String)] =
    t.read().collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2))).toSet

  test("merge rewrites ONLY files whose manifest bounds contain a touched " +
    "key; untouched files carry verbatim") {
    val t = mkTable(tmpDir("merge-min"))
    // Three single-file commits with disjoint key ranges.
    t.commit(df(("a1", 1, "a1v", false), ("a2", 1, "a2v", false)), "c-a")
    t.commit(df(("b1", 1, "b1v", false), ("b2", 1, "b2v", false)), "c-b")
    t.commit(df(("c1", 1, "c1v", false), ("c2", 1, "c2v", false)), "c-c")

    val r = t.merge(df(("b1", 2, "b1v2", false)), Seq("k"), "h", "del", "m1")
    assert(r.applied)
    assert(r.rewritten === 1, "only the b-range file may be rewritten")
    assert(r.kept === 2)
    assert(contents(t) === Set(
      ("a1", 1L, "a1v"), ("a2", 1L, "a2v"),
      ("b1", 2L, "b1v2"), ("b2", 1L, "b2v"),
      ("c1", 1L, "c1v"), ("c2", 1L, "c2v")))
    // The untouched files' ORIGINAL commit entries survive in the manifest.
    val cids = t.manifestEntries(t.currentGeneration().get).map(_._1)
    assert(cids.contains("c-a") && cids.contains("c-c") && cids.contains("m1"))
    assert(!cids.contains("c-b"), "the rewritten file's entry is replaced")
  }

  test("merge is LWW by orderCol with updates winning ties; tombstones " +
    "remove keys; stale updates lose") {
    val t = mkTable(tmpDir("merge-lww"))
    t.commit(df(("k1", 5, "old", false), ("k2", 5, "keep", false),
      ("k3", 5, "gone", false)), "c0")
    t.merge(df(
      ("k1", 5, "tie-update-wins", false), // equal height: update side wins
      ("k3", 6, null, true),               // tombstone removes the key
      ("k2", 3, "stale", false),           // below existing height: loses
      ("k9", 1, null, true)                // delete of an absent key: no-op
    ), Seq("k"), "h", "del", "m1")
    assert(contents(t) === Set(
      ("k1", 5L, "tie-update-wins"), ("k2", 5L, "keep")))
  }

  test("merge is idempotent: repeated commitId skips, re-applying the " +
    "same batch under a new id changes nothing") {
    val t = mkTable(tmpDir("merge-idem"))
    t.commit(df(("k1", 1, "v1", false)), "c0")
    val batch = df(("k1", 2, "v2", false), ("k2", 2, "w2", false))
    assert(t.merge(batch, Seq("k"), "h", "del", "m1").applied)
    val after = contents(t)
    // Crash-replay of the same foreachBatch id: same commitId → skip.
    assert(!t.merge(batch, Seq("k"), "h", "del", "m1").applied)
    assert(contents(t) === after)
    // Redelivery under a NEW id: argmax semantics absorb it.
    assert(t.merge(batch, Seq("k"), "h", "del", "m2").applied)
    assert(contents(t) === after)
    // Empty update set: no-op, no generation burned.
    val genBefore = t.currentGeneration().get
    assert(!t.merge(df(), Seq("k"), "h", "del", "m3").applied)
    assert(t.currentGeneration().get === genBefore)
  }

  test("merge ENFORCES its driver budget: an over-budget touched-key set " +
    "fails loudly (pointing at replaceAll), table untouched; at-budget passes") {
    val t = mkTable(tmpDir("merge-budget"))
    t.commit(df(("k1", 1, "v1", false)), "c0")
    val batch = df(("k1", 2, "v2", false), ("k2", 2, "w2", false),
      ("k3", 2, "x2", false))
    val genBefore = t.currentGeneration().get
    val e = intercept[IllegalArgumentException] {
      t.merge(batch, Seq("k"), "h", "del", "m1", maxTouchedKeys = 2L)
    }
    assert(e.getMessage.contains("replaceAll") &&
      e.getMessage.contains("GRAFT_MERGE_MAX_TOUCHED_KEYS"))
    // Refused BEFORE any write: no generation burned, contents intact.
    assert(t.currentGeneration().get === genBefore)
    assert(contents(t) === Set(("k1", 1L, "v1")))
    // Exactly at budget: applies normally.
    assert(t.merge(batch, Seq("k"), "h", "del", "m1", maxTouchedKeys = 3L).applied)
    assert(contents(t) === Set(
      ("k1", 2L, "v2"), ("k2", 2L, "w2"), ("k3", 2L, "x2")))
    // The default budget comes from the env-overridable companion knob.
    assert(graft.store.ManifestTable.mergeMaxTouchedKeys === 1000000L)
  }

  test("an insert-heavy merge SIZES its fresh-insert write like the " +
    "rewrite side: multiple fresh files, each with tight key bounds; " +
    "emitFresh sees all of them; point-read pruning holds") {
    val t = mkTable(tmpDir("merge-fresh-sized"))
    t.commit(df(("m1", 1, "m1v", false)), "c0")
    val updates = df(
      ("m1", 2, "m1v2", false), // touches the existing file (rewrite side)
      ("f1", 2, "f1v", false), ("f2", 2, "f2v", false), ("f3", 2, "f3v", false),
      ("f4", 2, "f4v", false), ("f5", 2, "f5v", false), ("f6", 2, "f6v", false))
    val r = t.merge(updates, Seq("k"), "h", "del", "m-ins",
      freshRowsPerFile = 2L)
    assert(r.applied && r.rewritten === 1)
    implicit val s = spark
    val rec = t.deltaRecord(2L).get
    assert(rec.rewrite)
    val fresh = rec.fresh.get
    assert(fresh.size >= 2,
      s"6 fresh rows at 2 rows/file must split into >1 file, got $fresh")
    // The fresh files hold exactly the new keys — the physical
    // separation emitFresh relies on survives the multi-file write.
    assert(t.scanOf(fresh).collect().map(_.getString(0)).toSet ===
      Set("f1", "f2", "f3", "f4", "f5", "f6"))
    // Range-partitioned: no fresh file's key bounds span the whole fresh
    // range (f1..f6), so the NEXT merge's file matching stays selective.
    val entry = rec.entry
    val freshSet = fresh.toSet
    def str(v: graft.store.ManifestTable.StatVal): String = v match {
      case graft.store.ManifestTable.BytesVal(b) => new String(b, "UTF-8")
      case other => other.toString
    }
    val spans = entry.files.zip(entry.stats).collect {
      case (f, st) if freshSet.contains(f) =>
        (str(st("k")._1), str(st("k")._2))
    }
    assert(spans.nonEmpty)
    assert(spans.forall { case (lo, hi) => !(lo == "f1" && hi == "f6") },
      s"a fresh file spans the whole key range — bounds not tight: $spans")
    val (kept, total) = t.pruneCounts(Seq(
      graft.store.ManifestTable.StatsEq("k", "f1")))
    assert(kept < total, s"point filter must prune fresh files: $kept/$total")
    // Per-file byte sizes recorded for the whole merge generation.
    assert(entry.bytes.size === entry.files.size)
    assert(entry.bytes.forall(_ > 0L))
    // Contents exact.
    assert(contents(t) === Set(
      ("m1", 2L, "m1v2"), ("f1", 2L, "f1v"), ("f2", 2L, "f2v"),
      ("f3", 2L, "f3v"), ("f4", 2L, "f4v"), ("f5", 2L, "f5v"),
      ("f6", 2L, "f6v")))
  }

  test("sweepOrphanFiles reclaims merge-dropped files inside partially " +
    "kept commit dirs; live files and reads untouched") {
    val t = mkTable(tmpDir("merge-sweep"))
    // One commit, TWO files (two disjoint single-file sub-commits would be
    // dir-level sweepable — force the partial-keep case with one commit
    // whose data spans two files).
    import spark.implicits._
    val two = Seq(("a1", 1L, "a1v", false), ("z1", 1L, "z1v", false))
      .toDF("k", "h", "v", "del").repartitionByRange(2, col("k"))
    t.commit(two, "c0")
    assert(t.manifestEntries(t.currentGeneration().get).head._2.size === 2)

    t.merge(df(("a1", 2, "a1v2", false)), Seq("k"), "h", "del", "m1")
    // Directory-level sweep keeps the c0 dir (one file still live) —
    // the rewritten-away file lingers until the file-level sweep runs.
    assert(t.sweepOrphans(retainGenerations = 1).isEmpty ||
      !t.sweepOrphans(retainGenerations = 1).exists(_.contains("c0")))
    val swept = t.sweepOrphanFiles(retainGenerations = 1)
    assert(swept.exists(_.startsWith("d-c0-")), s"expected a c0 file swept, got $swept")
    assert(contents(t) === Set(("a1", 2L, "a1v2"), ("z1", 1L, "z1v")))
  }

  test("keepTombstones: a mutation redelivered below an applied delete " +
    "cannot revive the key (and the default mode documents that it can)") {
    // Retained-tombstone mode (the materializer's): delete survives as a
    // physical row, so the argmax sees its height and the stale add loses.
    val t = mkTable(tmpDir("merge-ts"))
    t.merge(df(("k1", 5, "v5", false)), Seq("k"), "h", "del", "m1",
      keepTombstones = true)
    t.merge(df(("k1", 6, null, true)), Seq("k"), "h", "del", "m2",
      keepTombstones = true)
    t.merge(df(("k1", 5, "v5", false)), Seq("k"), "h", "del", "m3",
      keepTombstones = true) // out-of-order redelivery
    assert(t.read().where(!col("del")).count() === 0L,
      "k1 must stay deleted under retained tombstones")
    // Default mode drops the tombstone row — the documented trade: a
    // BELOW-tombstone redelivery revives (callers must merge in order).
    val t2 = mkTable(tmpDir("merge-ts2"))
    t2.merge(df(("k1", 5, "v5", false)), Seq("k"), "h", "del", "m1")
    t2.merge(df(("k1", 6, null, true)), Seq("k"), "h", "del", "m2")
    t2.merge(df(("k1", 5, "v5", false)), Seq("k"), "h", "del", "m3")
    assert(contents(t2) === Set(("k1", 5L, "v5")))
  }

  test("property: random merge sequences with random redelivery match an " +
    "in-memory LWW model; compaction and sweep preserve state") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val t = mkTable(tmpDir(s"merge-prop-$trial"))
      // Model: key -> (height, value, deleted). Applied in height order.
      val model = scala.collection.mutable.Map.empty[String, (Long, String, Boolean)]
      var h = 0L
      val history = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(String, Long, String, Boolean)]]
      def liveModel: Set[(String, Long, String)] =
        model.collect { case (k, (mh, v, false)) => (k, mh, v) }.toSet
      def liveTable: Set[(String, Long, String)] =
        t.read().where(!col("del")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

      (1 to 8).foreach { batch =>
        val keys = rnd.shuffle((0 until 20).map(i => f"key$i%02d").toList)
          .take(1 + rnd.nextInt(6))
        val rows = keys.map { k =>
          h += 1
          val del = rnd.nextDouble() < 0.25
          (k, h, if (del) null else s"v$h", del)
        }
        history += rows
        t.merge(df(rows: _*), Seq("k"), "h", "del", s"b$trial-$batch",
          keepTombstones = true)
        rows.foreach { case (k, rh, v, del) => model(k) = (rh, v, del) }
        assert(liveTable === liveModel, s"trial $trial batch $batch")

        // Random redelivery of a PAST batch under a new commit id: the
        // argmax + retained tombstones must make it a strict no-op.
        if (rnd.nextDouble() < 0.4) {
          val past = history(rnd.nextInt(history.size))
          t.merge(df(past: _*), Seq("k"), "h", "del",
            s"re$trial-$batch", keepTombstones = true)
          assert(liveTable === liveModel,
            s"trial $trial batch $batch after redelivering $past")
        }
      }
      // Compaction (contents incl. tombstones) and file-level sweep leave
      // the state machine exactly where it was; a further merge works.
      t.replaceAll(t.read().repartitionByRange(2, col("k"))
        .sortWithinPartitions(col("k")), s"compact-$trial")
      t.sweepOrphans(); t.sweepOrphanFiles()
      assert(liveTable === liveModel, s"trial $trial after compaction+sweep")
      h += 1
      t.merge(df(("key00", h, s"v$h", false)), Seq("k"), "h", "del",
        s"post-$trial", keepTombstones = true)
      model("key00") = (h, s"v$h", false)
      assert(liveTable === liveModel, s"trial $trial post-compaction merge")
    }
  }


  test("generation pointer: framed form is torn-read-proof — numeric " +
    "prefixes of a framed pointer never parse as a regressed generation") {
    implicit val s = spark
    val dir = tmpDir("gen-frame")
    val t = mkTable(dir)
    t.commit(df(("k1", 1, "v1", false)), "c0")
    t.commit(df(("k2", 2, "v2", false)), "c1")
    assert(t.currentGeneration() === Some(2L))
    val p = new org.apache.hadoop.fs.Path(s"$dir/_gen")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def write(content: String): Unit = {
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    // On-disk form IS the frame (g5: owner-carrying, doubled generation).
    val in = fs.open(p)
    val onDisk = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    assert(onDisk.matches("""g5:2:[0-9a-f]+:2;"""), onDisk)
    // Every PREFIX of the frame (a torn read on a streaming-rename mount)
    // must fail loudly after retries — never parse as a smaller
    // generation, which would make a changefeed re-emit old commits.
    (1 until onDisk.length).foreach { cut =>
      write(onDisk.take(cut))
      intercept[RuntimeException] { t.currentGeneration() }
    }
    // Legacy bare-number pointers (pre-frame stores) still read.
    write("2")
    assert(t.currentGeneration() === Some(2L))
    write(onDisk) // restore
    assert(t.currentGeneration() === Some(2L))
  }

  private def req(h: Long, rows: (String, String, String)*): WriteRequest =
    WriteRequest(h, BlockRef(s"blk-$h", h),
      rows.map { case (t, pk, v) =>
        TabletRowM(1, t, h, pk, v.getBytes("UTF-8"), v.isEmpty) },
      Nil)

  test("materializer: serving table ≡ readTabletAt after every commit, " +
    "across a restart, point read pruned from manifest stats") {
    implicit val s = spark
    val root = tmpDir("mat-store")
    val target = tmpDir("mat-target")
    val ck = tmpDir("mat-ck")
    val store = new StateStore(root, StateStore.ManifestCommit)

    val commits = Seq(
      Seq(req(1, ("t1", "a", "a1")), req(2, ("t1", "b", "b2")), req(3, ("t1", "a", "a3"))),
      Seq(req(4, ("t1", "b", "")), req(5, ("t2", "x", "x5"))),
      Seq(req(6, ("t1", "b", "b6")), req(7, ("t1", "a", ""))),
      Seq(req(8, ("t1", "a", "a8"), ("t2", "x", "x8"))))

    def assertServing(atHeight: Long): Unit =
      Seq("t1", "t2").foreach { tab =>
        val serving = StateMaterializer.read(target)
          .filter(col("tablet_id") === tab)
          .select(col("primary_key"), col("height"),
            col("value").cast("string").as("value"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
        val asOf = store.readTabletAt(tab, atHeight)
          .select(col("primary_key"), col("height"),
            col("value").cast("string").as("value"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
        assert(serving === asOf, s"tablet $tab at height $atHeight")
      }

    val q1 = StateMaterializer.start(store, target, ck)
    try {
      store.writeBatch(commits(0)); q1.processAllAvailable(); assertServing(3)
      store.writeBatch(commits(1)); q1.processAllAvailable(); assertServing(5)
    } finally q1.stop()

    // Commits land while the materializer is down; restart catches up.
    store.writeBatch(commits(2))
    val q2 = StateMaterializer.start(store, target, ck)
    try {
      q2.processAllAvailable(); assertServing(7)
      store.writeBatch(commits(3)); q2.processAllAvailable(); assertServing(8)
      // End on a deletion so a RETAINED tombstone reaches the compaction
      // check below.
      store.writeBatch(Seq(req(9, ("t1", "b", ""))))
      q2.processAllAvailable(); assertServing(9)
    } finally q2.stop()

    // Point read: correct row, and the manifest bounds actually prune
    // (the target has accreted several merge generations' files).
    val row = StateMaterializer.readRow(target, "t2", "x").collect()
    assert(row.length === 1 && row(0).getAs[Long]("height") === 8L)
    val (surviving, total) = StateMaterializer.targetTable(target).pruneCounts(
      Seq(ManifestTable.StatsEq("tablet_id", "t2"),
        ManifestTable.StatsEq("primary_key", "x")))
    assert(surviving <= total)
    assert(total >= 1)

    // Compaction collapses the accreted merge generations to ONE commit,
    // preserves contents INCLUDING retained tombstones (a tombstone drop
    // would reopen the revive hole), and leaves point reads pruned.
    val before = StateMaterializer.targetTable(target).read().collect()
      .map(r => (r.getString(1), r.getString(3), r.getLong(2),
        r.getAs[Boolean]("is_deletion"))).toSet
    StateMaterializer.compact(target, numFiles = 2)
    val tt = StateMaterializer.targetTable(target)
    assert(tt.manifestEntries(tt.currentGeneration().get).size === 1)
    val after = tt.read().collect()
      .map(r => (r.getString(1), r.getString(3), r.getLong(2),
        r.getAs[Boolean]("is_deletion"))).toSet
    assert(after === before)
    assert(before.exists(_._4), "the scripted history must retain a tombstone")
    assertServing(9) // serving read unchanged through compaction
    // A post-compaction merge still prunes: only files whose re-tightened
    // bounds contain the touched key are rewritten.
    val rep = tt.merge(
      spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(1, "t2", 10L, "x",
            "x10".getBytes("UTF-8"), false)),
        graft.model.Schemas.tabletRows),
      StateMaterializer.KeyCols, "height", "is_deletion", "post-compact",
      keepTombstones = true)
    assert(rep.applied && rep.rewritten <= 1)
  }
}
