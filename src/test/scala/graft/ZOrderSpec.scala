package graft

import org.apache.spark.sql.functions._
import graft.store.{StateStore, ZOrder}
import graft.model.{BlockRef, TabletRowM, WriteRequest}
import scala.util.Random

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Scala reference model of the interleaved sort key, bit for bit. */
  private def modelKeyPrefix32(s: String): Long = {
    val b = s.getBytes("UTF-8").padTo(4, 0.toByte).take(4)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) |
      ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }
  private def modelBucket(s: String, bounds: Seq[Long]): Long =
    bounds.count(modelKeyPrefix32(s) >= _).toLong
  private def modelZ(key: String, height: Long, d: ZOrder.ZDims): Long = {
    val h0 = height - d.heightMin
    val h = (if (d.heightShift >= 0) h0 << d.heightShift
             else h0 >> -d.heightShift) & 0xFFFFFFFFL
    val b = modelBucket(key, d.keyBounds) * 255L / math.max(1, d.keyBounds.size)
    val hHigh = (h >> 24) & 0xFFL
    val hLow = h & 0xFFFFFFL
    (0 until 8).foldLeft(hLow) { (z, j) =>
      z | (((b >> j) & 1L) << (25 + 2 * j)) | (((hHigh >> j) & 1L) << (24 + 2 * j))
    }
  }

  test("zValue matches the Scala bit model exactly on random keys/heights " +
    "across bucket boundaries and both height-shift signs") {
    val rnd = new Random(42)
    val cases = Seq(("", 0L), ("a", 1L), ("é", 7L), ("pk0001", Long.MaxValue / 3)) ++
      Seq.fill(60)((rnd.alphanumeric.take(rnd.nextInt(8)).mkString,
        rnd.nextLong().abs))
    val boundPool = cases.map(c => modelKeyPrefix32(c._1)).distinct.sorted
    val dimss = Seq(
      ZOrder.ZDims(Nil, 0L, 0),
      ZOrder.ZDims(boundPool, 0L, -31),
      ZOrder.ZDims(boundPool.take(7), 100L, 12))
    for (d <- dimss) {
      val got = cases.toDF("k", "h")
        .select(ZOrder.zValue(col("k"), col("h"), d))
        .collect().map(_.getLong(0)).toSeq
      val want = cases.map { case (k, h) => modelZ(k, h, d) }
      assert(got === want, s"dims=$d")
    }
    // fillShiftFor: spread small ranges up, compress wide ranges down.
    assert(ZOrder.fillShiftFor(0L) === 0)
    assert(ZOrder.fillShiftFor(1L) === 31)
    assert(ZOrder.fillShiftFor(0xFFFFFFFFL) === 0)
    assert(ZOrder.fillShiftFor(0x100000000L) === -1)
  }

  test("zValue is monotone in each dimension with the other fixed " +
    "(order-preserving embedding — the property row-group pruning needs)") {
    val rnd = new Random(7)
    val keys = Seq.fill(40)(rnd.alphanumeric.take(6).mkString).sorted
    val heights = Seq.fill(40)((rnd.nextLong().abs) & 0xFFFFFFFFL).sorted
    val d = ZOrder.ZDims(
      keys.map(modelKeyPrefix32).distinct.sorted,
      heights.min, ZOrder.fillShiftFor(heights.max - heights.min))
    for (h <- Seq(heights.head, heights.last)) {
      val zs = keys.map(k => modelZ(k, h, d))
      assert(zs === zs.sorted, s"not monotone in key at h=$h")
    }
    for (k <- Seq(keys.head, keys.last)) {
      val zs = heights.map(h => modelZ(k, h, d))
      assert(zs === zs.sorted, s"not monotone in height at k=$k")
    }
  }

  private def req(h: Long, rows: (String, String, String)*): WriteRequest =
    WriteRequest(h, BlockRef(s"blk-$h", h),
      rows.map { case (t, pk, v) =>
        TabletRowM(1, t, h, pk, v.getBytes("UTF-8"), v.isEmpty) },
      Nil)

  test("interleaved compaction preserves contents exactly and gives every " +
    "file a tight (key, height) bounding box — the height-sorted layout's " +
    "files span ALL keys, the z-ordered layout's span a fraction, even " +
    "though the ASCII keys cluster in a corner of 32-bit prefix space") {
    implicit val s = spark
    // 16 keys × 128 heights on one tablet: enough rows that 8 output files
    // must split SOMETHING; the layouts differ in what.
    def ingest(store: StateStore): Unit = (0L until 128L).foreach { h =>
      store.writeBatch(Seq(req(h,
        (0 until 16).map(k => ("t1", f"pk$k%02d", s"v$h-$k")): _*)))
    }
    // Box metric: DISTINCT keys per file (the prefix span would lie across
    // the ASCII '09'→'10' digit gap) × the height span.
    def boxes(store: StateStore): Seq[(Long, Long)] = store.tabletRows
      .select(col("primary_key"), col("height"),
        input_file_name().as("f"))
      .groupBy("f")
      .agg(countDistinct(col("primary_key")).as("n_keys"),
        (max(col("height")) - min(col("height"))).as("h_span"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

    val plain = new StateStore(tmpDir("store_plain"))
    ingest(plain)
    val rowsBefore = plain.tabletRows.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3))).sorted.toSeq
    assert(plain.compactTabletRows(numFiles = 8) === 128L)
    val plainBoxes = boxes(plain)

    val zed = new StateStore(tmpDir("store_z"))
    ingest(zed)
    assert(zed.compactTabletRowsInterleaved(numFiles = 8) === 128L)
    // Contents identical to the height-sorted layout's (and the original).
    val zRows = zed.tabletRows.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3))).sorted.toSeq
    assert(zRows === rowsBefore)
    val zBoxes = boxes(zed)

    // Height-sorted: every file holds ALL 16 keys. Z-ordered: files cover
    // key sub-ranges — the WORST file's key count bounds what a point read
    // must scan.
    assert(plainBoxes.forall(_._1 == 16L),
      s"height-sorted files should span all keys: $plainBoxes")
    assert(zBoxes.map(_._1).max <= 8L,
      s"z-ordered files should cluster keys: $zBoxes")
    // And the height dimension stays clustered too (no file spans the
    // whole height range): both point reads AND tail scans prune.
    assert(zBoxes.map(_._2).max < 127L, s"z-ordered height spans: $zBoxes")
    // The store keeps serving exact reads off the new layout.
    val at60 = zed.readTabletRowAt("t1", "pk07", 60L).collect()
    assert(at60.length === 1 &&
      new String(at60.head.getAs[Array[Byte]](2), "UTF-8") === "v60-7")
  }

  test("auto layout: the observed read mix drives the per-tablet choice — " +
    "a point-heavy tablet compacts interleaved, a scan-heavy one stays " +
    "height-sorted, contents identical, overrides win") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store_auto"))
    // Two tablets, same shape: 64 heights × 8 keys each.
    (0L until 64L).foreach { h =>
      store.writeBatch(Seq(req(h,
        (0 until 8).flatMap(k =>
          Seq(("pt", f"pk$k%02d", s"p$h-$k"), ("sc", f"pk$k%02d", s"s$h-$k"))): _*)))
    }
    // Observed mix: 'pt' serves point reads, 'sc' serves tail scans.
    (0 until 3).foreach(_ => store.readTabletRowAt("pt", "pk03", 50L))
    store.readTabletAt("sc", 50L)
    assert(store.readMix.prefersInterleaved("pt"))
    assert(!store.readMix.prefersInterleaved("sc"))
    assert(!store.readMix.prefersInterleaved("never-read"))

    val before = store.tabletRows.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3))).sorted.toSeq
    val (folded, interleaved) = store.compactTabletRowsAuto(numFiles = 16)
    assert(folded === 64L && interleaved === Set("pt"))
    // Contents exactly preserved across the mixed-layout rewrite.
    val after = store.tabletRows.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3))).sorted.toSeq
    assert(after === before)

    // Physical layout per tablet: the interleaved tablet's files cluster
    // keys (a point read scans a fraction), the sorted tablet's files
    // each span ALL keys but tight height runs.
    def boxesOf(tablet: String): Seq[(Long, Long)] = store.tabletRows
      .filter(col("tablet_id") === tablet)
      .select(col("primary_key"), col("height"), input_file_name().as("f"))
      .groupBy("f")
      .agg(countDistinct(col("primary_key")).as("n_keys"),
        (max(col("height")) - min(col("height"))).as("h_span"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val ptBoxes = boxesOf("pt")
    val scBoxes = boxesOf("sc")
    assert(ptBoxes.map(_._1).max < 8L,
      s"point-heavy tablet should cluster keys: $ptBoxes")
    assert(scBoxes.forall(_._1 == 8L) && scBoxes.map(_._2).max < 63L,
      s"scan-heavy tablet should stay height-sorted: $scBoxes")
    // Reads keep serving exactly off the mixed layout.
    val pt50 = store.readTabletRowAt("pt", "pk03", 50L).collect()
    assert(pt50.length === 1 &&
      new String(pt50.head.getAs[Array[Byte]](2), "UTF-8") === "p50-3")
    assert(store.readTabletAt("sc", 63L).count() === 8L)

    // Operator overrides beat the counters, both directions.
    val (_, flipped) = store.compactTabletRowsAuto(numFiles = 16,
      overrides = Map("pt" -> "sorted", "sc" -> "interleaved"))
    assert(flipped === Set("sc"))
    intercept[IllegalArgumentException] {
      store.compactTabletRowsAuto(overrides = Map("pt" -> "wat"))
    }
  }

  test("read-mix counters persist: reads recorded in process A drive the " +
    "interleave choice in a fresh process B; contents identical; a " +
    "corrupt counters file warns and degrades to height-sorted") {
    implicit val s = spark
    val root = tmpDir("store_mix_persist")
    val storeA = new StateStore(root)
    (0L until 32L).foreach { h =>
      storeA.writeBatch(Seq(req(h,
        (0 until 8).flatMap(k =>
          Seq(("pt", f"pk$k%02d", s"p$h-$k"), ("sc", f"pk$k%02d", s"s$h-$k"))): _*)))
    }
    (0 until 3).foreach(_ => storeA.readTabletRowAt("pt", "pk03", 20L))
    storeA.readTabletAt("sc", 20L)
    storeA.readMix.flush() // process exit / maintenance hook

    // "Process B": a fresh store instance seeds its counters from the
    // root and makes the same layout decision A's evidence dictates.
    val storeB = new StateStore(root)
    assert(storeB.readMix.pointReads("pt") === 3L)
    assert(storeB.readMix.tailScans("sc") === 1L)
    assert(storeB.readMix.prefersInterleaved("pt"))
    assert(!storeB.readMix.prefersInterleaved("sc"))
    val before = storeB.tabletRows.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3))).sorted.toSeq
    val (_, interleaved) = storeB.compactTabletRowsAuto(numFiles = 8)
    assert(interleaved === Set("pt"),
      "B must compact interleaved on A's persisted evidence alone")
    val after = storeB.tabletRows.collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3))).sorted.toSeq
    assert(after === before)

    // B's OWN reads accumulate on top of the seeded counts and persist
    // for process C (compactTabletRowsAuto flushed before deciding).
    storeB.readTabletRowAt("pt", "pk05", 20L)
    storeB.readMix.flush()
    val storeC = new StateStore(root)
    assert(storeC.readMix.pointReads("pt") === 4L)
    // The dry-run report shows the evidence + decision without rewriting;
    // overrides surface in the report too.
    val report = storeC.compactTabletRowsAutoReport()
    assert(report.contains(("pt", 4L, 0L, "interleaved")), report.toString)
    assert(report.contains(("sc", 0L, 1L, "sorted")), report.toString)
    assert(storeC.compactTabletRowsAutoReport(Map("pt" -> "sorted"))
      .find(_._1 == "pt").get._4 === "sorted")

    // Corrupt counters: one bad object warns and reads as EMPTY without
    // poisoning the rest of the fleet's evidence (per-file isolation) —
    // and never fails the store open over advisory data. Here the legacy
    // single file is garbage; the per-instance objects A and B flushed
    // still sum.
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mixPath = new org.apache.hadoop.fs.Path(s"$root/_readmix.json")
    val out = fs.create(mixPath, true)
    try out.write("not base64 at all".getBytes("UTF-8")) finally out.close()
    val storeD = new StateStore(root)
    assert(storeD.readMix.pointReads("pt") === 4L,
      "the corrupt legacy file must not poison the instance objects")
    // And when EVERY persisted object is unreadable, start empty.
    val dirPath = new org.apache.hadoop.fs.Path(s"$root/_readmix.json.d")
    fs.delete(dirPath, true)
    val storeE = new StateStore(root)
    assert(storeE.readMix.pointReads("pt") === 0L)
    assert(!storeE.readMix.prefersInterleaved("pt"))
  }

  test("read-mix counters are multi-writer safe: two instances against one " +
    "root, interleaved flushes, neither's counts lost; the decision uses " +
    "the union") {
    implicit val s = spark
    val root = tmpDir("store_mix_fleet")
    val conf = spark.sessionState.newHadoopConf()
    val path = s"$root/_readmix.json"
    val a = new StateStore.ReadMixStats(Some((conf, path)))
    val b = new StateStore.ReadMixStats(Some((conf, path)))
    (0 until 2).foreach(_ => a.recordPointRead("pt"))
    (0 until 3).foreach(_ => b.recordPointRead("pt"))
    b.recordTailScan("sc")
    // Interleaved flushes: a last-writer-wins shared file would end at
    // whichever instance flushed last (3), clobbering the other's 2;
    // per-instance objects make the fleet view the exact sum.
    a.flush() // a's object: pt=2
    b.flush() // b's object: pt=3, sc=1; b adopts a's 2
    a.recordPointRead("pt")
    a.flush() // a's object: pt=3
    val c = new StateStore.ReadMixStats(Some((conf, path)))
    assert(c.pointReads("pt") === 6L, "fleet evidence must SUM, not clobber")
    assert(c.tailScans("sc") === 1L)
    // After its merge-flush, B's view is the union — its decision would
    // be driven by evidence it never recorded itself.
    assert(b.pointReads("pt") === 5L)
    assert(b.prefersInterleaved("pt") && !b.prefersInterleaved("sc"))
    // A flush with nothing to contribute still ADOPTS the fleet's
    // evidence (the decision path on a read-idle process).
    val idle = new StateStore.ReadMixStats(Some((conf, path)))
    a.recordPointRead("pt"); a.flush() // someone else advances the file to 7
    idle.flush()
    assert(idle.pointReads("pt") === 7L)
    // An instance's own unflushed delta rides on top of the seeded base.
    val d = new StateStore.ReadMixStats(Some((conf, path)))
    d.recordPointRead("pt")
    assert(d.pointReads("pt") === 8L)
  }

  test("read-mix ABSORPTION bounds the delta directory: dead instances' " +
    "objects fold into one snapshot with exact sums — including when the " +
    "absorbed instance was alive and flushes again (the racing-flush " +
    "case), because readers MAX-merge per-instance cumulative views") {
    implicit val s = spark
    val root = tmpDir("store_mix_absorb")
    val conf = spark.sessionState.newHadoopConf()
    val path = s"$root/_readmix.json"
    val a = new StateStore.ReadMixStats(Some((conf, path)))
    val b = new StateStore.ReadMixStats(Some((conf, path)))
    (0 until 3).foreach(_ => a.recordPointRead("pt"))
    a.recordTailScan("sc")
    a.flush() // a's object: pt=3, sc=1
    (0 until 2).foreach(_ => b.recordPointRead("pt"))
    b.flush() // b's object: pt=2
    val dirPath = new org.apache.hadoop.fs.Path(s"$root/_readmix.json.d")
    val fs = dirPath.getFileSystem(conf)
    def objNames: Seq[String] = fs.listStatus(dirPath)
      .map(_.getPath.getName).filterNot(_.endsWith(".tmp")).toSeq.sorted
    assert(objNames.size === 2)
    // A third instance absorbs everything idle ≥ 0 ms — the WORST case:
    // B is actually still alive (an mtime age cannot know).
    val c = new StateStore.ReadMixStats(Some((conf, path)))
    assert(c.absorb(0L) === 2, "both idle objects must fold")
    assert(objNames.count(_.startsWith("absorbed-")) === 1)
    assert(objNames.size === 1,
      s"folded objects must be reclaimed: $objNames")
    assert(c.pointReads("pt") === 5L, "absorption must preserve exact sums")
    assert(c.tailScans("sc") === 1L)
    // RACING FLUSH: the absorbed-but-alive B keeps counting and flushes
    // again. Its recreated object (cumulative pt=3) must MAX-merge with
    // its absorbed snapshot entry (pt=2) — never add — so the fleet sum
    // gains exactly the new recording.
    b.recordPointRead("pt")
    b.flush()
    val d = new StateStore.ReadMixStats(Some((conf, path)))
    assert(d.pointReads("pt") === 6L,
      "absorption must preserve exact sums under a racing flush")
    assert(d.tailScans("sc") === 1L)
    // Second absorption folds B's recreated object and the prior
    // snapshot into one — sums unchanged, directory still bounded.
    assert(d.absorb(0L) === 1)
    assert(objNames.count(_.startsWith("absorbed-")) === 1)
    assert(objNames.size === 1)
    val e = new StateStore.ReadMixStats(Some((conf, path)))
    assert(e.pointReads("pt") === 6L)
    assert(e.tailScans("sc") === 1L)
    // Nothing to fold → no-op, no snapshot churn.
    assert(e.absorb(0L) === 0)
  }

  test("read-mix ABSORPTION verify-before-delete: a flush REPLACING a " +
    "source object between the absorber's fold and its delete is left " +
    "LIVE — the replacement's durable counts survive even if its " +
    "instance never flushes again") {
    implicit val s = spark
    val root = tmpDir("store_mix_absorb_race")
    val conf = spark.sessionState.newHadoopConf()
    val path = s"$root/_readmix.json"
    val b = new StateStore.ReadMixStats(Some((conf, path)))
    (0 until 2).foreach(_ => b.recordPointRead("pt"))
    b.flush() // B's object: pt=2
    val c = new StateStore.ReadMixStats(Some((conf, path)))
    c.beforeAbsorbDeleteHook = () => {
      // The race: B's flush lands AFTER the absorber folded pt=2 into
      // its snapshot but BEFORE the delete loop — replacing B's object
      // in place with the cumulative pt=3. A blind delete here would
      // discard the durable pt=3 forever (only the stale snapshot
      // value would survive).
      Thread.sleep(10L)
      b.recordPointRead("pt")
      b.flush()
    }
    assert(c.absorb(0L) === 1)
    // The (len, mtime) verify must have left B's REPLACED object live:
    // sums reflect the durable pt=3, not the absorbed pt=2 — even
    // though B never flushes again.
    val d = new StateStore.ReadMixStats(Some((conf, path)))
    assert(d.pointReads("pt") === 3L,
      "the racing flush's durable counts must survive absorption")
    val dirPath = new org.apache.hadoop.fs.Path(s"$root/_readmix.json.d")
    val fs = dirPath.getFileSystem(conf)
    def names: Seq[String] = fs.listStatus(dirPath)
      .map(_.getPath.getName).filterNot(_.endsWith(".tmp")).toSeq
    assert(names.count(_.startsWith("absorbed-")) === 1)
    assert(names.size === 2, s"B's replaced object must stay live: $names")
    // The next pass absorbs the survivor; sums unchanged.
    assert(d.absorb(0L) === 1)
    val e = new StateStore.ReadMixStats(Some((conf, path)))
    assert(e.pointReads("pt") === 3L)
  }

  test("read-mix counters lose NOTHING under racing flushes: two instances " +
    "flushing concurrently against one root, every recording lands — the " +
    "interleaving that could drop one in-flight delta under a shared " +
    "read-modify-write file cannot exist with per-instance objects") {
    implicit val s = spark
    val root = tmpDir("store_mix_race")
    val conf = spark.sessionState.newHadoopConf()
    val path = s"$root/_readmix.json"
    val a = new StateStore.ReadMixStats(Some((conf, path)))
    val b = new StateStore.ReadMixStats(Some((conf, path)))
    val rounds = 50
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def worker(m: StateStore.ReadMixStats): Thread = {
      val t = new Thread(() => (0 until rounds).foreach { _ =>
        m.recordPointRead("pt")
        barrier.await() // flushes collide on purpose, every round
        m.flush()
      })
      t.start(); t
    }
    val (ta, tb) = (worker(a), worker(b))
    ta.join(60000L); tb.join(60000L)
    assert(!ta.isAlive && !tb.isAlive)
    val fresh = new StateStore.ReadMixStats(Some((conf, path)))
    assert(fresh.pointReads("pt") === 2L * rounds,
      "every recording from both instances must survive racing flushes")
  }

  test("read-mix counters degrade on every filesystem fault: a broken " +
    "persist target at construction, recording, and flush never throws — " +
    "counts continue in-memory") {
    implicit val s = spark
    val conf = spark.sessionState.newHadoopConf()
    // A scheme no FileSystem serves: getFileSystem itself faults — the
    // pre-fix seed called fs.exists outside its try and propagated this
    // out of the StateStore constructor.
    val broken = new StateStore.ReadMixStats(Some((conf, "nosuchscheme://x/y")))
    (0 until 5).foreach(_ => broken.recordPointRead("pt"))
    broken.recordTailScan("pt")
    broken.flush() // warns, keeps the delta in memory
    assert(broken.pointReads("pt") === 5L)
    assert(broken.tailScans("pt") === 1L)
    assert(broken.prefersInterleaved("pt"))
    // A failed flush RETAINS the delta (retry semantics): counts after
    // the failed flush still include everything.
    broken.recordPointRead("pt")
    assert(broken.pointReads("pt") === 6L)
  }

  test("threshold flushes run off the read path (background executor) and " +
    "land the merged counts") {
    implicit val s = spark
    val root = tmpDir("store_mix_async")
    val conf = spark.sessionState.newHadoopConf()
    val path = s"$root/_readmix.json"
    val m = new StateStore.ReadMixStats(Some((conf, path)), flushEvery = 4)
    (0 until 4).foreach(_ => m.recordPointRead("pt")) // 4th queues a flush
    val deadline = System.nanoTime() + 5000000000L
    var flushed = false
    while (!flushed && System.nanoTime() < deadline) {
      flushed =
        new StateStore.ReadMixStats(Some((conf, path))).pointReads("pt") == 4L
      if (!flushed) Thread.sleep(50L)
    }
    assert(flushed, "background flush must persist the counters within 5s")
    assert(m.pointReads("pt") === 4L, "visible count unchanged by the flush")
  }
}
