package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, encode}
import graft.read.TemporalReads
import graft.snapshot.Snapshots

class SnapshotsSpec extends SparkTestBase {
  import spark.implicits._

  private def mutations: DataFrame = {
    // 3 keys, interleaved writes and a delete, heights 1..12.
    val rs = Seq(
      ("t1", 1L, "a", "a1", false), ("t1", 2L, "b", "b2", false),
      ("t1", 3L, "a", "a3", false), ("t1", 4L, "c", "c4", false),
      ("t1", 5L, "b", "", true), ("t1", 6L, "a", "a6", false),
      ("t1", 7L, "b", "b7", false), ("t1", 9L, "c", "c9", false),
      ("t1", 11L, "a", "", true), ("t1", 12L, "a", "a12", false))
    rs.toDF("tablet_id", "height", "primary_key", "v", "is_deletion")
      .withColumn("value", encode(col("v"), "utf-8")).drop("v")
  }

  test("buildTabletIndex: pk → last mutation height, tombstoned keys dropped") {
    val idx = Snapshots.buildTabletIndex(mutations, "t1", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(idx === Seq(("a", 3L), ("c", 4L))) // b tombstoned at 5
    assert(Snapshots.squelchCount(mutations, "t1", 5) === 5L)
  }

  test("snapshot ∪ tail read ≡ direct full-scan read (the J1 invariant)") {
    for (snapH <- Seq(0L, 4L, 5L, 8L, 12L); atH <- Seq(5L, 8L, 12L) if snapH <= atH) {
      val snap = Snapshots.buildTabletIndex(mutations, "t1", snapH)
      val viaSnapshot = Snapshots
        .readTabletAtWithSnapshot(mutations, snap, snapH, "t1", atH)
        .collect().map(_.toSeq).toSeq
      val direct = TemporalReads.readTabletAt(mutations, "t1", atH)
        .collect().map(_.toSeq).toSeq
      assert(viaSnapshot.map(_.take(2)) === direct.map(_.take(2)),
        s"snapshot=$snapH at=$atH")
    }
  }

  test("snapshot read honors a speculative overlay above the tail") {
    val snap = Snapshots.buildTabletIndex(mutations, "t1", 5)
    val spec = Seq(("t1", 13L, "c", "c13-spec", false))
      .toDF("tablet_id", "height", "primary_key", "v", "is_deletion")
      .withColumn("value", encode(col("v"), "utf-8")).drop("v")
    val out = Snapshots
      .readTabletAtWithSnapshot(mutations, snap, 5, "t1", 13, Seq(spec))
      .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(out.toSeq === Seq(("a", "a12"), ("b", "b7"), ("c", "c13-spec")))
  }

  test("index trigger heuristic matches the reference thresholds exactly") {
    import Snapshots.shouldTriggerIndexing
    assert(!shouldTriggerIndexing(None, 24999))
    assert(shouldTriggerIndexing(None, 25000))
    assert(shouldTriggerIndexing(Some(50000), 25000))        // small tablet
    assert(!shouldTriggerIndexing(Some(60000), 30000))       // medium: need > rows/2
    assert(shouldTriggerIndexing(Some(60000), 30001))
    assert(!shouldTriggerIndexing(Some(300000), 99999))      // big: need >= 100K
    assert(shouldTriggerIndexing(Some(300000), 100000))
  }

  test("retention prune keeps first, last, and every k-th intermediate") {
    val hs = (1L to 10L).toSeq
    assert(Snapshots.pruneRetention(hs, 3) === Seq(1L, 4L, 7L, 10L))
    assert(Snapshots.pruneRetention(Seq(5L), 2) === Seq(5L))
  }

  test("physical snapshot prune rewrites the log and spares other tablets") {
    implicit val s = spark
    val store = new graft.store.StateStore(tmpDir("store"))
    val m = mutations
    (2L to 10L by 2).foreach { h =>
      store.writeTabletSnapshot(Snapshots.buildTabletIndex(m, "t1", h), "t1", h,
        Snapshots.squelchCount(m, "t1", h))
    }
    store.writeTabletSnapshot(Snapshots.buildTabletIndex(m, "t1", 5), "other", 5, 5)
    val kept = store.pruneTabletSnapshots("t1", keepEvery = 2)
    assert(kept === Seq(2L, 6L, 10L)) // first, every 2nd middle, last
    val after = store.tabletSnapshots
      .select("tablet_id", "at_height").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after === Set(("t1", 2L), ("t1", 6L), ("t1", 10L), ("other", 5L)))
    // Reads still work after the rewrite.
    assert(store.latestTabletSnapshot("t1").get._1 === 10L)
  }

  test("IndexCache accumulates and resets per tablet") {
    val c = new Snapshots.IndexCache
    c.increment("t1", 20000); c.increment("t1", 6000); c.increment("t2", 100)
    assert(c.tabletsToIndex() === Seq("t1"))
    c.recordIndexed("t1", 26000)
    assert(c.mutationCount("t1") === 0L)
    assert(c.tabletsToIndex().isEmpty)
  }
}
