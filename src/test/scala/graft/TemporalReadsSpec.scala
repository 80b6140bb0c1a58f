package graft

import org.apache.spark.sql.DataFrame
import graft.read.TemporalReads

/** Read-path semantics, mirroring the reference's read_test.go scenarios:
  * last-write-wins per key, tombstone erase + re-insert, speculative overlay
  * in block order, height tie-break by source rank. */
class TemporalReadsSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(rs: (String, Long, String, String, Boolean)*): DataFrame =
    rs.toDF("tablet_id", "height", "primary_key", "v", "is_deletion")
      .withColumn("value", org.apache.spark.sql.functions.encode(
        org.apache.spark.sql.functions.col("v"), "utf-8"))
      .drop("v")

  private def result(df: DataFrame): Seq[(String, Long, String)] =
    df.collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))

  test("readTabletAt: last write wins per primary key, sorted by pk") {
    val d = rows(
      ("t1", 1, "a", "a1", false),
      ("t1", 5, "a", "a5", false),
      ("t1", 3, "b", "b3", false),
      ("t2", 9, "a", "other-tablet", false))
    assert(result(TemporalReads.readTabletAt(d, "t1", 10)) ===
      Seq(("a", 5L, "a5"), ("b", 3L, "b3")))
    // As-of an earlier height: the height-5 write is invisible.
    assert(result(TemporalReads.readTabletAt(d, "t1", 4)) ===
      Seq(("a", 1L, "a1"), ("b", 3L, "b3")))
  }

  test("readTabletAt: tombstone erases the key; re-insert resurrects it") {
    val d = rows(
      ("t1", 1, "a", "a1", false),
      ("t1", 2, "a", "", true),
      ("t1", 3, "b", "b3", false),
      ("t1", 4, "a", "a4", false))
    assert(result(TemporalReads.readTabletAt(d, "t1", 2)).isEmpty)
    assert(result(TemporalReads.readTabletAt(d, "t1", 3)) === Seq(("b", 3L, "b3")))
    assert(result(TemporalReads.readTabletAt(d, "t1", 9)) ===
      Seq(("a", 4L, "a4"), ("b", 3L, "b3")))
  }

  test("readTabletAt: speculative overlay wins over durable; block order wins within overlay") {
    val durable = rows(("t1", 1, "a", "durable", false))
    val spec1 = rows(("t1", 2, "a", "spec-block-2", false))
    val spec2 = rows(("t1", 2, "a", "spec-block-2-later", false))
    // Same height in both overlay sets: the LATER block (higher source rank)
    // must win, mirroring ordered application (read.go:155–169).
    assert(result(TemporalReads.readTabletAt(durable, "t1", 5, Seq(spec1, spec2))) ===
      Seq(("a", 2L, "spec-block-2-later")))
    // Speculative tombstone erases a durable key.
    val specDel = rows(("t1", 3, "a", "", true))
    assert(result(TemporalReads.readTabletAt(durable, "t1", 5, Seq(specDel))).isEmpty)
  }

  test("readTabletRowAt: single-key as-of lookup") {
    val d = rows(
      ("t1", 1, "a", "a1", false),
      ("t1", 5, "a", "a5", false),
      ("t1", 3, "b", "b3", false))
    assert(result(TemporalReads.readTabletRowAt(d, "t1", "a", 10)) === Seq(("a", 5L, "a5")))
    assert(result(TemporalReads.readTabletRowAt(d, "t1", "zz", 10)).isEmpty)
  }

  test("singlet reads: as-of entry and full history ordering") {
    val e = Seq(
      ("s1", 1L, "v1", false),
      ("s1", 4L, "v4", false),
      ("s1", 7L, "", true),
      ("s2", 2L, "other", false))
      .toDF("singlet_id", "height", "v", "is_deletion")
      .withColumn("value", org.apache.spark.sql.functions.encode(
        org.apache.spark.sql.functions.col("v"), "utf-8"))
      .drop("v")
    val at5 = TemporalReads.readSingletEntryAt(e, "s1", 5).collect()
    assert(at5.length === 1 && at5.head.getLong(1) === 4L)
    // Tombstone at 7 ⇒ no live entry as of 8.
    assert(TemporalReads.readSingletEntryAt(e, "s1", 8).isEmpty)
    val hist = TemporalReads.readSingletEntries(e, "s1").collect().map(_.getLong(1)).toSeq
    assert(hist === Seq(7L, 4L, 1L))
  }

  test("asOfJoin: batch point-in-time lookups with misses and tombstones") {
    val d = rows(
      ("t1", 1, "a", "a1", false),
      ("t1", 5, "a", "a5", false),
      ("t1", 3, "b", "", true),
      ("t1", 6, "b", "b6", false))
    val probes = Seq(
      (1L, "t1", "a", 4L),  // resolves a1
      (2L, "t1", "a", 9L),  // resolves a5
      (3L, "t1", "b", 4L),  // tombstoned at 3 -> null
      (4L, "t1", "b", 6L),  // reinserted -> b6
      (5L, "t1", "zz", 9L), // key never existed -> null
      (6L, "t1", "a", 0L))  // key exists only later -> null
      .toDF("probe_id", "tablet_id", "primary_key", "at_height")
    val out = TemporalReads.asOfJoin(d, probes).collect()
    assert(out.length === 6)
    val byId = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(4)) None else Some((r.getLong(4),
        new String(r.getAs[Array[Byte]](5), "UTF-8"))))).toMap
    assert(byId(1L) === Some((1L, "a1")))
    assert(byId(2L) === Some((5L, "a5")))
    assert(byId(3L) === None)
    assert(byId(4L) === Some((6L, "b6")))
    assert(byId(5L) === None)
    assert(byId(6L) === None)
  }

  test("latestPerKey absorbs per-entity skew map-side: the argmax partial-" +
    "aggregates before the exchange, so a hot key never concentrates rows " +
    "(SURVEY §7.4.7)") {
    import org.apache.spark.sql.functions._
    // One entity with 100k versions (the read.go:66 worst case) + 1000 cold
    // keys, spread over 32 input partitions.
    val hot = spark.range(100000).select(
      lit("tbl").as("tablet_id"), lit("hot").as("primary_key"),
      col("id").as("height"), lit(false).as("is_deletion"),
      encode(concat(lit("v"), col("id")), "utf-8").as("value"))
    val cold = spark.range(1000).select(
      lit("tbl").as("tablet_id"), concat(lit("k"), col("id")).as("primary_key"),
      lit(7L).as("height"), lit(false).as("is_deletion"),
      encode(lit("c"), "utf-8").as("value"))
    val d = hot.unionByName(cold).repartition(32)
    val out = TemporalReads.latestPerKey(
      d, Seq("tablet_id", "primary_key"), Seq("value"))
    // max_by is associative, so Spark MUST plan a map-side partial argmax:
    // each task emits at most one row per key it saw, and the shuffle
    // carries O(tasks × keys), never the hot key's row count.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by"),
      s"expected a partial max_by stage before the exchange:\n$plan")
    val got = out.collect()
    assert(got.length === 1001)
    val hotRow = got.find(_.getString(1) == "hot").get
    assert(hotRow.getLong(2) === 99999L)
    assert(new String(hotRow.getAs[Array[Byte]](3), "UTF-8") === "v99999")
  }

  test("existence probe") {
    val d = rows(("t1", 1, "a", "x", false))
    assert(TemporalReads.hasSeenAnyRowForTablet(d, "t1"))
    assert(!TemporalReads.hasSeenAnyRowForTablet(d, "nope"))
  }

  test("readTabletDiff: added/updated/deleted classification across the window") {
    val d = rows(
      ("t1", 1, "stable", "s1", false),   // live both ends, untouched → no row
      ("t1", 2, "upd", "u2", false),      // updated at 7
      ("t1", 7, "upd", "u7", false),
      ("t1", 3, "del", "d3", false),      // tombstoned at 8 → deleted
      ("t1", 8, "del", "", true),
      ("t1", 6, "new", "n6", false),      // first write inside window → added
      ("t1", 2, "revive", "", true),      // tombstoned BEFORE from, insert at 9 → added
      ("t1", 9, "revive", "r9", false),
      ("t1", 4, "flap", "f4", false),     // delete+reinsert inside window → updated
      ("t1", 6, "flap", "", true),
      ("t1", 7, "flap", "f7", false),
      ("t1", 6, "ghost", "", true),       // only a tombstone, never live → no row
      ("t1", 11, "late", "l11", false),   // beyond to-height → out of scope
      ("t2", 6, "upd", "other", false))   // other tablet → out of scope
    def diff(from: Long, to: Long): Seq[(String, String, Long, String, String)] =
      TemporalReads.readTabletDiff(d, "t1", from, to).collect().toSeq.map { r =>
        def str(i: Int): String =
          Option(r.getAs[Array[Byte]](i)).map(new String(_, "UTF-8")).orNull
        (r.getString(0), r.getString(1), r.getLong(2), str(3), str(4))
      }
    assert(diff(5, 10) === Seq(
      ("del", "deleted", 8L, "d3", null),
      ("flap", "updated", 7L, "f4", "f7"),
      ("new", "added", 6L, null, "n6"),
      ("revive", "added", 9L, null, "r9"),
      ("upd", "updated", 7L, "u2", "u7")))
    // Degenerate window: from == to → empty diff.
    assert(diff(10, 10) === Seq.empty)
    // Window from genesis: everything live at `to` is an add.
    assert(diff(-1, 4).map(t => (t._1, t._2)) === Seq(
      ("del", "added"), ("flap", "added"), ("stable", "added"), ("upd", "added")))
    intercept[IllegalArgumentException] {
      TemporalReads.readTabletDiff(d, "t1", 10, 5)
    }
  }
}
