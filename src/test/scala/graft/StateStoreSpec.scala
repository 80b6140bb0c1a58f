package graft

import graft.model._
import graft.store.{Backfill, StateStore}
import org.apache.spark.sql.functions.col

class StateStoreSpec extends SparkTestBase {

  private def req(h: Long, rows: (String, String, String)*): WriteRequest =
    WriteRequest(h, BlockRef(s"blk-$h", h),
      rows.map { case (t, pk, v) =>
        TabletRowM(1, t, h, pk, v.getBytes("UTF-8"), v.isEmpty) },
      Nil)

  test("writeBatch appends rows and the checkpoint last; reads round-trip") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    store.writeBatch(Seq(req(0, ("t1", "a", "a0")), req(1, ("t1", "b", "b1"))))
    assert(store.tabletRows.count() === 2)
    val cp = store.checkpoint(StateStore.GlobalCheckpointKey).get
    assert(cp.height === 1L && cp.blockId === "blk-1")
  }

  test("isNextBlock linearity guard rejects gaps and replays") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    store.writeBatch(Seq(req(0, ("t1", "a", "a0"))))
    assert(store.isNextBlock(StateStore.GlobalCheckpointKey, 1))
    assert(!store.isNextBlock(StateStore.GlobalCheckpointKey, 3)) // gap
    assert(!store.isNextBlock(StateStore.GlobalCheckpointKey, 0)) // replay
    intercept[IllegalArgumentException] {
      store.writeBatch(Seq(req(5, ("t1", "x", "x5"))))
    }
  }

  test("non-contiguous batch is rejected") {
    implicit val s = spark
    val store = new StateStore(tmpDir("store"))
    intercept[IllegalArgumentException] {
      store.writeBatch(Seq(req(0), req(2)))
    }
  }

  test("backfill shards by entity and injectShard replays with checkpoints") {
    implicit val s = spark
    import s.implicits._
    val n = 4
    val muts = (0L until 40L).map { h =>
      (1, s"t${h % 8}", h, s"pk${h % 8}", Array[Byte](h.toByte), false)
    }.toDF(StateStore.tabletRowCols: _*)
    val shardPath = tmpDir("shards")
    Backfill.run(muts, shardPath, n)
    // Every row of one tablet lands in exactly one shard.
    val spread = spark.read.parquet(shardPath)
      .groupBy("tablet_id").agg(org.apache.spark.sql.functions
        .countDistinct(col("shard")).as("n_shards"))
      .filter(col("n_shards") > 1).count()
    assert(spread === 0L)

    val store = new StateStore(tmpDir("store"))
    (0 until n).foreach(i => Backfill.injectShard(spark, shardPath, i, store))
    assert(store.tabletRows.count() === 40L)
    val progress = store.verifyAllShardsWritten(n).collect()
    assert(progress.length === n)
    assert(progress.forall(_.getString(2) != "missing"))
    // A shard that never ran reports missing.
    val progress5 = store.verifyAllShardsWritten(n + 1).collect()
    assert(progress5.count(_.getString(2) == "missing") === 1)
  }
}
