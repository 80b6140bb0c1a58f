package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Durable storage layout + batch writer (reference write.go, store/kv).
  *
  * Layout (SURVEY.md §1.4): three append-only Parquet tables under a root —
  *   tablet_rows/      partitioned by collection, sorted within files by
  *                     (tablet_id, height) so min/max row-group stats prune
  *                     both the tablet and the height predicate at scan time.
  *   singlet_entries/  same.
  *   checkpoints/      tiny commit log; the LAST durably-visible write of a
  *                     batch, mirroring the reference's checkpoint-key-last
  *                     flush ordering (store/kv/store.go:418–450).
  *
  * Commit protocol: the reference stages at most 100 mutations per KV flush
  * and orders the checkpoint strictly last so a crash never leaves the
  * checkpoint ahead of the data (write.go:40–72). Here each `writeBatch` call
  * appends data files first and the checkpoint row last; a replayed batch is
  * detected by the `isNextBlock` linearity guard (write.go:331–347).
  */
final class StateStore(val root: String)(implicit spark: SparkSession) {
  import StateStore._

  val tabletRowsPath = s"$root/tablet_rows"
  val singletEntriesPath = s"$root/singlet_entries"
  val checkpointsPath = s"$root/checkpoints"
  val snapshotsPath = s"$root/tablet_snapshots"

  /** Linearity guard (write.go:331–347): a batch starting at height h is
    * writable only if h == lastCheckpoint.height + 1 (or the store is empty).
    * Height 0 is a valid first height (read_test.go:168–182). */
  def isNextBlock(checkpointKey: String, firstHeight: Long): Boolean =
    checkpoint(checkpointKey) match {
      case None     => true
      case Some(cp) => firstHeight == cp.height + 1
    }

  /** Append one batch of write requests; checkpoint written last (S5).
    * `requests` must be contiguous ascending heights. */
  def writeBatch(
      requests: Seq[WriteRequest],
      checkpointKey: String = GlobalCheckpointKey): Unit = {
    if (requests.isEmpty) return
    val sorted = requests.sortBy(_.height)
    require(
      sorted.sliding(2).forall { case Seq(a, b) => b.height == a.height + 1; case _ => true },
      "non-contiguous heights in batch")
    require(
      isNextBlock(checkpointKey, sorted.head.height),
      s"batch head ${sorted.head.height} does not follow checkpoint for $checkpointKey")

    import spark.implicits._
    val rows = sorted.flatMap(_.tabletRows)
    val entries = sorted.flatMap(_.singletEntries)
    if (rows.nonEmpty)
      writeTabletRows(rows.toDF(tabletRowCols: _*))
    if (entries.nonEmpty)
      entries
        .toDF(singletEntryCols: _*)
        .write.mode(SaveMode.Append).parquet(singletEntriesPath)
    // Checkpoint last — the durability barrier.
    val head = sorted.last
    writeCheckpoint(Checkpoint(checkpointKey, head.height, head.block.id, head.block.num))
  }

  /** Append a checkpoint row AND update the single-writer cache — every
    * checkpoint write in this process must go through here (a direct
    * parquet append would leave `checkpoint()` serving a stale cache). */
  def writeCheckpoint(cp: Checkpoint): Unit = {
    import spark.implicits._
    Seq(cp)
      .toDF("key", "height", "block_id", "block_num")
      .write.mode(SaveMode.Append).parquet(checkpointsPath)
    cpCache.put(cp.key, cp)
  }

  // Single-writer in-memory mirror of the latest checkpoint per key: the
  // durable log is append-only and this process is the only writer (the
  // linearity guard already assumes that), so re-reading the growing log
  // on every batch is pure overhead (~30% of ingestion throughput).
  private val cpCache = scala.collection.concurrent.TrieMap.empty[String, Checkpoint]

  /** Append pre-shaped mutation DataFrames (streaming foreachBatch path). */
  def writeTabletRows(df: DataFrame): Unit =
    df.sortWithinPartitions("tablet_id", "height")
      .write.mode(SaveMode.Append).parquet(tabletRowsPath)

  def tabletRows: DataFrame = spark.read.schema(Schemas.tabletRows).parquet(tabletRowsPath)
  def singletEntries: DataFrame =
    spark.read.schema(Schemas.singletEntries).parquet(singletEntriesPath)

  def checkpointsDF: DataFrame =
    // Same missing-path-only semantics as tabletSnapshots: real read
    // errors must surface.
    if (!new java.io.File(checkpointsPath).exists())
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.checkpoints)
    else spark.read.schema(Schemas.checkpoints).parquet(checkpointsPath)

  /** Latest checkpoint for a key (read.go:417–437). The checkpoint log is
    * append-only; the live checkpoint is the highest height per key.
    * Served from the single-writer cache once warm; the durable log is the
    * source of truth at startup. */
  def checkpoint(key: String): Option[Checkpoint] =
    cpCache.get(key).orElse {
      val fromLog = readCheckpointFromLog(key)
      fromLog.foreach(cpCache.put(key, _))
      fromLog
    }

  private def readCheckpointFromLog(key: String): Option[Checkpoint] = {
    import spark.implicits._
    checkpointsDF
      .filter(col("key") === lit(key))
      .orderBy(col("height").desc)
      .limit(1)
      .select(col("key"), col("height"),
        col("block_id").as("blockId"), col("block_num").as("blockNum"))
      .as[Checkpoint]
      .collect()
      .headOption
  }

  /** Append one tablet snapshot (the reference's TabletIndex write,
    * indexing.go:100–147): `index` carries (primary_key, height) as built by
    * [[graft.snapshot.Snapshots.buildTabletIndex]]. */
  def writeTabletSnapshot(
      index: DataFrame,
      tabletId: String,
      atHeight: Long,
      squelchCount: Long,
      collection: Int = 0): Unit =
    index
      .select(
        lit(collection).as("collection"),
        lit(tabletId).as("tablet_id"),
        lit(atHeight).as("at_height"),
        lit(squelchCount).as("squelch_count"),
        col("primary_key"), col("height"))
      .write.mode(SaveMode.Append).parquet(snapshotsPath)

  def tabletSnapshots: DataFrame = {
    // Crash recovery for the prune swap: the log missing while the
    // moved-aside copy exists means a prune died between its two renames —
    // restore the complete old log instead of silently reading "empty".
    val dir = new java.io.File(snapshotsPath)
    val old = new java.io.File(s"$snapshotsPath.old")
    if (!dir.exists() && old.exists())
      require(old.renameTo(dir), s"could not recover $snapshotsPath from .old")
    // Only a missing path means "no snapshots yet" — a corrupt or
    // unreadable log must surface, not silently degrade reads to full
    // scans forever.
    if (!dir.exists())
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.tabletSnapshots)
    else spark.read.schema(Schemas.tabletSnapshots).parquet(snapshotsPath)
  }

  /** Most recent snapshot of `tabletId` at or below `maxHeight`:
    * `(at_height, rows)` — the read-path lookup (read.go:47,
    * indexing.go:451–468). */
  def latestTabletSnapshot(
      tabletId: String,
      maxHeight: Long = Long.MaxValue): Option[(Long, DataFrame)] = {
    val scoped = tabletSnapshots
      .filter(col("tablet_id") === lit(tabletId) && col("at_height") <= lit(maxHeight))
    val heights = scoped.agg(max(col("at_height"))).collect()
    Option(heights.head.get(0)).map(_.asInstanceOf[Long]).map { h =>
      h -> scoped.filter(col("at_height") === lit(h)).select("primary_key", "height")
    }
  }

  /** Snapshot-aware as-of read: uses the newest snapshot at or below
    * `atHeight` so the mutation scan is bounded to the tail
    * `(snapshotHeight, atHeight]` (SURVEY.md §3.1); falls back to the full
    * scan when no snapshot exists. */
  def readTabletAt(
      tabletId: String,
      atHeight: Long,
      speculative: Seq[DataFrame] = Nil): DataFrame =
    latestTabletSnapshot(tabletId, atHeight) match {
      case Some((snapH, snap)) =>
        graft.snapshot.Snapshots.readTabletAtWithSnapshot(
          tabletRows, snap, snapH, tabletId, atHeight, speculative)
      case None =>
        graft.read.TemporalReads.readTabletAt(tabletRows, tabletId, atHeight, speculative)
    }

  /** Apply the retention policy to one tablet's snapshot log
    * (indexing.go:329–398 via [[graft.snapshot.Snapshots.pruneRetention]]):
    * keep first, last, and every `keepEvery`-th intermediate height,
    * physically rewriting the snapshot table. Local-filesystem rewrite via
    * a temp directory + atomic-ish swap; on a real deployment this is a
    * Delta `DELETE WHERE` / compaction instead. Returns the kept heights. */
  def pruneTabletSnapshots(tabletId: String, keepEvery: Int): Seq[Long] = {
    val heights = tabletSnapshots
      .filter(col("tablet_id") === lit(tabletId))
      .select("at_height").distinct().collect().map(_.getLong(0)).toSeq
    val keep = graft.snapshot.Snapshots.pruneRetention(heights, keepEvery)
    if (keep.toSet != heights.toSet) {
      val keepSet = keep.toSet
      val remaining = tabletSnapshots.filter(
        col("tablet_id") =!= lit(tabletId) ||
          col("at_height").isInCollection(keepSet))
      val tmp = s"$snapshotsPath.pruning"
      remaining.write.mode(SaveMode.Overwrite).parquet(tmp)
      // Swap-before-delete: move the old log aside, promote the new one,
      // THEN delete — a crash mid-sequence leaves a complete log (old or
      // new) on disk instead of destroying every tablet's snapshots.
      val dir = new java.io.File(snapshotsPath)
      val old = new java.io.File(s"$snapshotsPath.old")
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(old)
      require(dir.renameTo(old), s"could not move aside $snapshotsPath")
      require(new java.io.File(tmp).renameTo(dir), s"swap failed for $snapshotsPath")
      rm(old)
    }
    keep
  }

  /** Latest entry of one singlet as of `atHeight` (read.go:300–349). */
  def readSingletEntryAt(
      singletId: String,
      atHeight: Long,
      speculative: Seq[DataFrame] = Nil): DataFrame =
    graft.read.TemporalReads.readSingletEntryAt(
      singletEntries, singletId, atHeight, speculative)

  /** Full history of one singlet, most recent first (read.go:356–408). */
  def readSingletEntries(
      singletId: String,
      speculative: Seq[DataFrame] = Nil): DataFrame =
    graft.read.TemporalReads.readSingletEntries(singletEntries, singletId, speculative)

  /** All shard checkpoints (read.go:439–476): prefix scan of "shard-*". */
  def shardCheckpoints(): DataFrame =
    checkpointsDF
      .filter(col("key").startsWith(ShardCheckpointPrefix))
      .groupBy(col("key"))
      .agg(max_by(struct(col("height"), col("block_id"), col("block_num")), col("height")).as("w"))
      .select(col("key"), col("w.height").as("height"), col("w.block_id").as("block_id"),
        col("w.block_num").as("block_num"))

  /** Shard-progress reconciliation (J3, write.go:82–181): classify every shard
    * against the highest shard height. Returns (key, height, status). */
  def verifyAllShardsWritten(expectedShards: Int): DataFrame = {
    val cps = shardCheckpoints()
    val refHeight = cps.agg(max(col("height"))).collect().headOption.flatMap(r =>
      Option(r.get(0)).map(_.asInstanceOf[Long]))
    import spark.implicits._
    val expected = (0 until expectedShards)
      .map(i => f"$ShardCheckpointPrefix$i%03d").toDF("key")
    expected
      .join(cps, Seq("key"), "left")
      .select(col("key"), col("height"),
        when(col("height").isNull, lit("missing"))
          .when(col("height") === lit(refHeight.getOrElse(-1L)), lit("complete"))
          .otherwise(lit("behind")).as("status"))
      .orderBy("key")
  }
}

object StateStore {
  val GlobalCheckpointKey = "checkpoint" // const.go:17
  val ShardCheckpointPrefix = "shard-"   // read.go:454–464

  val tabletRowCols =
    Seq("collection", "tablet_id", "height", "primary_key", "value", "is_deletion")
  val singletEntryCols = Seq("collection", "singlet_id", "height", "value", "is_deletion")
}

/** Parallel backfill (reference sharder.go + shardinject.go, SURVEY.md §3.3).
  *
  * The reference splits the mutation stream into N shards by
  * `highwayhash(entity_key) % N` so all versions of one entity land in one
  * shard (sharder.go:107–192), writes per-shard segment files, then replays
  * each shard through the writer in a separate process. In Spark the shuffle
  * IS the sharder and the driver IS the reconciler: one batch job
  * repartitions by entity hash, sorts within partitions by height, and writes
  * partitioned output — this is the shape that scales to 100 TB (the
  * per-entity co-location means downstream as-of reads never cross shards).
  */
object Backfill {

  /** Shard expression: deterministic hash of the entity key, non-negative. */
  def shardExpr(n: Int) =
    pmod(hash(col("collection"), col("tablet_id")), lit(n)).cast("int")

  /** One-shot backfill: mutations → shard-partitioned, height-sorted Parquet.
    * `mutations` must carry the tablet_rows schema. */
  def run(mutations: DataFrame, outPath: String, shards: Int): Unit =
    mutations
      .withColumn("shard", shardExpr(shards))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("tablet_id", "primary_key", "height")
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outPath)

  /** Replay one shard's segment into a live store (shardinject.go:48–174),
    * skipping heights at or below the shard checkpoint (startAfter). */
  def injectShard(
      spark: SparkSession,
      shardPath: String,
      shard: Int,
      store: StateStore,
      startAfter: Long = -1L): Unit = {
    val seg = spark.read.parquet(shardPath).filter(col("shard") === lit(shard))
      .filter(col("height") > lit(startAfter))
      .drop("shard")
    store.writeTabletRows(seg.select(StateStore.tabletRowCols.map(col): _*))
    val headRow = seg.agg(max(col("height"))).collect().head
    if (!headRow.isNullAt(0)) {
      store.writeCheckpoint(Checkpoint(
        f"${StateStore.ShardCheckpointPrefix}$shard%03d",
        headRow.getLong(0), "", headRow.getLong(0)))
    }
  }
}
