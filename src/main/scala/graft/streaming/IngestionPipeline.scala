package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model._
import graft.store.StateStore

/** A raw block as it arrives from the stream: payload plus fork metadata.
  * `step` mirrors bstream's New/Irreversible steps (pipeline.go:110–137). */
final case class StreamedBlock(
    id: String,
    parentId: String,
    num: Long,
    step: String, // "new" | "irreversible"
    tabletRows: Seq[TabletRowM],
    singletEntries: Seq[SingletEntryM])

object StreamedBlock {
  val StepNew = "new"
  val StepIrreversible = "irreversible"
}

/** Structured-Streaming ingestion (reference pipeline.go, SURVEY.md §3.2).
  *
  * Shape: `readStream(blocks) → filter(blockFilter) → map(blockMapper) →
  * writeStream.foreachBatch(commit)` with a ~1 s trigger — the Spark
  * equivalent of the reference's flush-every-5,000-rows-or-1 s batching
  * (pipeline.go:369–431).
  *
  * Fork handling (T1/T2/T5): `StepNew` blocks are linked into the driver-side
  * [[ForkDB]]; only `StepIrreversible` blocks reach durable storage, so forks
  * never touch Parquet and a reorg is just a different overlay branch — no
  * deletes. "Irreversible" plays the role of the watermark: data behind LIB is
  * immutable.
  *
  * Exactly-once (§7.4 risk 6): `foreachBatch` re-delivery is idempotent via
  * the `isNextBlock` linearity guard — a replayed batch whose heights are at
  * or below the checkpoint is skipped, mirroring write.go:331–347.
  */
final class IngestionPipeline(
    store: StateStore,
    blockFilter: StreamedBlock => Boolean = _ => true,
    indexMinMutations: Long = 25000L)(implicit spark: SparkSession) {

  val forkDB = new ForkDB

  /** Index maintenance (write.go:64–69, indexing.go:32–98): per-tablet
    * mutation counters; tablets that cross the reference's heuristic get a
    * fresh TabletIndex snapshot built and written in the same commit flow. */
  val indexCache = new graft.snapshot.Snapshots.IndexCache(indexMinMutations)


  /** Commit one micro-batch. Runs on the driver per batch (the data writes
    * are distributed; the fork bookkeeping is small, see ForkDB docs). */
  private[graft] def commitBatch(batch: Dataset[StreamedBlock], batchId: Long): Unit = {
    // Fork bookkeeping needs block order; micro-batches are small (seconds of
    // blocks), so collecting the *metadata + payload* here matches the
    // reference's single-threaded handler (pipeline.go:133–137).
    val blocks = batch.collect().filter(blockFilter).sortBy(b => (b.num, b.step != StreamedBlock.StepNew))
    val irreversible = scala.collection.mutable.ListBuffer.empty[WriteRequest]
    blocks.foreach { b =>
      val req = WriteRequest(b.num, BlockRef(b.id, b.num), b.tabletRows, b.singletEntries)
      b.step match {
        case StreamedBlock.StepNew =>
          forkDB.addLink(BlockRef(b.id, b.num), b.parentId, req)
        case StreamedBlock.StepIrreversible =>
          irreversible += req
          forkDB.moveLIB(BlockRef(b.id, b.num))
        case other => throw new IllegalArgumentException(s"unknown step: $other")
      }
    }
    val reqs = irreversible.toSeq
    if (reqs.nonEmpty) {
      // Idempotent replay: drop heights already checkpointed.
      // store.checkpoint is O(1) after the first call (single-writer cache
      // warmed from the durable log) — no second mirror needed here.
      val cp = store.checkpoint(StateStore.GlobalCheckpointKey).map(_.height).getOrElse(-1L)
      val fresh = reqs.filter(_.height > cp)
      if (fresh.nonEmpty) {
        store.writeBatch(fresh)
        // Index maintenance: count this batch's mutations per tablet and
        // snapshot any tablet past the trigger heuristic, pinned at the
        // batch head height (so snapshot ∪ tail reads stay consistent).
        val head = fresh.map(_.height).max
        val byTablet = fresh.flatMap(_.tabletRows).groupBy(_.tabletId)
        byTablet.foreach {
          case (tablet, rows) => indexCache.increment(tablet, rows.size.toLong)
        }
        indexCache.tabletsToIndex().foreach { tablet =>
          // Persist the index across its two consumers (snapshot write +
          // row count) — without it the full build re-executes per action.
          val idx = graft.snapshot.Snapshots
            .buildTabletIndex(store.tabletRows, tablet, head).persist()
          try {
            val squelch = graft.snapshot.Snapshots
              .squelchCount(store.tabletRows, tablet, head)
            val collection = byTablet.get(tablet)
              .flatMap(_.headOption).map(_.collection).getOrElse(0)
            store.writeTabletSnapshot(idx, tablet, head, squelch, collection)
            indexCache.recordIndexed(tablet, idx.count())
          } finally idx.unpersist()
        }
      }
    }
  }

  /** Wire a streaming Dataset of blocks into the store. */
  def start(
      blocks: Dataset[StreamedBlock],
      checkpointLocation: String,
      triggerMillis: Long = 1000L): StreamingQuery =
    blocks.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch { (b: Dataset[StreamedBlock], id: Long) => commitBatch(b, id) }
      .start()

  /** Speculative overlay for a read at block `refId`, as mutation DataFrames
    * in block order — feeds TemporalReads' `speculative` argument
    * (fluxdb.go:110–115). */
  def speculativeTabletRows(refId: String): Option[Seq[DataFrame]] = {
    import spark.implicits._
    forkDB.speculativeWrites(refId).map(_.map { req =>
      req.tabletRows.toDF(StateStore.tabletRowCols: _*)
    })
  }

  /** Readiness (T6, pipeline.go:441–443): head within `thresholdSeconds` of
    * wall clock. The block→time mapping is embedder-supplied. */
  def isReady(headTimestampMillis: Long, nowMillis: Long, thresholdSeconds: Int = 15): Boolean =
    nowMillis - headTimestampMillis <= thresholdSeconds * 1000L
}
