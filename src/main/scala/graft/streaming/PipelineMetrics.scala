package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Head/LIB/lag gauges (T7; reference metrics/metrics.go:15–24 publishes
  * `statedb` HeadBlockNumber and HeadTimeDrift from its in-process handler).
  *
  * The Spark-native seam is a [[StreamingQueryListener]]: progress events
  * fire once per micro-batch ON THE DRIVER — exactly where the [[ForkDB]]
  * lives — so sampling the fork state is a lock-read, needs no executor
  * plumbing, and rides the same bus every metrics sink (Prometheus servlet,
  * Dropwizard, custom) already listens to.
  *
  * `headTimestampMillis` maps a block num to its event-time millis (the
  * block→time mapping is embedder-supplied, like
  * [[IngestionPipeline.isReady]]); when present, the drift gauge tracks
  * wall-clock minus head event-time, the reference's HeadTimeDrift.
  */
final class PipelineMetrics(
    forkDB: ForkDB,
    headTimestampMillis: Option[Long => Long] = None,
    clockMillis: () => Long = () => System.currentTimeMillis(),
    maintenanceOf: Option[() => (Int, Long, Long)] = None,
    contentionOf: Option[() => (Long, Long, Long, Long, Long, Long)] = None,
    headCheckOf: Option[() => (Long, Long, Long)] = None)
    extends StreamingQueryListener {

  private val headNum = new AtomicLong(-1L)
  private val libNum = new AtomicLong(-1L)
  private val lag = new AtomicLong(-1L)
  private val driftMillis = new AtomicLong(-1L)
  private val batchCount = new AtomicLong(0L)
  private val inputRowCount = new AtomicLong(0L)
  private val idxBacklog = new AtomicLong(-1L)
  private val idxLastBuildMs = new AtomicLong(-1L)
  private val idxBuilds = new AtomicLong(-1L)
  private val pubLost = new AtomicLong(-1L)
  private val pubTakeovers = new AtomicLong(-1L)
  private val pubFenced = new AtomicLong(-1L)
  private val pubRebased = new AtomicLong(-1L)
  private val pubEscalated = new AtomicLong(-1L)
  private val pubHeartbeats = new AtomicLong(-1L)
  private val headClean = new AtomicLong(-1L)
  private val headDamaged = new AtomicLong(-1L)
  private val headLastMs = new AtomicLong(-1L)

  /** HeadBlockNumber gauge (-1 until the first sampled block). */
  def headBlockNumber: Long = headNum.get()

  /** Last-irreversible-block gauge. */
  def libBlockNumber: Long = libNum.get()

  /** Reversible lag: head − LIB, the depth of the speculative overlay. */
  def reversibleLag: Long = lag.get()

  /** HeadTimeDrift in millis (-1 without a block→time mapping). */
  def headTimeDriftMillis: Long = driftMillis.get()

  /** Micro-batches observed via the listener bus. */
  def batchesObserved: Long = batchCount.get()

  /** Cumulative input rows observed via the listener bus. */
  def inputRowsObserved: Long = inputRowCount.get()

  /** Index-maintenance backlog depth (-1 without a maintenance hook):
    * tablets past the index heuristic awaiting a build. */
  def indexBacklogDepth: Long = idxBacklog.get()

  /** Wall-millis of the last snapshot build (-1 until one completes). */
  def indexLastBuildMillis: Long = idxLastBuildMs.get()

  /** Snapshot builds completed since pipeline start. */
  def indexBuildsCompleted: Long = idxBuilds.get()

  /** Publish races lost and retried (-1 without a contention hook). A
    * steadily rising rate is the early-warning signal for a hot table or
    * an undersized publish lease — the commit still lands (retried), but
    * each loss costs a backoff (commit) or a recompute (merge). */
  def publishLostRaces: Long = pubLost.get()

  /** Lease takeovers performed by this process's publishers (-1 without
    * a hook): nonzero means some publisher looked dead past the lease —
    * crashes, or pauses longer than graft.publish.leaseMs. */
  def publishLeaseTakeovers: Long = pubTakeovers.get()

  /** Publishes rejected by the fencing nonce at the swap (-1 without a
    * hook): a woken stale publisher was fenced — the protocol working as
    * designed, but frequent hits mean the lease is badly undersized. */
  def publishFenced: Long = pubFenced.get()

  /** Merge publishes that lost a race but REBASED their staged attempt
    * onto the new head instead of re-deriving (-1 without a hook): each
    * one is a whole merge derivation the contention did not cost. High
    * fenced/lost counts with high rebased counts = contention is being
    * absorbed cheaply; high lost with ZERO rebased = every loss pays a
    * recompute (overlapping key sets, or compactions rewriting the
    * merge's matched files). */
  def publishRebasedMerges: Long = pubRebased.get()

  /** Merge recomputes that ran under a loss-escalation RESERVATION (-1
    * without a hook): the starvation-proofing path. Nonzero means a
    * racing rewriter (usually a compactor) keeps invalidating merges
    * past rebasing; a rate tracking the compaction rate means the
    * compactor cadence sits near the merge derivation time — the
    * recompute-spiral regime the escalation exists to bound. */
  def publishEscalatedMerges: Long = pubEscalated.get()

  /** Escalation-lease heartbeats written by escalated merge derivations
    * (-1 without a hook). A live escalation refreshes its SHORT takeover
    * lease every lease/3; escalated > 0 with heartbeats stuck at 0 means
    * derivations finish inside one interval (healthy) — while a foreign
    * `publish_lease_takeovers` rise paired with escalations says
    * derivations are outliving even the heartbeat (host stalls). */
  def publishEscalationHeartbeats: Long = pubHeartbeats.get()

  /** Periodic head consistency checks that came back CLEAN (-1 without a
    * hook). See [[graft.store.StateStore.verifyHeads]]. */
  def headChecksClean: Long = headClean.get()

  /** Head checks that found a published generation's sidecar overwritten
    * AFTER its publish (-1 without a hook). NONZERO IS AN INCIDENT: the
    * store admitted a write the conditional-create contract forbids —
    * committed data may resolve to a stale publisher's record. Check the
    * pipeline's `lastHeadProblem` for the damaged table/generation. */
  def headChecksDamaged: Long = headDamaged.get()

  /** Epoch millis of the last head check (-1 until one runs) — proves
    * the probe is actually running at its configured cadence. */
  def headCheckLastMillis: Long = headLastMs.get()

  /** One flat scrape of every gauge. */
  def snapshot: Map[String, Long] = Map(
    "head_block_num" -> headBlockNumber,
    "lib_block_num" -> libBlockNumber,
    "reversible_lag" -> reversibleLag,
    "head_time_drift_millis" -> headTimeDriftMillis,
    "batches_observed" -> batchesObserved,
    "input_rows_observed" -> inputRowsObserved,
    "index_backlog_depth" -> indexBacklogDepth,
    "index_last_build_millis" -> indexLastBuildMillis,
    "index_builds_completed" -> indexBuildsCompleted,
    "publish_lost_races" -> publishLostRaces,
    "publish_lease_takeovers" -> publishLeaseTakeovers,
    "publish_fenced" -> publishFenced,
    "publish_rebased_merges" -> publishRebasedMerges,
    "publish_escalated_merges" -> publishEscalatedMerges,
    "publish_escalation_heartbeats" -> publishEscalationHeartbeats,
    "head_checks_clean" -> headChecksClean,
    "head_checks_damaged" -> headChecksDamaged,
    "head_check_last_millis" -> headCheckLastMillis)

  /** Sample the fork state now (also invoked per progress event). */
  def sample(): Unit = {
    val h = forkDB.head
    val l = forkDB.lib
    headNum.set(h.num)
    libNum.set(l.num)
    lag.set(h.num - l.num)
    headTimestampMillis.foreach(f => driftMillis.set(clockMillis() - f(h.num)))
    maintenanceOf.foreach { f =>
      val (backlog, lastMs, builds) = f()
      idxBacklog.set(backlog.toLong)
      idxLastBuildMs.set(lastMs)
      idxBuilds.set(builds)
    }
    contentionOf.foreach { f =>
      val (lost, takeovers, fenced, rebased, escalated, heartbeats) = f()
      pubLost.set(lost)
      pubTakeovers.set(takeovers)
      pubFenced.set(fenced)
      pubRebased.set(rebased)
      pubEscalated.set(escalated)
      pubHeartbeats.set(heartbeats)
    }
    headCheckOf.foreach { f =>
      val (clean, damaged, lastMs) = f()
      headClean.set(clean)
      headDamaged.set(damaged)
      headLastMs.set(lastMs)
    }
  }

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    batchCount.incrementAndGet()
    inputRowCount.addAndGet(event.progress.numInputRows)
    sample()
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
