package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming analytics over an event stream — the Structured Streaming
  * surface of the engine beyond ingestion (SURVEY.md §2.8 notes the reference
  * has no event-time windowing; these are the Spark-native operators a user
  * of the engine gets on the same tables).
  *
  * Design notes for scale:
  *   - The windowed aggregation is a streaming state-store aggregation with
  *     map-side partial aggregation; the watermark bounds state size (late
  *     events beyond the threshold are dropped, state for closed windows is
  *     evicted).
  *   - Sessionization keeps ONE state object per user key
  *     (`flatMapGroupsWithState`), emitting a session row when the gap
  *     timeout closes it — state is O(active users), not O(events).
  */
object StreamingAnalytics {

  final case class Event(userId: Long, eventType: String, ts: Timestamp, value: Double)

  /** Watermarked tumbling-window count/sum per event type.
    * Late data beyond `watermark` is dropped; closed windows are emitted
    * once (Append) or updated continuously (Update). */
  def hourlyWindowCounts(
      events: DataFrame, // columns: user_id, event_type, ts (timestamp), value
      watermark: String = "30 minutes",
      window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming EXACT dedup for a document stream (the training-data
    * pipeline's first stage, online): emit only the FIRST document per
    * content hash; later duplicates are dropped. Dedup state lives in the
    * streaming state store, sharded by hash across executors — the same
    * hash-partitioned layout the batch `p_dedup_exact` groupBy uses, kept
    * incrementally. The watermark bounds state: a duplicate arriving
    * beyond the horizon can re-emit (the standard bounded-state trade;
    * unbounded exactness is the batch dedup over the durable table). */
  def streamingDedup(
      docs: DataFrame, // columns: doc_id, text, ts (timestamp)
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicates("text_hash")

  final case class DocEvent(docId: Long, textHash: String, ts: Timestamp)
  final case class DedupGroupState(
      keeperDocId: Long, firstTsMs: Long, lastTsMs: Long, nCopies: Long)
  final case class DedupGroupOut(
      textHash: String, keeperDocId: Long, nCopies: Long,
      firstTsMs: Long, lastTsMs: Long)

  /** Streaming dedup-keeper stats: one state object per content hash
    * accumulates (keeper = min doc_id, copy count, first/last event time)
    * and emits ONE summary row when the hash goes idle past `horizonMillis`
    * (event-time timeout — deterministic under replay). The streaming form
    * of the batch `p_dedup_exact_keeper`: same keeper rule, state
    * O(active hashes), emission driven by the watermark. Callers must set
    * a watermark on `ts` upstream. */
  def dedupKeeperStats(
      docs: Dataset[DocEvent],
      horizonMillis: Long = 30L * 60 * 1000)(
      implicit spark: SparkSession): Dataset[DedupGroupOut] = {
    import spark.implicits._
    docs
      .groupByKey(_.textHash)
      .flatMapGroupsWithState[DedupGroupState, DedupGroupOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (hash: String, rows: Iterator[DocEvent], state: GroupState[DedupGroupState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(DedupGroupOut(hash, s.keeperDocId, s.nCopies, s.firstTsMs, s.lastTsMs))
          } else {
            val batch = rows.toSeq
            val s0 = state.getOption.getOrElse(
              DedupGroupState(Long.MaxValue, Long.MaxValue, Long.MinValue, 0L))
            val s1 = batch.foldLeft(s0) { (s, e) =>
              DedupGroupState(
                math.min(s.keeperDocId, e.docId),
                math.min(s.firstTsMs, e.ts.getTime),
                math.max(s.lastTsMs, e.ts.getTime),
                s.nCopies + 1)
            }
            state.update(s1)
            state.setTimeoutTimestamp(s1.lastTsMs + horizonMillis)
            Iterator.empty
          }
      }
  }

  /** Stream-STATIC near-dup probe: flag each arriving document whose LSH
    * band key collides with the materialized corpus band index — the
    * streaming front door of `p_dedup_incremental` (same constants, same
    * band construction, shared via [[graft.queries.MinHashLsh]]).
    *
    * Stateless by design: the incoming doc's signature is computed
    * per-row inside the scan stage ([[graft.queries.MinHashLsh.perRowBands]]
    * — `array_min(transform(...))`, zero shuffle, so no watermark is
    * needed), and a stream-static inner join keeps NO stream state — the
    * static side is just re-planned per micro-batch. Output is one row
    * per (incoming doc, colliding corpus doc, band): CANDIDATES, possibly
    * repeated across bands — exact-Jaccard verification stays a batch
    * concern on the flagged subset (the standard two-stage shape; a
    * candidate row here only routes the doc to quarantine/verify).
    * At 100 TB the static side is the store's band-index table and the
    * join broadcasts or bucket-joins it exactly as the batch plan does. */
  def streamStaticNearDupProbe(
      docs: DataFrame, // streaming; columns: doc_id, text
      bandIndex: DataFrame // static corpus band index: doc_id, band, bkey
  ): DataFrame =
    graft.queries.MinHashLsh.perRowBands(docs)
      .join(bandIndex
          .select(col("doc_id").as("corpus_doc_id"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("corpus_doc_id") =!= col("doc_id"))
      .select(col("doc_id"), col("corpus_doc_id"), col("band"))

  /** Watermarked stream-stream INTERVAL join (the attribution shape):
    * each left event matches right events of the same user whose event
    * time lands in `[l_ts, l_ts + windowMillis]`. The time bound plus the
    * watermarks on BOTH sides is what makes the join's state finite — a
    * stream-stream equi-join without them would buffer both streams
    * forever; with them, rows older than `watermark + window` are evicted
    * from the join state store every trigger. State is sharded by the
    * join key (user), the same layout as a batch shuffle join. */
  def intervalJoin(
      left: DataFrame, // columns: user_id, event_type, ts, value
      right: DataFrame,
      windowMillis: Long = 10L * 60 * 1000,
      watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_type").as("l_type"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("event_type").as("r_type"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"interval $windowMillis milliseconds"))
      .select(col("user_id"), col("l_type"), col("l_ts"),
        col("r_type"), col("r_ts"), col("r_value"))
  }

  final case class SessionState(
      sessionStart: Long, lastTs: Long, nEvents: Long, sumValue: Double)

  final case class SessionOut(
      userId: Long, sessionStartMs: Long, sessionEndMs: Long,
      nEvents: Long, sumValue: Double)

  /** Gap-based sessionization with explicit keyed state: one open session per
    * user; a new event either extends it or (gap exceeded) closes it and
    * emits the finished session. Idle sessions are flushed by an EVENT-TIME
    * timeout — the watermark passing `lastTs + gap` closes them — so
    * emission is deterministic under replay (a processing-time timeout would
    * also busy-loop the no-trigger micro-batch scheduler). The streaming
    * analog of the batch `q_events_sessionize`. Callers must set a watermark
    * on `ts` upstream (event-time timeouts require one). */
  def sessionize(
      events: Dataset[Event],
      gapMillis: Long = 30L * 60 * 1000)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMillis =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.lastTs + gapMillis)
              case None => ()
            }
            closed.result().iterator
          }
      }
  }

  /** NATIVE streaming session windows — the SAME built-in `session_window`
    * aggregate the batch `q_events_session_native` query runs, as a
    * watermarked stream. This is the operator's home turf: Structured
    * Streaming keeps per-user session state inside the aggregation
    * (merging sessions as gaps fill in, state hash-partitioned by
    * user_id — one shuffle, like the batch plan) and, in Append mode,
    * emits each session EXACTLY once: when the watermark passes its
    * close, so no event still admissible can extend or merge it.
    *
    * Stream ≡ batch contract (spec-pinned over the real events corpus,
    * shuffled within micro-batches): the streamed sessions equal the
    * batch aggregate's as long as no event arrives later than
    * `watermarkDelay` behind the max event time already seen. An event
    * later than that is DROPPED — its session under-counts (or goes
    * missing) relative to a batch over the complete data; that is the
    * standard bounded-state trade, and the drop case is pinned in the
    * spec right next to the equality. */
  def streamingSessionCounts(
      events: DataFrame, // columns: user_id, tstamp (timestamp)
      gap: String = "30 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("tstamp", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("tstamp"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  final case class ReservoirRow(
      source: String, docId: Long, weight: Long, sampleKey: Long, rank: Long)

  /** Streaming weighted reservoir — the online form of
    * `p_sample_weighted` (priority sampling, Duffield et al. 2007). The
    * batch sampler's survivors depend only on the SET of deterministic
    * priority keys, never on arrival order or batching — exactly the
    * property that makes priority sampling the streamable weighted
    * sampler: per-source state is just the current k best
    * (key = u div w ASC) entries, merged monotonically per micro-batch.
    * Emits the source's full reservoir on every update (Update mode:
    * downstream keeps the last row per (source, rank)); after any split
    * of the corpus into micro-batches — and under at-least-once
    * redelivery, which dedups on the identical triple — the final
    * reservoir EQUALS the batch query's, spec-pinned. State is
    * O(sources × k), hash-partitioned by source like every keyed state
    * here. */
  def streamingWeightedSample(
      docs: DataFrame, // columns: source, doc_id, text
      k: Int = 25): Dataset[ReservoirRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("weight"),
        (graft.queries.PipelineQueries.h60(col("doc_id").cast("string")) + 1L)
          .as("u"))
      .withColumn("sample_key", expr("u div weight"))
      .select(col("source"), col("doc_id"), col("weight"), col("sample_key"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long, Long)], ReservoirRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[(String, Long, Long, Long)],
         state: GroupState[Seq[(Long, Long, Long)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
            rows.map(r => (r._4, r._2, r._3)))
            // Dedup by doc_id, NOT the full (key, id, weight) triple: a
            // redelivered doc whose text (hence weight) changed between
            // deliveries must not occupy two reservoir slots forever. Keep
            // the smallest (key, weight) per doc — deterministic in the SET
            // of versions seen (order/batching-invariant), and identical to
            // a distinct-triple dedup when redelivery is byte-identical,
            // which is what the stream≡batch spec exercises.
            .groupBy(_._2).valuesIterator
            .map(_.minBy { case (key, _, w) => (key, w) })
            .toSeq
            .sortBy { case (key, id, _) => (key, id) }
            .take(k)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((key, id, w), i) =>
            ReservoirRow(source, id, w, key, (i + 1).toLong)
          }
      }
  }

  /** Streaming quality gate: the Gopher rules applied online, routing
    * every document to `keep` or `quarantine`. STATELESS — the rules are
    * scan-local column expressions ([[graft.queries.GopherRules]], the
    * identical code the oracle-verified batch report runs), so the gate
    * needs no watermark, no state store, and no shuffle: it fuses into
    * the source scan at any throughput. */
  def qualityGate(docs: DataFrame): DataFrame = // columns: doc_id, text, ...
    graft.queries.GopherRules.withFlags(docs)
      .withColumn("route",
        when(col("keep") === 1, "keep").otherwise("quarantine"))

  /** Streaming decontamination probe: incoming documents scored online
    * against a batch-built Bloom sketch of the eval suite's distinct word
    * 3-grams ([[graft.functions.BloomSketch.build]] over the held-out
    * slice — pass the serialized bytes here). Per doc: shingle count,
    * sketch hits, and a `flagged` bit at `pctMax`% overlap. STATELESS
    * like the quality gate, and fully CODEGEN'D: the sketch rides as a
    * binary literal probed by the built-in `might_contain` expression
    * inside an array-aggregate lambda (no Scala UDF anywhere), shingling
    * via the same codegen'd [[graft.functions.WordShingles]] the batch
    * query uses — so there is no watermark, no state store, and no
    * codegen boundary. One-sided error: false positives only, so an
    * online quarantine can over-hold, never leak a contaminated doc the
    * batch join would have caught. */
  def decontaminationProbe(
      docs: DataFrame, // columns: doc_id, text, ...
      evalSketch: Array[Byte], // BloomSketch.build output
      pctMax: Int = 10): DataFrame =
    docs
      .withColumn("__sh", graft.functions.WordShingles.shingles(col("text"), 3))
      .withColumn("n_shingles", size(col("__sh")).cast("long"))
      .withColumn("n_hits", aggregate(col("__sh"), lit(0L),
        (acc, s) => acc +
          when(graft.functions.BloomSketch.mightContain(evalSketch, s), 1L)
            .otherwise(0L)))
      .withColumn("flagged",
        (col("n_hits") * 100 >= lit(pctMax.toLong) *
          greatest(col("n_shingles"), lit(1L))).cast("long"))
      .drop("__sh")

  /** The ONLINE curation front door — [[qualityGate]], the near-dup
    * probe, and [[decontaminationProbe]] composed into ONE per-document
    * routing decision: the streaming mirror of the batch
    * CurationPipeline's screening stages (quality → near-dup →
    * decontamination) for documents arriving against a materialized
    * corpus.
    *
    * Near-dup stays row-preserving (exactly one output row per incoming
    * doc) with NO stream state: the corpus band index is pre-aggregated
    * to one row per `(band, bkey)` — `(n_docs, min_doc)` — and the doc's
    * four per-row band keys ([[graft.queries.MinHashLsh.withRowBandKeys]],
    * zero shuffle) each left-join that profile. A key collides with some
    * OTHER document iff `n_docs > 1` or its only holder isn't this doc —
    * so re-ingesting a doc already in the corpus does not self-flag,
    * matching the candidate join's `corpus_doc_id != doc_id` filter. (The
    * exploded candidate form, [[streamStaticNearDupProbe]], would need a
    * per-doc aggregation — stream STATE — to fold back to a verdict; it
    * remains the right op when the consumer wants the colliding ids for
    * exact verification.)
    *
    * Route precedence: `quarantine_quality` > `quarantine_neardup` >
    * `quarantine_contaminated` > `quarantine_classifier` > `keep`.
    * Rules first (cheapest, unambiguous); near-dup and contamination
    * verdicts outrank the classifier because they carry operational
    * urgency — leaked eval data must surface AS contamination even when
    * the classifier would also have dropped the doc. The classifier
    * stage reuses [[graft.queries.QualityClassifier]], so
    * `p_quality_classifier`'s oracle verifies this stage's arithmetic
    * too. Still stateless end to end — no
    * watermark, no state store; the only shuffles are the static side's
    * one-time aggregation. At 100 TB the per-key profile is bounded by
    * distinct band keys (≤ corpus docs × 4) and broadcasts or
    * bucket-joins exactly as the batch candidate join plans. */
  def onlineCurationGate(
      docs: DataFrame, // streaming; columns: doc_id, text, ...
      bandIndex: DataFrame, // static corpus band index: doc_id, band, bkey
      evalSketch: Array[Byte], // BloomSketch.build output
      contaminationPctMax: Int = 10): DataFrame = {
    val byKey = bandIndex.groupBy("band", "bkey")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
    val screened = graft.queries.QualityClassifier.withScore(
      decontaminationProbe(
        qualityGate(docs).drop("route"), evalSketch, contaminationPctMax))
    val keyed = graft.queries.MinHashLsh.withRowBandKeys(screened)
    val joined = (0 until 4).foldLeft(keyed) { (df, b) =>
      df.join(
        byKey.filter(col("band") === b)
          .select(col("bkey").as(s"bkey$b"),
            col("n_docs").as(s"__n$b"), col("min_doc").as(s"__min$b")),
        Seq(s"bkey$b"), "left")
    }
    val collides = (0 until 4).map { b =>
      col(s"__n$b") > 1 || (col(s"__n$b") === 1 && col(s"__min$b") =!= col("doc_id"))
    }.reduce(_ || _)
    joined
      .withColumn("neardup_flag", coalesce(collides, lit(false)).cast("long"))
      .withColumn("route",
        when(col("keep") === 0, "quarantine_quality")
          .when(col("neardup_flag") === 1, "quarantine_neardup")
          .when(col("flagged") === 1, "quarantine_contaminated")
          .when(col("cls_keep") === 0, "quarantine_classifier")
          .otherwise("keep"))
      .drop((0 until 4).flatMap(b =>
        Seq(s"bkey$b", s"__n$b", s"__min$b")): _*)
  }

}
