package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Catch-up ∪ live JOINING source — the reference consumes blocks through a
  * joining source that replays the file archive from its cursor and hands
  * over to the live stream once it reaches the seam (pipeline.go:37–108:
  * the archive file source and the live gRPC source feed one ordered
  * handler). This is that behavior re-expressed on Structured Streaming
  * primitives:
  *
  *   - CATCH-UP is [[BlockArchiveSource.readStream]] — the file source's
  *     checkpointed offset IS the cursor, so a restarted query resumes the
  *     replay exactly where it left off with no custom cursor plumbing;
  *   - LIVE is any [[StreamedBlock]] stream ([[LiveBlockSource.fromSocket]],
  *     a Kafka topic through [[LiveBlockSource.parseJsonFrames]], …);
  *   - the JOIN is a streaming union. No custom seam logic: blocks the two
  *     sources BOTH deliver collapse in the commit path's full-row
  *     per-batch dedup (byte-identical redelivery is idempotent), blocks
  *     only one side delivers commit normally, and heights already behind
  *     the store checkpoint — the archive's tail re-serving what live
  *     already committed — are dropped by the linearity guard. Disagreeing
  *     payloads for one height are corruption, not overlap, and still fail
  *     the contiguity guard loudly. "Byte-identical" includes the ORDER of
  *     a block's `tabletRows`/`singletEntries` sequences: the two sides
  *     must serialize a block identically (true of any relay forwarding
  *     one upstream), because a semantically-equal reordering is
  *     indistinguishable from a payload conflict and is treated as one —
  *     deliberately, since canonicalizing inside the dedup would also
  *     mask real divergence.
  *
  * The union itself imposes no ordering; ordering and gap detection remain
  * where they always were — `commitBatch` sorts the batch and requires
  * contiguous irreversible heights — so a live stream that outruns an
  * unfinished catch-up fails loudly instead of committing around the gap
  * (same posture as every other ingest fault). Operationally: start the
  * joined query, let the archive drain to the seam, and the live side
  * takes over; at-least-once delivery on either side is safe throughout.
  */
object JoiningSource {

  /** Union a catch-up stream with a live stream into the single ordered
    * block stream [[IngestionPipeline.start]] consumes. */
  def joined(
      catchUp: Dataset[StreamedBlock],
      live: Dataset[StreamedBlock]): Dataset[StreamedBlock] =
    catchUp.unionByName(live)

  /** [[joined]] with the archive-directory catch-up side prebuilt. */
  def fromArchiveWithLive(
      spark: SparkSession,
      archiveDir: String,
      live: Dataset[StreamedBlock],
      maxFilesPerTrigger: Option[Int] = None): Dataset[StreamedBlock] =
    joined(BlockArchiveSource.readStream(spark, archiveDir, maxFilesPerTrigger), live)
}
