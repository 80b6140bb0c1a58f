package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Concrete NETWORK live-block connectors (reference pipeline.go:93–108 —
  * the gRPC blocks stream feeding the live injector).
  *
  * The reference consumes live blocks over a network stream; this rebuild's
  * sanctioned stand-in has so far been the tailed file archive
  * ([[BlockArchiveSource]]). These adapters close the gap with two
  * Spark-native connectors that plug into the SAME `Dataset[StreamedBlock]`
  * contract [[IngestionPipeline]] consumes — proving the pipeline is
  * source-agnostic, exactly like the reference's `bstream.Source`
  * abstraction:
  *
  *   - [[fromSocket]]: Spark's built-in `socket` source carrying
  *     line-delimited JSON blocks. The wire format is the JSON projection
  *     of [[StreamedBlock]] (binary values base64-coded, Spark's own JSON
  *     convention), so any producer that can emit JSON lines — a relay
  *     shim in front of the real gRPC stream, `netcat` in a test — is a
  *     live source. Parsing runs FAILFAST: a malformed frame kills the
  *     query instead of silently dropping a block, because a gap would
  *     otherwise surface later as a contiguity-guard failure far from the
  *     root cause.
  *   - [[syntheticRate]]: Spark's `rate` source driving a deterministic
  *     block generator — an always-on live source for soak/throughput
  *     testing (the role of the reference's `battlefield` generator).
  *
  * Scale note: a socket source is single-receiver by nature (as is the
  * reference's one gRPC subscription — ingestion order is serial by
  * design; it's the WRITE fan-out that must be distributed, and is:
  * IngestionPipeline keeps irreversible payloads on executors). For
  * multi-receiver deployments the same `parseJsonFrames` adapter applies
  * unchanged to any line-oriented distributed source (e.g. a Kafka topic's
  * `value` column), which is why parsing is factored out of the connector.
  */
object LiveBlockSource {

  /** Decode line-delimited JSON frames (one [[StreamedBlock]] per line)
    * from any streaming DataFrame with a string `value` column. */
  def parseJsonFrames(frames: Dataset[java.lang.String]): Dataset[StreamedBlock] = {
    implicit val enc = Encoders.product[StreamedBlock]
    frames
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), BlockArchiveSource.blockSchema,
        Map("mode" -> "FAILFAST")).as("b"))
      .select("b.*")
      .as[StreamedBlock]
  }

  /** Live blocks from a TCP endpoint emitting JSON lines. */
  def fromSocket(spark: SparkSession, host: String, port: Int): Dataset[StreamedBlock] = {
    implicit val strEnc = Encoders.STRING
    parseJsonFrames(
      spark.readStream
        .format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(col("value").cast("string").as("value"))
        .as[java.lang.String])
  }

  /** Producer-side framing: one [[StreamedBlock]] as its JSON wire frame.
    * Uses Spark's own encoder→JSON path so producer and [[parseJsonFrames]]
    * can never drift on field names or binary coding. */
  def toJsonFrames(blocks: Seq[StreamedBlock])(implicit spark: SparkSession): Seq[String] = {
    import spark.implicits._
    blocks.map(b => Seq(b).toDS().toJSON.head())
  }

  /** Deterministic synthetic live source: `blocksPerSecond` single-row
    * blocks from the `rate` source, chained by number (parent = num-1) so
    * the pipeline's contiguity guard accepts them. `startNum` aligns the
    * chain with an existing checkpoint. Every block is emitted as
    * irreversible here — fork/reorg behavior is ForkDB's job and is
    * exercised by its own specs; this source exists to soak the commit
    * path. */
  def syntheticRate(
      spark: SparkSession,
      blocksPerSecond: Int,
      collection: Int,
      startNum: Long = 1L): Dataset[StreamedBlock] = {
    implicit val enc = Encoders.product[StreamedBlock]
    import spark.implicits._
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", blocksPerSecond)
      .load()
      .select((col("value") + lit(startNum)).as("num"))
      .as[Long]
      .map { num =>
        StreamedBlock(
          id = f"sb$num%017d",
          parentId = if (num == 0L) "" else f"sb${num - 1}%017d",
          num = num,
          step = StreamedBlock.StepIrreversible,
          tabletRows = Seq(graft.model.TabletRowM(
            collection, "synthetic", num, f"pk${num % 64}%03d",
            java.lang.Long.toHexString(num).getBytes("UTF-8"),
            isDeletion = false)),
          singletEntries = Seq.empty)
      }
  }
}
