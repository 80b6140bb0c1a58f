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

  // --------------------------------------------------- proto wire framing

  /** gRPC-style message framing (the reference's live wire is a gRPC
    * protobuf block stream, pipeline.go:93–100): each frame is
    *
    *   1 byte  compressed-flag (0 — the only mode supported)
    *   4 bytes big-endian payload length
    *   N bytes proto3 `StreamedBlock` message ([[graft.model.PayloadCodec]]
    *           wire form, entry keys packed by [[graft.model.KeyCodec]])
    *
    * — the exact shape of a gRPC HTTP/2 data-frame message, so a relay
    * shim in front of the reference's stream forwards payload bytes
    * untouched. [[toProtoFrames]] concatenates frames; [[decodeProtoFrames]]
    * walks a chunk of WHOLE frames and FAILS on a torn frame (a silent
    * drop would surface later as a contiguity-guard failure far from the
    * root cause — same policy as the JSON FAILFAST parse). */
  def toProtoFrames(blocks: Seq[StreamedBlock]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    blocks.foreach { b =>
      val msg = graft.model.PayloadCodec.encodeStreamedBlock(toProtoPayload(b))
      out.write(0)
      out.write((msg.length >>> 24) & 0xFF); out.write((msg.length >>> 16) & 0xFF)
      out.write((msg.length >>> 8) & 0xFF); out.write(msg.length & 0xFF)
      out.write(msg, 0, msg.length)
    }
    out.toByteArray
  }

  private def toProtoPayload(b: StreamedBlock): graft.model.PayloadCodec.StreamedBlockPayload =
    graft.model.PayloadCodec.StreamedBlockPayload(
      b.id, b.parentId, b.num, b.step,
      graft.model.PayloadCodec.writeRequestPayloadOf(
        graft.model.WriteRequest(b.num, graft.model.BlockRef(b.id, b.num),
          b.tabletRows, b.singletEntries)))

  /** Decode one chunk of concatenated whole frames. `identifierLen` is the
    * embedder's registry knowledge — collection id → fixed identifier byte
    * width — exactly what the reference's key-parsing factories carry
    * (tablet.go:37–58). Deletion ⇔ empty value, the reference's own
    * convention (tablet.go:325–327). */
  def decodeProtoFrames(
      chunk: Array[Byte], identifierLen: Map[Int, Int]): Seq[StreamedBlock] = {
    import graft.model.{KeyCodec, PayloadCodec, SingletEntryM, TabletRowM}
    val out = Seq.newBuilder[StreamedBlock]
    var pos = 0
    while (pos < chunk.length) {
      require(pos + 5 <= chunk.length,
        s"torn frame header at byte $pos of ${chunk.length}")
      require(chunk(pos) == 0,
        s"unsupported compressed frame (flag ${chunk(pos)}) at byte $pos")
      val len = ((chunk(pos + 1) & 0xFF) << 24) | ((chunk(pos + 2) & 0xFF) << 16) |
        ((chunk(pos + 3) & 0xFF) << 8) | (chunk(pos + 4) & 0xFF)
      require(len >= 0 && pos + 5 + len <= chunk.length,
        s"torn frame at byte $pos: declared $len payload bytes, " +
          s"only ${chunk.length - pos - 5} available")
      val p = PayloadCodec.decodeStreamedBlock(
        java.util.Arrays.copyOfRange(chunk, pos + 5, pos + 5 + len))
      def idLen(collection: Int): Int =
        identifierLen.getOrElse(collection,
          throw new IllegalArgumentException(
            f"no registered identifier width for collection 0x$collection%04X"))
      val rows = p.write.tabletRows.map { e =>
        val (coll, id, h, pk) =
          KeyCodec.parseTabletRowKey(e.key, idLen(KeyCodec.collectionOf(e.key)))
        TabletRowM(coll, new String(id, "UTF-8"), h, new String(pk, "UTF-8"),
          e.value, e.value.isEmpty)
      }
      val entries = p.write.singletEntries.map { e =>
        val (coll, id, h) =
          KeyCodec.parseSingletEntryKey(e.key, idLen(KeyCodec.collectionOf(e.key)))
        SingletEntryM(coll, new String(id, "UTF-8"), h, e.value, e.value.isEmpty)
      }
      out += StreamedBlock(p.id, p.parentId, p.num, p.step, rows, entries)
      pos += 5 + len
    }
    out.result()
  }

  /** Decode proto-framed chunks from any streaming DataFrame with a binary
    * column — each row must carry whole frames (gRPC delivers messages
    * whole; a torn frame fails the query). */
  def parseProtoFrames(
      chunks: Dataset[Array[Byte]],
      identifierLen: Map[Int, Int]): Dataset[StreamedBlock] = {
    implicit val enc = Encoders.product[StreamedBlock]
    chunks.flatMap(decodeProtoFrames(_, identifierLen))
  }

  /** Live blocks from a drop directory of binary frame files (the
    * file-transport twin of [[fromSocket]] for the proto wire; the same
    * [[parseProtoFrames]] applies unchanged to e.g. a Kafka `value`
    * column). */
  def fromBinaryFiles(
      spark: SparkSession, dir: String,
      identifierLen: Map[Int, Int]): Dataset[StreamedBlock] = {
    implicit val binEnc = Encoders.BINARY
    parseProtoFrames(
      spark.readStream.format("binaryFile")
        // Streaming sources require the schema up front; binaryFile's is
        // fixed by the format.
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .load(dir)
        .select(col("content")).as[Array[Byte]],
      identifierLen)
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
