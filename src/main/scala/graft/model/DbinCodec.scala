package graft.model

import java.io.{EOFException, InputStream, OutputStream}

/** The dbin FILE CONTAINER the reference's shard segments ship in
  * (sharder.go:80–103 writes one `.dbin.zst` per shard; shardinject.go:
  * 133–160 `ReadShard` reads it back) — [[PayloadCodec]] speaks the
  * per-record `WriteRequest` proto wire; this codec speaks the framing
  * AROUND those records, so a deployment migrating off the reference can
  * replay its existing segment files end to end.
  *
  * Format (streamingfast/dbin, the public container both sides use):
  *
  *   - magic `'d' 'b' 'i' 'n'` (4 bytes);
  *   - 1 byte file-format version:
  *       - `0x01` (current, what the writer emits): 1 length byte +
  *         content-type bytes;
  *       - `0x00` (legacy, still READ): 3 content-type bytes + 2 ASCII
  *         digits of content version;
  *   - then each message as a 4-byte BIG-ENDIAN length + payload, to EOF.
  *
  * Shard segments use content type `"fwr"` at file version 1
  * (sharder.go:34–35), each message a marshalled `pbfluxdb.WriteRequest`
  * (sharder.go:161–174). The `.zst` half of the name is dstore's
  * transparent whole-file zstd wrap — [[readShardSegment]] sniffs the
  * zstd magic and inflates as a stream, so both `.dbin` and `.dbin.zst`
  * read through one entry point; [[writeShardSegment]] mirrors it.
  *
  * Torn/corrupt input FAILS LOUDLY (bad magic, unsupported version,
  * short frame): a shard injection that silently dropped a tail frame
  * would surface later as a checkpoint-contiguity failure far from the
  * root cause — the same policy as the live wire's frame decoder
  * ([[graft.streaming.LiveBlockSource]]).
  */
object DbinCodec {

  private val Magic = Array[Byte]('d', 'b', 'i', 'n')
  /** Shard segment content type + required file version (sharder.go:34–35). */
  val ShardContentType = "fwr"
  val ShardFileVersion = 1

  final case class Header(contentType: String, version: Int)

  // ------------------------------------------------------------------
  // Container framing
  // ------------------------------------------------------------------

  def writeHeader(out: OutputStream, contentType: String): Unit = {
    val ct = contentType.getBytes("UTF-8")
    require(ct.nonEmpty && ct.length <= 255,
      s"content type must be 1..255 bytes, got ${ct.length}")
    out.write(Magic)
    out.write(ShardFileVersion)
    out.write(ct.length)
    out.write(ct)
  }

  def writeMessage(out: OutputStream, msg: Array[Byte]): Unit = {
    out.write((msg.length >>> 24) & 0xFF); out.write((msg.length >>> 16) & 0xFF)
    out.write((msg.length >>> 8) & 0xFF); out.write(msg.length & 0xFF)
    out.write(msg)
  }

  private def readFully(in: InputStream, n: Int, what: String): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(
        s"torn dbin $what: needed $n bytes, got $off")
      off += r
    }
    buf
  }

  def readHeader(in: InputStream): Header = {
    val magic = readFully(in, 4, "magic")
    require(java.util.Arrays.equals(magic, Magic),
      "not a dbin file: bad magic " +
        magic.map(b => f"0x${b & 0xFF}%02X").mkString(" "))
    val version = in.read()
    version match {
      case 1 =>
        val len = in.read()
        if (len < 0) throw new EOFException("torn dbin header: no content-type length")
        Header(new String(readFully(in, len, "content type"), "UTF-8"), 1)
      case 0 => // legacy: 3-byte type + 2 ASCII digits of content version
        val ct = new String(readFully(in, 3, "content type"), "UTF-8")
        readFully(in, 2, "content version")
        Header(ct, 0)
      case v => throw new IllegalArgumentException(
        s"unsupported dbin file version $v (supported: 0, 1)")
    }
  }

  /** Per-message ceiling. The length prefix is UNTRUSTED input: a torn
    * or corrupt segment whose 4 bytes happen to decode huge (up to
    * 0x7FFFFFFF) must fail as the corruption it is, not as a ~2 GB
    * allocation attempt (driver OOM — the loud-failure policy above, but
    * failing in the wrong subsystem). 256 MiB is ~50× the largest block
    * payloads the reference's segments carry; genuinely larger messages
    * are corruption by this codec's contract. */
  val MaxMessageBytes: Int = 256 << 20

  /** Next length-prefixed message; `None` at a CLEAN end-of-stream (EOF
    * exactly on a frame boundary); a partial header, short payload, or
    * implausible length throws. The payload is read in bounded chunks so
    * a truncated file with a large (but in-cap) claimed length fails at
    * the torn byte having allocated only what actually arrived. */
  def readMessage(in: InputStream): Option[Array[Byte]] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val rest = readFully(in, 3, "message length")
    val len = (b0 << 24) | ((rest(0) & 0xFF) << 16) |
      ((rest(1) & 0xFF) << 8) | (rest(2) & 0xFF)
    require(len >= 0, s"negative dbin message length $len")
    require(len <= MaxMessageBytes,
      s"dbin message length $len exceeds the $MaxMessageBytes-byte cap — " +
        "corrupt or truncated segment (length prefix is garbage)")
    val ChunkBytes = 4 << 20
    if (len <= ChunkBytes) Some(readFully(in, len, s"message ($len bytes)"))
    else {
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var remaining = len
      while (remaining > 0) {
        val n = math.min(remaining, ChunkBytes)
        chunks += readFully(in, n, s"message ($len bytes)")
        remaining -= n
      }
      val all = new Array[Byte](len)
      var off = 0
      chunks.foreach { c => System.arraycopy(c, 0, all, off, c.length); off += c.length }
      Some(all)
    }
  }

  // ------------------------------------------------------------------
  // Shard segments ("fwr")
  // ------------------------------------------------------------------

  /** Write a shard segment: dbin header (`fwr`, v1) + one marshalled
    * `WriteRequest` per message, zstd-wrapped when `compress` (the
    * `.dbin.zst` form the reference's sharder actually ships). */
  def writeShardSegment(
      out: OutputStream,
      requests: Seq[PayloadCodec.WriteRequestPayload],
      compress: Boolean = true): Unit = {
    // Close-shield: finalizing the zstd frame requires closing the
    // ZstdOutputStream, but the CALLER owns `out` in both modes —
    // without the shield the compressed path would close the caller's
    // stream while the plain path leaves it open (opposite ownership
    // from one API).
    val shield = new java.io.FilterOutputStream(out) {
      override def close(): Unit = flush()
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
    }
    val sink: OutputStream =
      if (compress) new com.github.luben.zstd.ZstdOutputStream(shield, 3) else out
    try {
      writeHeader(sink, ShardContentType)
      requests.foreach(r => writeMessage(sink, PayloadCodec.encodeWriteRequest(r)))
    } finally if (compress) sink.close() else out.flush()
  }

  /** Read a shard segment (`ReadShard` parity, shardinject.go:133–160):
    * sniff-and-inflate zstd, check content type + version, decode every
    * message, skip heights at or below `startAfter`. */
  def readShardSegment(
      raw: InputStream,
      startAfter: Option[Long] = None): Seq[PayloadCodec.WriteRequestPayload] = {
    val in = maybeZstd(raw)
    val header = readHeader(in)
    require(
      header.contentType == ShardContentType && header.version == ShardFileVersion,
      s"segment with content type '${header.contentType}' at file version " +
        s"${header.version} is unsupported, supporting '$ShardContentType' " +
        s"at version $ShardFileVersion")
    val out = Seq.newBuilder[PayloadCodec.WriteRequestPayload]
    var msg = readMessage(in)
    while (msg.isDefined) {
      val req = PayloadCodec.decodeWriteRequest(msg.get)
      if (!startAfter.exists(req.height <= _)) out += req
      msg = readMessage(in)
    }
    out.result()
  }

  /** Wrap `raw` in a zstd inflater iff it leads with the zstd magic
    * (0x28 B5 2F FD) — how one entry point serves both `.dbin` and
    * `.dbin.zst` without trusting the file name. */
  private def maybeZstd(raw: InputStream): InputStream = {
    val in = if (raw.markSupported()) raw else new java.io.BufferedInputStream(raw)
    in.mark(4)
    // Loop the sniff read: a single read() may legally return 1–3 bytes
    // (network/chunked streams), which would misclassify a valid
    // compressed segment as plain and fail it on "bad magic".
    val m = new Array[Byte](4)
    var n = 0
    var r = 0
    while (n < 4 && r >= 0) {
      r = in.read(m, n, 4 - n)
      if (r > 0) n += r
    }
    in.reset()
    if (n == 4 && (m(0) & 0xFF) == 0x28 && (m(1) & 0xFF) == 0xB5 &&
        (m(2) & 0xFF) == 0x2F && (m(3) & 0xFF) == 0xFD)
      new com.github.luben.zstd.ZstdInputStream(in)
    else in
  }

  // ------------------------------------------------------------------
  // Wire payloads -> model rows
  // ------------------------------------------------------------------

  /** A decoded segment record as a model [[WriteRequest]]. `identifierLen`
    * is the embedder's registry knowledge — collection id → fixed
    * identifier byte width — exactly what the reference's key-parsing
    * factories carry (tablet.go:37–58); deletion ⇔ empty value
    * (tablet.go:325–327). Same conversion the live proto wire uses. */
  def toModel(
      p: PayloadCodec.WriteRequestPayload,
      identifierLen: Map[Int, Int]): WriteRequest = {
    def idLen(collection: Int): Int =
      identifierLen.getOrElse(collection,
        throw new IllegalArgumentException(
          f"no registered identifier width for collection 0x$collection%04X"))
    val rows = p.tabletRows.map { e =>
      val (coll, id, h, pk) =
        KeyCodec.parseTabletRowKey(e.key, idLen(KeyCodec.collectionOf(e.key)))
      TabletRowM(coll, new String(id, "UTF-8"), h, new String(pk, "UTF-8"),
        e.value, e.value.isEmpty)
    }
    val entries = p.singletEntries.map { e =>
      val (coll, id, h) =
        KeyCodec.parseSingletEntryKey(e.key, idLen(KeyCodec.collectionOf(e.key)))
      SingletEntryM(coll, new String(id, "UTF-8"), h, e.value, e.value.isEmpty)
    }
    WriteRequest(p.height, BlockRef(p.blockId, p.blockNum), rows, entries)
  }
}
