package graft.model

/** Reference VALUE codec — proto3 wire-format packing of the two payloads
  * the reference marshals as protobuf (keys are [[KeyCodec]]'s job):
  *
  *   Checkpoint    (read.go:417–476, write.go:362–365):
  *                   uint64 height = 1;
  *                   BlockRef block = 2;   // { uint64 num = 1; string id = 2; }
  *   TabletIndex   (tablet.go:387–401, indexing.go:620–645):
  *                   uint64 squelched_count = 1;
  *                   repeated TabletIndexEntry entries = 2;
  *                   // entry: { bytes primary_key = 1; uint64 height = 2; }
  *
  * The Spark engine stores these as plain columns — this codec is a pure
  * COMPATIBILITY surface, the KeyCodec treatment applied to values: a
  * deployment migrating off the reference decodes its existing checkpoint
  * and index-singlet cells into columns (and re-encodes for a live
  * deployment still reading the KV form). The wire machinery is the
  * standard proto3 subset these two messages use — varint and
  * length-delimited fields — hand-rolled because the build is
  * dependency-free by design.
  *
  * Encode semantics match the Go protobuf marshaller the reference uses:
  * fields emit in field-number order, default values (0, empty bytes)
  * are omitted, and a present-but-empty sub-message still emits its tag
  * with length 0. One deliberate divergence: the reference iterates a Go
  * map when marshalling index entries, so ITS byte output is
  * run-nondeterministic; this encoder sorts entries by primary key — a
  * valid proto3 encoding of the same message that is additionally
  * deterministic (the reference's own decoder accepts any order, as does
  * ours). Decode accepts fields in any order and skips unknown fields,
  * per proto3 rules — proven against the reference's own golden
  * checkpoint hex vector (utils_test.go:48–60) in `PayloadCodecSpec`.
  */
object PayloadCodec {

  /** Decoded `pbfluxdb.Checkpoint` (+ its `pbbstream.BlockRef`). */
  final case class CheckpointPayload(height: Long, blockNum: Long, blockId: String)

  /** Decoded `pbfluxdb.TabletIndex`; entries as (primaryKey, height). */
  final case class TabletIndexPayload(
      squelchedCount: Long, entries: Seq[(Array[Byte], Long)])

  // ------------------------------------------------------ wire primitives

  private final class Writer {
    private val buf = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { buf.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
    }
    def tag(field: Int, wireType: Int): Unit = varint((field.toLong << 3) | wireType)
    def bytes(b: Array[Byte]): Unit = { varint(b.length.toLong); buf.write(b) }
    def toBytes: Array[Byte] = buf.toByteArray
  }

  private final class Reader(data: Array[Byte]) {
    private var pos = 0
    def hasRemaining: Boolean = pos < data.length
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        require(pos < data.length, "truncated varint")
        val b = data(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "varint too long")
      }
      v // unreachable
    }
    def bytes(): Array[Byte] = {
      val n = varint()
      require(n >= 0 && pos + n <= data.length, s"truncated length-delimited field ($n bytes)")
      val out = java.util.Arrays.copyOfRange(data, pos, pos + n.toInt)
      pos += n.toInt
      out
    }
    /** Skip one field of the given wire type (unknown-field tolerance). */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 2 => bytes(); ()
      case 5 =>
        require(pos + 4 <= data.length, "truncated fixed32 field")
        pos += 4
      case 1 =>
        require(pos + 8 <= data.length, "truncated fixed64 field")
        pos += 8
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ----------------------------------------------------------- checkpoint

  /** `proto.Marshal(&pbfluxdb.Checkpoint{...})` — write.go:362–365. The
    * block sub-message is always present in the reference's writes (the
    * pointer is always non-nil), so field 2 emits even when empty. */
  def encodeCheckpoint(p: CheckpointPayload): Array[Byte] = {
    val block = new Writer
    if (p.blockNum != 0) { block.tag(1, 0); block.varint(p.blockNum) }
    if (p.blockId.nonEmpty) { block.tag(2, 2); block.bytes(p.blockId.getBytes("UTF-8")) }
    val w = new Writer
    if (p.height != 0) { w.tag(1, 0); w.varint(p.height) }
    w.tag(2, 2); w.bytes(block.toBytes)
    w.toBytes
  }

  /** `unmarshalCheckpoint` — read.go:468–476. */
  def decodeCheckpoint(data: Array[Byte]): CheckpointPayload = {
    var height = 0L; var num = 0L; var id = ""
    val r = new Reader(data)
    while (r.hasRemaining) {
      val key = r.varint()
      (key >>> 3, (key & 7).toInt) match {
        case (1, 0) => height = r.varint()
        case (2, 2) =>
          val br = new Reader(r.bytes())
          while (br.hasRemaining) {
            val k = br.varint()
            (k >>> 3, (k & 7).toInt) match {
              case (1, 0) => num = br.varint()
              case (2, 2) => id = new String(br.bytes(), "UTF-8")
              case (_, w) => br.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    CheckpointPayload(height, num, id)
  }

  // --------------------------------------------------------- tablet index

  /** `TabletIndex.MarshalValue` — tablet.go:387–401 (entries sorted by
    * primary key for determinism; see the class note). */
  def encodeTabletIndex(p: TabletIndexPayload): Array[Byte] = {
    val w = new Writer
    if (p.squelchedCount != 0) { w.tag(1, 0); w.varint(p.squelchedCount) }
    p.entries.sortBy(e => e._1.toSeq.map(b => b & 0xFF).toIndexedSeq)(
        scala.math.Ordering.Implicits.seqOrdering)
      .foreach { case (pk, height) =>
        val e = new Writer
        if (pk.nonEmpty) { e.tag(1, 2); e.bytes(pk) }
        if (height != 0) { e.tag(2, 0); e.varint(height) }
        w.tag(2, 2); w.bytes(e.toBytes)
      }
    w.toBytes
  }

  /** `indexSinglet.Entry`'s unmarshal — indexing.go:620–645. */
  def decodeTabletIndex(data: Array[Byte]): TabletIndexPayload = {
    var squelched = 0L
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
    val r = new Reader(data)
    while (r.hasRemaining) {
      val key = r.varint()
      (key >>> 3, (key & 7).toInt) match {
        case (1, 0) => squelched = r.varint()
        case (2, 2) =>
          val er = new Reader(r.bytes())
          var pk = Array.emptyByteArray; var h = 0L
          while (er.hasRemaining) {
            val k = er.varint()
            (k >>> 3, (k & 7).toInt) match {
              case (1, 2) => pk = er.bytes()
              case (2, 0) => h = er.varint()
              case (_, w) => er.skip(w)
            }
          }
          entries += ((pk, h))
        case (_, w) => r.skip(w)
      }
    }
    TabletIndexPayload(squelched, entries.toSeq)
  }

  // -------------------------------------------------------- write request

  /** One KV cell of a marshalled write request: `pbfluxdb.WriteEntry
    * { bytes key = 1; bytes value = 2; }` — key packed by [[KeyCodec]],
    * value the embedder's opaque payload (empty ⇔ deletion). */
  final case class WriteEntryPayload(key: Array[Byte], value: Array[Byte])

  /** Decoded `pbfluxdb.WriteRequest` — the sharder's segment-file record
    * (sharder.go:61–283) and the gRPC ingestion unit (types.go:52–108):
    * `repeated WriteEntry singlet_entries = 1; repeated WriteEntry
    * tablet_rows = 2; uint64 height = 3; BlockRef block = 4` (field
    * numbers follow the message's declared field order, the same
    * derivation confirmed byte-exact for Checkpoint by the reference's
    * golden vector; decode tolerates any on-wire order regardless). */
  final case class WriteRequestPayload(
      singletEntries: Seq[WriteEntryPayload],
      tabletRows: Seq[WriteEntryPayload],
      height: Long, blockNum: Long, blockId: String)

  def encodeWriteRequest(p: WriteRequestPayload): Array[Byte] = {
    val w = new Writer
    def entry(field: Int, e: WriteEntryPayload): Unit = {
      val ew = new Writer
      if (e.key.nonEmpty) { ew.tag(1, 2); ew.bytes(e.key) }
      if (e.value.nonEmpty) { ew.tag(2, 2); ew.bytes(e.value) }
      w.tag(field, 2); w.bytes(ew.toBytes)
    }
    p.singletEntries.foreach(entry(1, _))
    p.tabletRows.foreach(entry(2, _))
    if (p.height != 0) { w.tag(3, 0); w.varint(p.height) }
    val block = new Writer
    if (p.blockNum != 0) { block.tag(1, 0); block.varint(p.blockNum) }
    if (p.blockId.nonEmpty) { block.tag(2, 2); block.bytes(p.blockId.getBytes("UTF-8")) }
    w.tag(4, 2); w.bytes(block.toBytes)
    w.toBytes
  }

  def decodeWriteRequest(data: Array[Byte]): WriteRequestPayload = {
    val singlets = scala.collection.mutable.ArrayBuffer.empty[WriteEntryPayload]
    val tablets = scala.collection.mutable.ArrayBuffer.empty[WriteEntryPayload]
    var height = 0L; var num = 0L; var id = ""
    def entry(b: Array[Byte]): WriteEntryPayload = {
      val er = new Reader(b)
      var k = Array.emptyByteArray; var v = Array.emptyByteArray
      while (er.hasRemaining) {
        val key = er.varint()
        (key >>> 3, (key & 7).toInt) match {
          case (1, 2) => k = er.bytes()
          case (2, 2) => v = er.bytes()
          case (_, w) => er.skip(w)
        }
      }
      WriteEntryPayload(k, v)
    }
    val r = new Reader(data)
    while (r.hasRemaining) {
      val key = r.varint()
      (key >>> 3, (key & 7).toInt) match {
        case (1, 2) => singlets += entry(r.bytes())
        case (2, 2) => tablets += entry(r.bytes())
        case (3, 0) => height = r.varint()
        case (4, 2) =>
          val br = new Reader(r.bytes())
          while (br.hasRemaining) {
            val k = br.varint()
            (k >>> 3, (k & 7).toInt) match {
              case (1, 0) => num = br.varint()
              case (2, 2) => id = new String(br.bytes(), "UTF-8")
              case (_, w) => br.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    WriteRequestPayload(singlets.toSeq, tablets.toSeq, height, num, id)
  }

  /** A model [[WriteRequest]] as its wire form — `ToProto` + `Marshal`
    * (types.go:84–108): keys packed by [[KeyCodec]] (identifiers UTF-8,
    * the test-collection convention), values the rows' opaque payloads,
    * deletions as empty values. The inverse needs the embedder's
    * collection registry to size identifiers (key parsing is
    * registry-driven in the reference too), so decoding returns raw
    * [[WriteEntryPayload]]s for the caller's [[KeyCodec]] parse —
    * `PayloadCodecSpec` demonstrates the full round trip. */
  def writeRequestToWire(r: WriteRequest): Array[Byte] =
    encodeWriteRequest(writeRequestPayloadOf(r))

  /** The wire-shaped payload of a model [[WriteRequest]] (see
    * [[writeRequestToWire]]). */
  def writeRequestPayloadOf(r: WriteRequest): WriteRequestPayload =
    WriteRequestPayload(
      r.singletEntries.map { e =>
        WriteEntryPayload(
          KeyCodec.keyForSingletEntry(
            e.collection, e.singletId.getBytes("UTF-8"), e.height),
          if (e.isDeletion) Array.emptyByteArray else e.value)
      },
      r.tabletRows.map { row =>
        WriteEntryPayload(
          KeyCodec.keyForTabletRow(
            row.collection, row.tabletId.getBytes("UTF-8"),
            row.height, row.primaryKey.getBytes("UTF-8")),
          if (row.isDeletion) Array.emptyByteArray else row.value)
      },
      r.height, r.block.num, r.block.id)

  // ------------------------------------------------------- streamed block

  /** One live-wire block frame: the reference's gRPC stream delivers
    * blocks with fork-step annotations that the handler turns into
    * `WriteRequest`s (pipeline.go:93–137). This message is that unit on
    * the wire — block linkage + step + the write payload in the same
    * `WriteRequest` wire form the sharder's segment files use:
    *
    *   string id = 1; string parent_id = 2; uint64 num = 3;
    *   string step = 4; WriteRequest write = 5;
    */
  final case class StreamedBlockPayload(
      id: String, parentId: String, num: Long, step: String,
      write: WriteRequestPayload)

  def encodeStreamedBlock(p: StreamedBlockPayload): Array[Byte] = {
    val w = new Writer
    if (p.id.nonEmpty) { w.tag(1, 2); w.bytes(p.id.getBytes("UTF-8")) }
    if (p.parentId.nonEmpty) { w.tag(2, 2); w.bytes(p.parentId.getBytes("UTF-8")) }
    if (p.num != 0) { w.tag(3, 0); w.varint(p.num) }
    if (p.step.nonEmpty) { w.tag(4, 2); w.bytes(p.step.getBytes("UTF-8")) }
    w.tag(5, 2); w.bytes(encodeWriteRequest(p.write))
    w.toBytes
  }

  def decodeStreamedBlock(data: Array[Byte]): StreamedBlockPayload = {
    var id = ""; var parentId = ""; var num = 0L; var step = ""
    var write = WriteRequestPayload(Nil, Nil, 0L, 0L, "")
    var sawWrite = false
    val r = new Reader(data)
    while (r.hasRemaining) {
      val key = r.varint()
      (key >>> 3, (key & 7).toInt) match {
        case (1, 2) => id = new String(r.bytes(), "UTF-8")
        case (2, 2) => parentId = new String(r.bytes(), "UTF-8")
        case (3, 0) => num = r.varint()
        case (4, 2) => step = new String(r.bytes(), "UTF-8")
        case (5, 2) => write = decodeWriteRequest(r.bytes()); sawWrite = true
        case (_, w) => r.skip(w)
      }
    }
    // The encoder always emits field 5 (even empty), so its absence means
    // the bytes are NOT this message — e.g. a different block schema whose
    // fields all land in the unknown-field skip above and would otherwise
    // decode silently into a default block (num=0, empty write) that only
    // fails much later at the contiguity guard.
    require(sawWrite,
      "StreamedBlock payload has no write field (5) — not this wire schema")
    StreamedBlockPayload(id, parentId, num, step, write)
  }

  // ------------------------------------------------- distributed decoding

  /** Explode a binary column of reference index-singlet cells into
    * columnar rows `(squelched_count, primary_key, height)` — the
    * migration path for a corpus of stored `TabletIndex` values (one
    * cell per tablet per index height; a large deployment holds millions,
    * so the decode runs where the data is, not on the driver). Entry-less
    * cells yield one row with a null primary key, preserving the
    * squelch count. */
  def explodeTabletIndexCells(
      df: org.apache.spark.sql.DataFrame, valueCol: String)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Column ORDER matters: the tuple decode below binds by ordinal, so a
    // (value, tablet_key)-ordered frame must be rejected, not decoded
    // against the wrong column.
    require(df.columns.toSeq == Seq(valueCol) ||
        df.columns.toSeq == Seq("tablet_key", valueCol),
      s"pass (tablet_key, $valueCol) or just ($valueCol) in that order, " +
        s"got (${df.columns.mkString(", ")})")
    if (df.columns.length == 1)
      df.as[Array[Byte]].flatMap { v =>
        val p = decodeTabletIndex(v)
        if (p.entries.isEmpty) Seq((p.squelchedCount, null: Array[Byte], 0L))
        else p.entries.map(e => (p.squelchedCount, e._1, e._2))
      }.toDF("squelched_count", "primary_key", "height")
    else
      df.as[(Array[Byte], Array[Byte])].flatMap { case (tk, v) =>
        val p = decodeTabletIndex(v)
        if (p.entries.isEmpty) Seq((tk, p.squelchedCount, null: Array[Byte], 0L))
        else p.entries.map(e => (tk, p.squelchedCount, e._1, e._2))
      }.toDF("tablet_key", "squelched_count", "primary_key", "height")
  }
}
