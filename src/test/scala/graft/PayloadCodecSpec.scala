package graft

import graft.model.PayloadCodec
import graft.model.PayloadCodec.{CheckpointPayload, TabletIndexPayload}

/** Byte-parity of the proto3 value codec against the reference's own
  * golden checkpoint vector (utils_test.go:48–60) and the proto3 wire
  * rules for the TabletIndex layout (tablet.go:387–401). */
class PayloadCodecSpec extends SparkTestBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  // The reference's own golden checkpoint cell (utils_test.go:49).
  private val GoldenCheckpointHex =
    "08c1c3f21a124708c1c3f21a124030333563613163316564376562303335346362643131" +
      "3030333664336566366636303838306232656435626438336665626264316161366632" +
      "39616332346564"

  test("checkpoint decode matches the reference's golden hex vector " +
    "(utils_test.go:49), and re-encode reproduces the exact bytes") {
    val got = PayloadCodec.decodeCheckpoint(hex(GoldenCheckpointHex))
    assert(got.height === 56402369L)
    assert(got.blockNum === 56402369L)
    assert(got.blockId ===
      "035ca1c1ed7eb0354cbd110036d3ef6f60880b2ed5bd83febbd1aa6f29ac24ed")
    assert(toHex(PayloadCodec.encodeCheckpoint(got)) === GoldenCheckpointHex)
  }

  test("checkpoint empty/default handling matches Go proto semantics: " +
    "zero height omitted, block sub-message always present") {
    val empty = CheckpointPayload(0L, 0L, "")
    // Checkpoint{Height: 0, Block: &BlockRef{}} marshals to just `12 00`.
    assert(toHex(PayloadCodec.encodeCheckpoint(empty)) === "1200")
    assert(PayloadCodec.decodeCheckpoint(hex("1200")) === empty)
    // Large heights exercise multi-byte varints (uint64 range).
    val big = CheckpointPayload(Long.MaxValue, 12L, "abc")
    assert(PayloadCodec.decodeCheckpoint(PayloadCodec.encodeCheckpoint(big)) === big)
  }

  test("tablet index encodes the reference layout byte-exactly " +
    "(squelched_count=1 varint, entries=2 repeated{primary_key=1 bytes, " +
    "height=2 varint}), sorted by primary key for determinism") {
    // indexing_test.go multi_rows: squelched 2, 16-byte ASCII primary keys.
    val pk2 = "0000000000000002".getBytes("UTF-8")
    val pk3 = "0000000000000003".getBytes("UTF-8")
    // Deliberately pass entries unsorted: the encoder must order by key.
    val p = TabletIndexPayload(2L, Seq((pk3, 5L), (pk2, 4L)))
    val expected =
      "0802" + // squelched_count = 2
        "1214" + "0a10" + toHex(pk2) + "1004" + // entry{pk2, height 4}
        "1214" + "0a10" + toHex(pk3) + "1005"   // entry{pk3, height 5}
    assert(toHex(PayloadCodec.encodeTabletIndex(p)) === expected)
    val back = PayloadCodec.decodeTabletIndex(hex(expected))
    assert(back.squelchedCount === 2L)
    assert(back.entries.map(e => (new String(e._1, "UTF-8"), e._2)) ===
      Seq(("0000000000000002", 4L), ("0000000000000003", 5L)))
  }

  test("tablet index decode tolerates the reference's nondeterministic " +
    "entry order and skips unknown fields (proto3 wire rules)") {
    val pk2 = "0000000000000002".getBytes("UTF-8")
    val pk3 = "0000000000000003".getBytes("UTF-8")
    // Entries REVERSED relative to key order, squelched field LAST, plus
    // an unknown varint field 7 and an unknown length-delimited field 9 —
    // all legal on the wire; Go's encoder can emit entries in any order.
    val scrambled =
      "1214" + "0a10" + toHex(pk3) + "1005" +
        "3807" +       // field 7 varint (unknown)
        "1214" + "0a10" + toHex(pk2) + "1004" +
        "4a03616263" + // field 9 bytes "abc" (unknown)
        "0802"         // squelched_count = 2
    val got = PayloadCodec.decodeTabletIndex(hex(scrambled))
    assert(got.squelchedCount === 2L)
    assert(got.entries.map(e => (new String(e._1, "UTF-8"), e._2)).sorted ===
      Seq(("0000000000000002", 4L), ("0000000000000003", 5L)))
    // A payload truncated INSIDE an unknown fixed-width field fails loudly
    // like every other truncation path (field 7, wire type 1 = fixed64,
    // only 3 of 8 value bytes present).
    val exTrunc = intercept[IllegalArgumentException] {
      PayloadCodec.decodeTabletIndex(hex("0802" + "39" + "aabbcc"))
    }
    assert(exTrunc.getMessage.contains("truncated fixed64"))
  }

  test("no_rows index round-trips (indexing_test.go no_rows case): empty " +
    "entry map, squelch preserved") {
    val p = TabletIndexPayload(2L, Seq.empty)
    assert(toHex(PayloadCodec.encodeTabletIndex(p)) === "0802")
    assert(PayloadCodec.decodeTabletIndex(hex("0802")) ===
      TabletIndexPayload(2L, Seq.empty))
  }

  test("write request wire round-trip: model -> proto3 bytes -> entries, " +
    "keys recovered byte-exactly through KeyCodec (the sharder segment " +
    "format, types.go:84-108 + sharder.go)") {
    import graft.model.{BlockRef, KeyCodec, SingletEntryM, TabletRowM, WriteRequest}
    val req = WriteRequest(
      height = 42L,
      block = BlockRef("abc123", 42L),
      tabletRows = Seq(
        TabletRowM(1, "t1", 42L, "pk0", "v0".getBytes("UTF-8"), isDeletion = false),
        TabletRowM(1, "t1", 42L, "pk1", Array.emptyByteArray, isDeletion = true)),
      singletEntries = Seq(
        SingletEntryM(7, "s1", 42L, Array[Byte](9, 8, 7), isDeletion = false)))
    val wire = PayloadCodec.writeRequestToWire(req)
    val back = PayloadCodec.decodeWriteRequest(wire)
    assert(back.height === 42L)
    assert(back.blockNum === 42L && back.blockId === "abc123")
    assert(back.tabletRows.length === 2 && back.singletEntries.length === 1)
    // Keys parse back through KeyCodec with the embedder's identifiers.
    back.tabletRows.zip(req.tabletRows).foreach { case (e, row) =>
      val (h, pk) = KeyCodec.decodeTabletRowKey(
        e.key, row.collection, row.tabletId.getBytes("UTF-8"))
      assert(h === row.height)
      assert(new String(pk, "UTF-8") === row.primaryKey)
      assert(e.value.isEmpty === row.isDeletion) // deletion ⇔ empty value
      if (!row.isDeletion) assert(e.value.toSeq === row.value.toSeq)
    }
    val se = back.singletEntries.head
    assert(KeyCodec.decodeSingletEntryKey(se.key, 7, "s1".getBytes("UTF-8")) === 42L)
    assert(se.value.toSeq === Seq[Byte](9, 8, 7))
    // Wire-order tolerance: height/block first, entries interleaved.
    val reordered = PayloadCodec.decodeWriteRequest(
      hex("1803" + "2202" + "0801" +
        toHex(PayloadCodec.encodeWriteRequest(
          PayloadCodec.WriteRequestPayload(Seq.empty, back.tabletRows.take(1), 0, 0, "")))))
    assert(reordered.height === 3L && reordered.blockNum === 1L)
    assert(reordered.tabletRows.length === 1)
  }

  test("property: all three payloads round-trip under seeded random fuzz " +
    "(uint64-range heights, arbitrary binary keys/values, empty edges)") {
    val rnd = new scala.util.Random(42)
    def randBytes(max: Int): Array[Byte] = {
      val b = new Array[Byte](rnd.nextInt(max))
      rnd.nextBytes(b); b
    }
    def randLong(): Long = rnd.nextInt(4) match {
      case 0 => rnd.nextLong() & Long.MaxValue // positive
      case 1 => rnd.nextLong()                 // full uint64 range incl. "negative"
      case 2 => rnd.nextInt(1000).toLong
      case _ => 0L                             // the omitted-default path
    }
    (1 to 300).foreach { i =>
      val cp = CheckpointPayload(randLong(), randLong(),
        new String(randBytes(40).map(b => ('a' + ((b & 0x7F) % 26)).toByte)))
      assert(PayloadCodec.decodeCheckpoint(PayloadCodec.encodeCheckpoint(cp)) === cp,
        s"checkpoint iteration $i")

      val ti = TabletIndexPayload(randLong(),
        // Distinct, non-empty primary keys: the encoder sorts by key and a
        // duplicate/empty key has no well-defined map semantics upstream
        // (the reference's map can't hold duplicates either).
        Seq.fill(rnd.nextInt(8))(randBytes(24)).filter(_.nonEmpty)
          .map(_.toSeq).distinct.map(_.toArray)
          .map(pk => (pk, randLong())))
      val tiBack = PayloadCodec.decodeTabletIndex(PayloadCodec.encodeTabletIndex(ti))
      assert(tiBack.squelchedCount === ti.squelchedCount, s"index iteration $i")
      assert(tiBack.entries.map(e => (e._1.toSeq, e._2)).sortBy(_._1.map(b => b & 0xFF).mkString(","))
        === ti.entries.map(e => (e._1.toSeq, e._2)).sortBy(_._1.map(b => b & 0xFF).mkString(",")),
        s"index iteration $i")

      val wr = PayloadCodec.WriteRequestPayload(
        Seq.fill(rnd.nextInt(5))(
          PayloadCodec.WriteEntryPayload(randBytes(32), randBytes(64))),
        Seq.fill(rnd.nextInt(5))(
          PayloadCodec.WriteEntryPayload(randBytes(32), randBytes(64))),
        randLong(), randLong(),
        new String(randBytes(20).map(b => ('a' + ((b & 0x7F) % 26)).toByte)))
      val wrBack = PayloadCodec.decodeWriteRequest(PayloadCodec.encodeWriteRequest(wr))
      assert(wrBack.height === wr.height && wrBack.blockNum === wr.blockNum &&
        wrBack.blockId === wr.blockId, s"write request iteration $i")
      def norm(es: Seq[PayloadCodec.WriteEntryPayload]) =
        es.map(e => (e.key.toSeq, e.value.toSeq))
      assert(norm(wrBack.singletEntries) === norm(wr.singletEntries),
        s"write request singlets iteration $i")
      assert(norm(wrBack.tabletRows) === norm(wr.tabletRows),
        s"write request tablets iteration $i")

      // The live-wire frame message wrapping the same write payload.
      val sb = PayloadCodec.StreamedBlockPayload(
        new String(randBytes(16).map(b => ('a' + ((b & 0x7F) % 26)).toByte)),
        new String(randBytes(16).map(b => ('a' + ((b & 0x7F) % 26)).toByte)),
        randLong(),
        if (rnd.nextBoolean()) "new" else "irreversible",
        wr)
      val sbBack = PayloadCodec.decodeStreamedBlock(PayloadCodec.encodeStreamedBlock(sb))
      assert(sbBack.id === sb.id && sbBack.parentId === sb.parentId &&
        sbBack.num === sb.num && sbBack.step === sb.step,
        s"streamed block iteration $i")
      assert(norm(sbBack.write.singletEntries) === norm(wr.singletEntries) &&
        norm(sbBack.write.tabletRows) === norm(wr.tabletRows) &&
        sbBack.write.height === wr.height,
        s"streamed block write iteration $i")
    }
  }

  test("explodeTabletIndexCells decodes a corpus of index cells where the " +
    "data lives (distributed), preserving tablet keys and squelch counts") {
    implicit val s = spark
    import s.implicits._
    val pkA = Array[Byte](1, 2, 3)
    val cellA = PayloadCodec.encodeTabletIndex(
      TabletIndexPayload(7L, Seq((pkA, 42L))))
    val cellB = PayloadCodec.encodeTabletIndex(TabletIndexPayload(1L, Seq.empty))
    val df = Seq(
      ("tk-a".getBytes("UTF-8"), cellA),
      ("tk-b".getBytes("UTF-8"), cellB)).toDF("tablet_key", "value")
    val out = PayloadCodec.explodeTabletIndexCells(df, "value")
      .collect()
      .map(r => (new String(r.getAs[Array[Byte]](0), "UTF-8"), r.getLong(1),
        Option(r.getAs[Array[Byte]](2)).map(_.toSeq), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Array(
      ("tk-a", 7L, Some(pkA.toSeq), 42L),
      ("tk-b", 1L, None, 0L)))
    // The tuple decode binds by ordinal — a frame with the columns in the
    // wrong ORDER must be rejected, not decoded against the wrong column.
    val ex = intercept[IllegalArgumentException] {
      PayloadCodec.explodeTabletIndexCells(
        df.select("value", "tablet_key"), "value")
    }
    assert(ex.getMessage.contains("in that order"))
  }

  test("dbin shard segment container: golden v1 header framing, zstd and " +
    "plain round-trip, legacy v0 header, torn/corrupt input fails loudly " +
    "(sharder.go:80-103 / shardinject.go:133-160 interop)") {
    import graft.model.{BlockRef, DbinCodec, SingletEntryM, TabletRowM, WriteRequest}
    def req(h: Long): WriteRequest = WriteRequest(
      h, BlockRef(f"blk$h%03d", h),
      Seq(TabletRowM(1, "t1", h, s"pk${h % 2}", s"v$h".getBytes("UTF-8"), false),
        TabletRowM(1, "t1", h, "gone", Array.emptyByteArray, isDeletion = true)),
      Seq(SingletEntryM(7, "s1", h, Array[Byte](h.toByte), false)))
    val requests = (5L to 9L).map(req)
    val payloads = requests.map(PayloadCodec.writeRequestPayloadOf)

    // GOLDEN v1 header framing: 'dbin', version 1, 1 length byte, 'fwr',
    // then each message 4-byte big-endian length-prefixed.
    val plain = {
      val bo = new java.io.ByteArrayOutputStream()
      DbinCodec.writeShardSegment(bo, payloads, compress = false)
      bo.toByteArray
    }
    assert(toHex(plain.take(9)) === "6462696e" + "01" + "03" + "667772")
    val firstLen = ((plain(9) & 0xFF) << 24) | ((plain(10) & 0xFF) << 16) |
      ((plain(11) & 0xFF) << 8) | (plain(12) & 0xFF)
    assert(firstLen === PayloadCodec.encodeWriteRequest(payloads.head).length)

    // Round-trips: plain and zstd (the .dbin.zst wire actually shipped) —
    // identical record bytes either way, sniffed from the stream itself.
    val zst = {
      val bo = new java.io.ByteArrayOutputStream()
      DbinCodec.writeShardSegment(bo, payloads, compress = true)
      bo.toByteArray
    }
    assert(toHex(zst.take(4)) === "28b52ffd", "zstd magic")
    def read(bytes: Array[Byte], after: Option[Long] = None) =
      DbinCodec.readShardSegment(new java.io.ByteArrayInputStream(bytes), after)
    for (bytes <- Seq(plain, zst)) {
      val back = read(bytes)
      assert(back.map(_.height) === (5L to 9L))
      assert(back.map(PayloadCodec.encodeWriteRequest).map(toHex) ===
        payloads.map(PayloadCodec.encodeWriteRequest).map(toHex))
      // startAfter skips at-or-below heights (ReadShard parity).
      assert(read(bytes, Some(7L)).map(_.height) === Seq(8L, 9L))
    }

    // The decoded records convert to model rows through the registry.
    val models = read(zst).map(DbinCodec.toModel(_, Map(1 -> 2, 7 -> 2)))
    assert(models.map(_.height) === (5L to 9L))
    assert(models.head.block === BlockRef("blk005", 5L))
    assert(models.head.tabletRows.map(r => (r.tabletId, r.primaryKey, r.isDeletion))
      === Seq(("t1", "pk1", false), ("t1", "gone", true)))
    assert(models.head.singletEntries.map(e => (e.singletId, e.collection))
      === Seq(("s1", 7)))

    // LEGACY v0 header (3-byte type + 2-digit content version) still
    // parses at the container layer...
    val v0 = hex("6462696e" + "00" + "667772" + "3031")
    assert(DbinCodec.readHeader(new java.io.ByteArrayInputStream(v0))
      === DbinCodec.Header("fwr", 0))
    // ...but the SHARD reader requires v1, the reference's own gate.
    val v0seg = intercept[IllegalArgumentException] { read(v0) }
    assert(v0seg.getMessage.contains("unsupported"))

    // Loud failures: bad magic, unknown version, torn message tail.
    assert(intercept[IllegalArgumentException] {
      read(hex("64626900" + "01"))
    }.getMessage.contains("bad magic"))
    assert(intercept[IllegalArgumentException] {
      DbinCodec.readHeader(new java.io.ByteArrayInputStream(
        hex("6462696e" + "07")))
    }.getMessage.contains("version 7"))
    val torn = plain.dropRight(3)
    assert(intercept[java.io.EOFException] { read(torn) }
      .getMessage.contains("torn"))

    // The length prefix is untrusted: a corrupt frame claiming ~2 GB must
    // fail as corruption BEFORE the allocation (not as a driver OOM)...
    val hugeLen = hex("6462696e" + "01" + "03" + "667772" + "7FFFFFFF")
    assert(intercept[IllegalArgumentException] { read(hugeLen) }
      .getMessage.contains("exceeds"))
    // ...and an IN-cap claimed length on a truncated stream fails at the
    // torn byte (chunked read), allocating only what actually arrived.
    val inCapTorn = hex("6462696e" + "01" + "03" + "667772" + "00A00000") ++
      Array.fill[Byte](64)(0x7) // claims 10 MiB, carries 64 bytes
    assert(intercept[java.io.EOFException] { read(inCapTorn) }
      .getMessage.contains("torn"))
  }
}
