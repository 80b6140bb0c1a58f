package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.KeyCodec
import KeyCodec.toHex

/** Golden-compat key codec tests: the hex vectors are copied from the
  * REFERENCE's own test matrix (tablet_test.go:83–126 — testTablet is
  * collection 0xFFF2; singlet_test.go:29–64 — testSinglet is 0xFFF1 with
  * inverted heights), so packing is proven byte-exact against the system
  * being re-expressed, not against this repo's own expectations. */
class KeyCodecSpec extends AnyFunSuite {

  private val abc = "abc".getBytes("UTF-8")
  private val ghi = "ghi".getBytes("UTF-8")
  private val MaxU64 = -1L // math.MaxUint64 in two's complement

  test("KeyForTablet golden vector (tablet_test.go:83–97)") {
    assert(toHex(KeyCodec.keyForTablet(0xFFF2, abc)) === "fff2616263")
  }

  test("KeyForTabletAt golden vectors (tablet_test.go:99–115)") {
    assert(toHex(KeyCodec.keyForTabletAt(0xFFF2, abc, 0L))
      === "fff26162630000000000000000")
    assert(toHex(KeyCodec.keyForTabletAt(0xFFF2, abc, 10L))
      === "fff2616263000000000000000a")
    assert(toHex(KeyCodec.keyForTabletAt(0xFFF2, abc, MaxU64))
      === "fff2616263ffffffffffffffff")
  }

  test("KeyForTabletRow golden vectors (tablet_test.go:117–126)") {
    assert(toHex(KeyCodec.keyForTabletRow(0xFFF2, abc, 0L, ghi))
      === "fff26162630000000000000000676869")
    assert(toHex(KeyCodec.keyForTabletRow(0xFFF2, abc, 10L, ghi))
      === "fff2616263000000000000000a676869")
    assert(toHex(KeyCodec.keyForTabletRow(0xFFF2, abc, MaxU64, ghi))
      === "fff2616263ffffffffffffffff676869")
  }

  test("KeyForSingletEntry golden vectors — INVERTED height " +
    "(singlet_test.go:29–64)") {
    assert(toHex(KeyCodec.keyForSinglet(0xFFF1, abc)) === "fff1616263")
    assert(toHex(KeyCodec.keyForSingletEntry(0xFFF1, abc, 0L))
      === "fff1616263ffffffffffffffff")
    assert(toHex(KeyCodec.keyForSingletEntry(0xFFF1, abc, 10L))
      === "fff1616263fffffffffffffff5")
    assert(toHex(KeyCodec.keyForSingletEntry(0xFFF1, abc, MaxU64))
      === "fff16162630000000000000000")
  }

  test("tablet row keys round-trip decode, singlet heights re-invert") {
    for (h <- Seq(0L, 1L, 10L, 1000000L, Long.MaxValue, MaxU64)) {
      val (height, pk) = KeyCodec.decodeTabletRowKey(
        KeyCodec.keyForTabletRow(0xFFF2, abc, h, ghi), 0xFFF2, abc)
      assert(height === h && pk.toSeq === ghi.toSeq)
      assert(KeyCodec.decodeSingletEntryKey(
        KeyCodec.keyForSingletEntry(0xFFF1, abc, h), 0xFFF1, abc) === h)
    }
  }

  test("decode validation mirrors the reference's errors (tablet_test.go:54–63)") {
    // "not enough bytes": tablet abc needs ≥ 14 (2 + 3 + 8 + pk ≥ 1).
    val short = intercept[IllegalArgumentException] {
      KeyCodec.decodeTabletRowKey(Array[Byte](0xFF.toByte, 0xF2.toByte), 0xFFF2, abc)
    }
    assert(short.getMessage === "invalid key length, expected at least 14 bytes, got 2")
    val noPk = intercept[IllegalArgumentException] {
      KeyCodec.decodeTabletRowKey(
        KeyCodec.keyForTabletAt(0xFFF2, abc, 1L), 0xFFF2, abc)
    }
    assert(noPk.getMessage === "invalid key length, expected at least 14 bytes, got 13")
    // Collection mismatch carries both values, hex-formatted.
    val wrongColl = intercept[IllegalArgumentException] {
      KeyCodec.decodeTabletRowKey(
        KeyCodec.keyForTabletRow(0xFFF3, abc, 1L, ghi), 0xFFF2, abc)
    }
    assert(wrongColl.getMessage
      === "key from different collection, expected collection 0xFFF2, got 0xFFF3")
  }
}
