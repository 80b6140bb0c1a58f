package graft.model

/** Reference key codec (SURVEY §2.2 / P5) — byte-exact packing of the
  * reference's ordered-KV storage keys:
  *
  *   tablet row:    <collection u16 BE><tablet identifier><height u64 BE><primary key>
  *                  (tablet.go:251–278)
  *   singlet entry: <collection u16 BE><singlet identifier><INVERTED height u64 BE>
  *                  (singlet.go:232–241 — `MaxUint64 - height`, so the KV
  *                  store's ascending order serves newest-first scans)
  *
  * The Spark engine never packs keys — mutations are plain columns and
  * Catalyst predicates replace key-range scans — so this codec is a pure
  * COMPATIBILITY surface: a deployment migrating off the reference can
  * decode its existing KV keys into columnar rows (and back) with
  * byte-for-byte fidelity, proven against the reference's own golden hex
  * vectors (tablet_test.go:99–126, singlet_test.go:29–64) in
  * `KeyCodecSpec`.
  */
object KeyCodec {

  val CollectionBytes = 2 // types.go:26
  val HeightBytes = 8     // types.go:27

  /** `MaxUint64 - height` in two's complement (utils.go:33). */
  def invertHeight(height: Long): Long = ~height

  private def putCollection(out: Array[Byte], collection: Int): Unit = {
    require((collection & 0xFFFF) == collection,
      s"collection must fit an unsigned 16-bit value, got $collection")
    out(0) = ((collection >>> 8) & 0xFF).toByte
    out(1) = (collection & 0xFF).toByte
  }

  private def putHeight(out: Array[Byte], off: Int, height: Long): Unit = {
    var i = 0
    while (i < 8) {
      out(off + i) = ((height >>> (8 * (7 - i))) & 0xFF).toByte
      i += 1
    }
  }

  private def getU16(key: Array[Byte]): Int =
    ((key(0) & 0xFF) << 8) | (key(1) & 0xFF)

  private def getU64(key: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (key(off + i) & 0xFFL); i += 1 }
    v
  }

  // ------------------------------------------------------------- encoding

  /** KeyForTablet (tablet.go:148–157). */
  def keyForTablet(collection: Int, identifier: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](CollectionBytes + identifier.length)
    putCollection(out, collection)
    System.arraycopy(identifier, 0, out, CollectionBytes, identifier.length)
    out
  }

  /** KeyForTabletAt (tablet.go:173–183). */
  def keyForTabletAt(collection: Int, identifier: Array[Byte], height: Long): Array[Byte] = {
    val out = new Array[Byte](CollectionBytes + identifier.length + HeightBytes)
    putCollection(out, collection)
    System.arraycopy(identifier, 0, out, CollectionBytes, identifier.length)
    putHeight(out, CollectionBytes + identifier.length, height)
    out
  }

  /** KeyForTabletRowFromParts (tablet.go:265–278). */
  def keyForTabletRow(
      collection: Int, identifier: Array[Byte],
      height: Long, primaryKey: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](
      CollectionBytes + identifier.length + HeightBytes + primaryKey.length)
    putCollection(out, collection)
    System.arraycopy(identifier, 0, out, CollectionBytes, identifier.length)
    putHeight(out, CollectionBytes + identifier.length, height)
    System.arraycopy(primaryKey, 0, out,
      CollectionBytes + identifier.length + HeightBytes, primaryKey.length)
    out
  }

  /** KeyForSinglet (singlet.go:171–178). */
  def keyForSinglet(collection: Int, identifier: Array[Byte]): Array[Byte] =
    keyForTablet(collection, identifier)

  /** KeyForSingletAt ≡ KeyForSingletEntry (singlet.go:160–168, 232–241):
    * the height is stored INVERTED. */
  def keyForSingletEntry(collection: Int, identifier: Array[Byte], height: Long): Array[Byte] =
    keyForTabletAt(collection, identifier, invertHeight(height))

  // ------------------------------------------------------------- decoding

  /** NewTabletRow's key parse (tablet.go:211–240): validates length,
    * collection, and identifier, then splits (height, primaryKey).
    * Error messages mirror the reference verbatim. */
  def decodeTabletRowKey(
      key: Array[Byte], collection: Int, identifier: Array[Byte]): (Long, Array[Byte]) = {
    val heightOffset = CollectionBytes + identifier.length
    val primaryKeyOffset = heightOffset + HeightBytes
    if (primaryKeyOffset >= key.length)
      throw new IllegalArgumentException(
        s"invalid key length, expected at least ${primaryKeyOffset + 1} bytes, got ${key.length}")
    val gotCollection = getU16(key)
    if (gotCollection != collection)
      throw new IllegalArgumentException(
        f"key from different collection, expected collection 0x$collection%04X, got 0x$gotCollection%04X")
    if (!java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(key, CollectionBytes, heightOffset), identifier))
      throw new IllegalArgumentException("key from different tablet")
    (getU64(key, heightOffset), java.util.Arrays.copyOfRange(key, primaryKeyOffset, key.length))
  }

  /** NewSingletEntry's key parse (singlet.go:192–211): returns the REAL
    * height (`MaxUint64 - stored`). */
  def decodeSingletEntryKey(key: Array[Byte], collection: Int, identifier: Array[Byte]): Long = {
    val heightOffset = CollectionBytes + identifier.length
    if (heightOffset >= key.length)
      throw new IllegalArgumentException(
        s"invalid key length, expected at least $heightOffset bytes, got ${key.length}")
    val gotCollection = getU16(key)
    if (gotCollection != collection)
      throw new IllegalArgumentException(
        f"key from different collection, expected collection 0x$collection%04X, got 0x$gotCollection%04X")
    invertHeight(getU64(key, heightOffset))
  }

  def toHex(key: Array[Byte]): String = key.map("%02x".format(_)).mkString

  // ------------------------------------------- registry-driven key parses

  /** The key's collection prefix — what the reference's registry dispatches
    * factories on (tablet.go:37–58). */
  def collectionOf(key: Array[Byte]): Int = {
    require(key.length >= CollectionBytes, s"key too short: ${key.length} bytes")
    getU16(key)
  }

  /** Parse a tablet-row key given the collection's fixed identifier width
    * (the registry's knowledge — the reference's factories parse the same
    * way, e.g. the 3-char test tablet, tablet_test.go:230–236). Returns
    * (collection, identifier, height, primaryKey). */
  def parseTabletRowKey(
      key: Array[Byte], identifierLen: Int): (Int, Array[Byte], Long, Array[Byte]) = {
    val heightOffset = CollectionBytes + identifierLen
    val pkOffset = heightOffset + HeightBytes
    require(key.length > pkOffset,
      s"invalid tablet-row key length, expected at least ${pkOffset + 1} bytes, got ${key.length}")
    (getU16(key),
      java.util.Arrays.copyOfRange(key, CollectionBytes, heightOffset),
      getU64(key, heightOffset),
      java.util.Arrays.copyOfRange(key, pkOffset, key.length))
  }

  /** Parse a singlet-entry key (stored height is INVERTED) given the
    * collection's fixed identifier width. Returns (collection, identifier,
    * real height). */
  def parseSingletEntryKey(
      key: Array[Byte], identifierLen: Int): (Int, Array[Byte], Long) = {
    val heightOffset = CollectionBytes + identifierLen
    require(key.length == heightOffset + HeightBytes,
      s"invalid singlet-entry key length, expected ${heightOffset + HeightBytes} bytes, got ${key.length}")
    (getU16(key),
      java.util.Arrays.copyOfRange(key, CollectionBytes, heightOffset),
      invertHeight(getU64(key, heightOffset)))
  }
}
