package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-dimensional (key, height) clustering for the compacted mutation
  * tables — SURVEY §7.4.7's second 100 TB lever: the height-sorted layout
  * gives tail scans tight row-group pruning on `height` but leaves a point
  * read (`primary_key = X`) scanning every row group of its tablet,
  * because key order is uncorrelated with height order. An interleaved
  * sort key gives every row group a TIGHT bounding box in BOTH dimensions,
  * so parquet min/max stats prune `height`-band scans AND `primary_key`
  * point/range reads — each from its own column's stats, with no index
  * structure and no schema change (the z-value is a sort key, dropped
  * before write).
  *
  * Two deliberate departures from textbook Morton interleave, both
  * measured on the 100× probe corpus:
  *
  *   - EQUAL-FREQUENCY key dimension. Raw key-prefix bits are the classic
  *     Z-order trap: real keys cluster in a corner of byte space (ASCII
  *     digits/letters share high bits), so the bits that distinguish keys
  *     sit at low z-significance and the curve degenerates back to a
  *     height sort (measured: a 4-byte-prefix affine interleave cut point-
  *     read decode only 1.8× while costing the tail read 1.5×). The key
  *     dimension here is the key's approximate RANK — a 256-bucket
  *     equal-frequency histogram from one `approxQuantile` pass at
  *     compaction time — which is uniform BY CONSTRUCTION for any key
  *     distribution, and monotone, so string min/max stats still prune.
  *   - PAIRED-TOP interleave (8 key bits ⊗ top-8 height bits, then the
  *     low 24 height bits contiguous). A point read's useful selectivity
  *     saturates at row-group granularity — beyond ~256 key buckets the
  *     quantization dominates — so the key dimension gets 8 bits, and
  *     ALL of them sit in the top 16 z-bits alternating with height's
  *     top 8: at any row-group count the two dimensions gain resolution
  *     in lockstep (a 1:4-spread variant starved the key dimension at
  *     realistic row-group depth — measured 1 key bit of pruning where
  *     this layout yields bits evenly). Below the interleaved top, the
  *     remaining height bits run contiguous, so once a scan is inside one
  *     (bucket, height-256th) cell the order is pure height — fine
  *     resolution for tail scans at no cost to the key dimension, which
  *     is already exhausted.
  */
object ZOrder {

  /** Per-compaction dimension stats: the key dimension's equal-frequency
    * bucket boundaries (ascending, ≤ 255 of them) and the height
    * dimension's affine normalization. Both dimensions get fill-scaling —
    * a corpus with few distinct keys yields few buckets, and an unscaled
    * bucket would leave the key dimension's HIGH bits constant, handing
    * the top of the sort key entirely to height (the same
    * corner-of-the-space failure the histogram exists to fix). */
  final case class ZDims(keyBounds: Seq[Long], heightMin: Long, heightShift: Int)

  /** Shift scaling a non-negative delta to fill (not overflow) 32 bits:
    * positive = left shift (small ranges spread up), negative = right
    * shift (ranges past 32 bits compress down). */
  private[graft] def fillShiftFor(delta: Long): Int =
    if (delta <= 0) 0
    else 32 - (64 - java.lang.Long.numberOfLeadingZeros(delta))

  /** Gather both dimensions' stats: one approxQuantile pass for the key
    * histogram (equal-frequency boundaries over the 4-byte prefix) and one
    * min/max aggregate for the height range. Compaction-time only. */
  def dimsOf(df: DataFrame, keyCol: String, heightCol: String): ZDims = {
    val proj = df.select(
      keyPrefix32(col(keyCol)).cast("double").as("__p"), col(heightCol))
    val bounds = proj.stat
      .approxQuantile("__p", (1 until 256).map(_ / 256.0).toArray, 0.001)
      .map(_.toLong).distinct.sorted.toSeq
    val r = df.agg(min(col(heightCol)), max(col(heightCol))).head()
    if (r.isNullAt(0)) ZDims(Nil, 0L, 0)
    else ZDims(bounds, r.getLong(0), fillShiftFor(r.getLong(1) - r.getLong(0)))
  }

  /** Order-preserving 32-bit embedding of a string's first 4 UTF-8 bytes
    * (big-endian, zero-padded on the right so shorter keys sort first,
    * matching string order). */
  def keyPrefix32(key: Column): Column =
    conv(rpad(hex(substring(encode(key, "UTF-8"), 1, 4)), 8, "0"), 16, 10)
      .cast("long")

  /** Equal-frequency bucket (0..#bounds) of a PRE-COMPUTED key prefix:
    * the number of boundaries at or below it — a monotone step function,
    * scan-local (one fold over a ≤255-element literal array). Takes the
    * prefix, not the key: the fold references its input once per array
    * element, so the caller must hand it a cheap expression (a projected
    * column), not the encode/hex/conv chain, which would otherwise be
    * re-evaluated up to 255× per row. */
  def keyBucketOfPrefix(prefix: Column, bounds: Seq[Long]): Column =
    if (bounds.isEmpty) lit(0L)
    else aggregate(lit(bounds.toArray), lit(0L),
      (acc, b) => acc + when(prefix >= b, 1L).otherwise(0L))

  /** The interleaved sort key from a PRE-COMPUTED raw bucket: the 8
    * key-bucket bits and the top 8 normalized-height bits alternate in
    * the top 16 positions (key in the more significant slot of each
    * pair), the 24 low height bits run contiguous below. Max 40 bits,
    * always non-negative: plain signed ordering is correct. Like
    * [[keyBucketOfPrefix]], `bucket` should be a projected column — the
    * fold references it 16 times. */
  def zValueOfBucket(bucket: Column, height: Column, dims: ZDims): Column = {
    val h0 = height - lit(dims.heightMin)
    val h =
      (if (dims.heightShift >= 0) shiftleft(h0, dims.heightShift)
       else shiftright(h0, -dims.heightShift)).bitwiseAND(lit(0xFFFFFFFFL))
    // Multiplicative rescale of the bucket to fill 0..255 UNIFORMLY: a
    // left-shift fill leaves the top bit set only for the single highest
    // bucket when the bucket count is a power-of-two boundary (measured:
    // the top key bit then split off 1/16 of rows instead of half, and
    // the layout degenerated height-major again). `bucket·255 div n` is
    // monotone and spreads every bit's 0/1 populations evenly for any
    // bucket count. (floor over doubles is exact: bucket·255 ≤ 65k ≪ 2⁵³.)
    val nb = math.max(1, dims.keyBounds.size)
    val b = floor(bucket * lit(255.0) / lit(nb.toDouble)).cast("long")
    val hHigh = shiftright(h, 24).bitwiseAND(lit(0xFFL))
    val hLow = h.bitwiseAND(lit(0xFFFFFFL))
    (0 until 8).foldLeft(hLow) { (z, j) =>
      z.bitwiseOR(shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 25 + 2 * j))
        .bitwiseOR(shiftleft(shiftright(hHigh, j).bitwiseAND(lit(1L)), 24 + 2 * j))
    }
  }

  /** One-expression convenience form (probes, specs): computes prefix and
    * bucket inline. Compaction uses the projected-column form instead —
    * see [[keyBucketOfPrefix]]'s cost note. */
  def zValue(key: Column, height: Column, dims: ZDims): Column =
    zValueOfBucket(
      keyBucketOfPrefix(keyPrefix32(key), dims.keyBounds), height, dims)
}
