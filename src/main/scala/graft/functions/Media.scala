package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image encode/decode for the multimodal pipeline queries.
  *
  * The test corpus ships no image column, so the "media blob" is
  * DERIVED deterministically from each document's text — but the codec
  * path is REAL: a `BufferedImage` is PNG-encoded and later decoded
  * through `javax.imageio` (the JDK's actual PNG plugin), so the
  * executor-side batch shape, codec-context reuse, and decode cost in
  * `p_multimodal_decode`/`p_multimodal_frames` are those of a genuine
  * image pipeline, not a stub. Swapping the payload source for a real
  * `binary` parquet column changes one `select`.
  *
  * Everything is integer/deterministic so repeated runs (and both bench
  * hosts) produce identical rows.
  */
object Media {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates (and locks around) a temp cache file, which serializes the
  // 32 executor threads behind filesystem calls — measured 8.7 s for 5k
  // tiny decodes. Memory-backed streams drop that to pure codec cost.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic rolling hash of a payload (stable across JVMs). */
  def payloadHash(bytes: Array[Byte]): Long =
    bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)

  /** Render a text payload as a small RGB image: dimensions and pixels
    * derive from a rolling hash of the utf8 bytes. Returns REAL PNG bytes
    * (javax.imageio encoder). */
  def textToPng(text: String, frame: Int = 0): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    val h0 = payloadHash(bytes) + frame * 2654435761L
    val width = (16 + (h0 % 16)).toInt
    val height = (16 + ((h0 / 16) % 16)).toInt
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](width * height)
    var s = h0 | 1L
    var i = 0
    while (i < px.length) {
      // xorshift-style deterministic pixel stream.
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      px(i) = (s & 0xffffff).toInt
      i += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width) // bulk, not per-pixel
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode PNG bytes via the JDK codec. Returns
    * (width, height, meanLuminanceMilli) — mean of the ITU-R BT.601 luma
    * over the raster, in thousandths (integer, so exactly reproducible). */
  def decodePng(png: Array[Byte]): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "not a decodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk, not per-pixel
    var lumSum = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      lumSum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff) // BT.601 * 1000
      i += 1
    }
    (w, h, lumSum / (w.toLong * h))
  }
}
