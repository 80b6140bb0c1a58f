package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared MinHash + banded-LSH construction: 16 affine permutations over a
  * 32-bit md5-derived shingle hash, folded into 4 band keys of 4 minhashes
  * each (reference near-dup granularity; see PipelineQueries' oracle — the
  * DuckDB side mirrors these exact constants).
  *
  * Two formulations of the SAME signature:
  *   - [[bandsOf]] — the batch form: exploded shingle rows, one
  *     map-side-combined groupBy. Right when the shingle index is already
  *     materialized (it is reused by verification).
  *   - [[perRowBands]] — the per-ROW form: `array_min(transform(...))` over
  *     each document's shingle array, ZERO shuffle. Right for streams
  *     (stateless, no watermark needed to build a signature) and anywhere
  *     the shingle index is not wanted. Identical output by construction:
  *     min over the same distinct-shingle set.
  */
object MinHashLsh {

  /** Smallest prime > 2^32; `A·h + B < 2^61` — no 64-bit overflow. */
  val P = 4294967311L
  /** Driver-side md5 hex — the single shared copy (seed derivation here,
    * classifier weights, oracle literal generation all hash with it). */
  private[queries] def md5hex(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
  val A: IndexedSeq[Long] =
    (0 until 16).map(j => java.lang.Long.parseLong(md5hex(s"A$j").substring(0, 7), 16) + 1L)
  val B: IndexedSeq[Long] =
    (0 until 16).map(j => java.lang.Long.parseLong(md5hex(s"B$j").substring(0, 7), 16))

  /** 32-bit md5-derived hash (identical to the DuckDB oracle's). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The 4 band-key columns over signature columns `<prefix>0..<prefix>15`. */
  private def bandKeyColsOf(prefix: String): Seq[Column] = (0 until 4).map { b =>
    val ms = (0 until 4).map(r => col(s"$prefix${4 * b + r}").cast("string"))
    md5(concat_ws(",", ms: _*))
  }
  private def bandKeyCols: Seq[Column] = bandKeyColsOf("m")

  /** Batch form: `(doc_id, band, bkey)` from exploded hashed shingle rows
    * `(doc_id, sh, h)` — one groupBy + one posexplode pass. */
  def bandsOf(sh: DataFrame): DataFrame = {
    val sigCols = (0 until 16).map { j =>
      min((lit(A(j)) * col("h") + lit(B(j))) % lit(P)).as(s"m$j")
    }
    sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"), posexplode(array(bandKeyCols: _*)).as(Seq("band", "bkey")))
  }

  /** Per-row form: `(doc_id, band, bkey)` computed inside the scan stage
    * from each document's distinct 3-gram shingles — no shuffle, stream-
    * safe. Documents with no shingle (< 3 words) emit nothing, matching
    * the batch form (their exploded rows don't exist). */
  def perRowBands(docs: DataFrame): DataFrame = {
    val shs = graft.functions.WordShingles.shingles(col("text"), 3)
    val sigCols = (0 until 16).map { j =>
      array_min(transform(col("shs"),
        sh => (lit(A(j)) * h32(sh) + lit(B(j))) % lit(P))).as(s"m$j")
    }
    docs
      .withColumn("shs", shs)
      .filter(size(col("shs")) > 0)
      .select(col("doc_id") +: sigCols: _*)
      .select(col("doc_id"), posexplode(array(bandKeyCols: _*)).as(Seq("band", "bkey")))
  }

  /** Per-row band keys as COLUMNS `bkey0..bkey3` appended to `docs` —
    * the same keys [[perRowBands]] explodes, kept un-exploded so a
    * row-preserving consumer (one output row per doc, e.g. the online
    * curation gate's flag joins) needs no re-aggregation. Documents with
    * no shingle (< 3 words) get NULL keys — null never equi-joins, which
    * reproduces the exploded form's emit-nothing behavior. */
  def withRowBandKeys(docs: DataFrame): DataFrame = {
    val shs = graft.functions.WordShingles.shingles(col("text"), 3)
    val sigCols = (0 until 16).map { j =>
      array_min(transform(col("__shs"),
        sh => (lit(A(j)) * h32(sh) + lit(B(j))) % lit(P))).as(s"__m$j")
    }
    val sigs = docs
      .withColumn("__shs", shs)
      .select(col("*") +: sigCols: _*)
    val keyed = bandKeyColsOf("__m").map(c => when(size(col("__shs")) > 0, c))
      .zipWithIndex
      .foldLeft(sigs) { case (df, (c, b)) => df.withColumn(s"bkey$b", c) }
    keyed.drop("__shs").drop((0 until 16).map(j => s"__m$j"): _*)
  }
}
