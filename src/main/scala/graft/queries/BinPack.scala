package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Best-fit-decreasing sequence packing — the padding-MINIMIZING
  * counterpart to [[SequencePack]]'s order-preserving contiguous bins.
  *
  * Training batches waste `capacity − fill` tokens per sequence as
  * padding; contiguous packing accepts whatever waste the document
  * order produces, while packers that may REORDER documents (the
  * common choice for pretraining, where document order within a shard
  * carries no meaning) get near-optimal fills from the classic
  * best-fit-decreasing heuristic.
  *
  * Exact BFD is inherently sequential (every placement depends on all
  * previous ones), so the distributed form is the standard
  * pack-within-partition approximation, made DETERMINISTIC end to end:
  *
  *   1. docs are routed to one of `nParts` packing partitions by
  *      md5(doc_id) — a data-defined assignment, independent of input
  *      partitioning, cluster size, or scheduling;
  *   2. each partition independently runs textbook BFD over its docs in
  *      (ntok desc, doc_id) order — a TreeMap best-fit lookup per doc,
  *      O(n log n) per partition, partition-local memory only;
  *   3. bins are identified by (part, bin) — no cross-partition
  *      coordination at any point.
  *
  * Fill quality is the BFD guarantee PER PARTITION: at most one open
  * bin can ever be ≤ half-full (two such bins would have been packed
  * together), so waste is bounded partition-locally, independent of
  * corpus size — the property the spec pins. At 100 TB: one shuffle on
  * the md5 route key, then embarrassingly parallel per-partition packs;
  * `nParts` sizes partition memory (corpus/nParts docs each).
  *
  * Oversized docs (ntok > capacity) get singleton bins — splitting is
  * chunking's job (`p_chunk_tokens`), not the packer's.
  */
object BinPack {

  /** Per-doc assignment `(doc_id, ntok, part, bin)`; bins are dense
    * 0-based indices in creation order within each part. */
  def packBestFit(docsDf: DataFrame, capacity: Long,
      nParts: Int = 32): DataFrame = {
    val spark = docsDf.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ntok", LongType, nullable = false),
      StructField("part", LongType, nullable = false),
      StructField("bin", LongType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    docsDf
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        (MinHashLsh.h32(col("doc_id").cast("string")) % nParts).as("part"))
      .repartition(nParts, col("part"))
      .mapPartitions { it =>
        val docs = it.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toArray
        // One md5-routed part per task; empty tasks emit nothing.
        docs.groupBy(_._3).iterator.flatMap { case (part, ds) =>
          // BFD: largest first; best fit = the fullest bin that still
          // takes the doc (tightest remaining capacity wins, ties to
          // the lowest bin id).
          val byGap = new java.util.TreeMap[Long, // remaining capacity
            scala.collection.mutable.TreeSet[Long]]() // bin ids
          val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long)]
          ds.sortBy { case (id, n, _) => (-n, id) }.foreach {
            case (id, n, _) =>
              val fit = Option(byGap.ceilingEntry(n))
              val bin = fit match {
                case Some(e) =>
                  val q = e.getValue
                  val b = q.head
                  q.remove(b)
                  if (q.isEmpty) byGap.remove(e.getKey)
                  fills(b.toInt) += n
                  b
                case None =>
                  fills += n
                  (fills.size - 1).toLong
              }
              val gap = capacity - fills(bin.toInt)
              if (gap > 0) byGap
                .computeIfAbsent(gap, _ => scala.collection.mutable.TreeSet())
                .add(bin)
              out += ((id, n, bin))
          }
          out.iterator.map { case (id, n, b) => Row(id, n, part, b) }
        }
      }
      .orderBy("doc_id")
  }
}
