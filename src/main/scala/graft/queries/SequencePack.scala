package graft.queries

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed running token totals for greedy sequence packing.
  *
  * The declarative formulation — `sum(ntok) OVER (PARTITION BY source
  * ORDER BY doc_id)` — funnels EVERY row of a source into one window
  * task: fine when sources are plentiful, a single-task serialization
  * when one source holds billions of documents. This operator computes
  * the identical running total as a classic two-phase distributed scan
  * (the shape Spark lacks a built-in for):
  *
  *   1. range-partition by (source, doc_id) and sort within partitions —
  *      the range exchange makes partition ids ascend with the key order;
  *   2. one pass collects the tiny per-(partition, source) token totals
  *      (≤ partitions × sources rows) to the driver;
  *   3. prefix offsets per (partition, source) are broadcast back and a
  *      second pass emits `cum = offset + running-within-partition` —
  *      no row ever crosses the network again.
  *
  * Output is bit-identical to the window formulation for any range
  * boundaries (the offsets adapt to whatever partitioning the sampler
  * picked), which the driver's DuckDB oracle proves every round — the
  * oracle SQL *is* the window formulation.
  */
object SequencePack {

  /** `(doc_id, source, ntok, cum)` — `cum` is the per-source running
    * total of `ntok` in `doc_id` order, inclusive of the current row. */
  def runningTokenTotals(docsDf: DataFrame, nPartitions: Int = 0): DataFrame = {
    val spark = docsDf.sparkSession
    val n =
      if (nPartitions > 0) nPartitions
      else spark.sessionState.conf.numShufflePartitions
    // Narrow projection (3 longs + source per doc) pinned for the two
    // passes. Stays persisted after return so the lazy result never
    // recomputes under a different partitioning than the offsets were
    // collected for; session-scoped like the verified-pairs memo (a
    // catalog.clearCache or session end reclaims it). Persisting THIS —
    // not checkpointing the corpus-sized output — is the scale-correct
    // side of the trade: the old eager localCheckpoint materialized one
    // output row per document a second time just to make unpersist safe.
    val base = docsDf
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .repartitionByRange(n, col("source"), col("doc_id"))
      .sortWithinPartitions("source", "doc_id")
      .persist()
    // Phase 1: per-(partition, source) totals — tiny.
    val partials = base
      .select(spark_partition_id().as("pid"), col("source"), col("ntok"))
      .groupBy("pid", "source").agg(sum("ntok").as("psum"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
    // Prefix offsets: total of earlier partitions for the same source
    // (range partition ids ascend with the key order). One sorted scan
    // per source — linear in the partials, which matters when both the
    // partition count and the source count are large.
    val offsets: Map[(Int, String), Long] = partials.toSeq
      .groupBy(_._1._2)
      .flatMap { case (_, ps) =>
        var acc = 0L
        ps.sortBy(_._1._1).map { case (key, v) =>
          val off = acc; acc += v; key -> off
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("ntok", LongType), StructField("cum", LongType)))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    base.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var curSource: String = null
      var running = 0L
      it.map { r =>
        val src = r.getString(1)
        if (src != curSource) { curSource = src; running = bc.value.getOrElse((pid, src), 0L) }
        running += r.getLong(2)
        Row(r.getLong(0), src, r.getLong(2), running)
      }
    }
  }

  /** Greedy contiguous packing into `budget`-token bins, aggregated per
    * (source, bin) — the distributed form of `p_pack_sequences`. */
  def packed(docsDf: DataFrame, budget: Long, nPartitions: Int = 0): DataFrame =
    runningTokenTotals(docsDf, nPartitions)
      .withColumn("bin", expr(s"(cum - ntok) div $budget"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("source", "bin")
}
