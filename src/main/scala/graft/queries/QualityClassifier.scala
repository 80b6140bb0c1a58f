package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear quality classifier (fastText shape, Joulin et al. 2016)
  * shared by the batch query `p_quality_classifier` and the streaming
  * front door — the same scoring expression backs both, so the batch
  * oracle verifies the stream's stage too.
  *
  * Words hash into [[Buckets]] feature buckets; md5-derived integer
  * micro-unit weights stand in for a trained model's coefficients (a
  * real model = swap the map contents — nothing else changes). The model
  * rides inside the scan as a map literal: scoring is one HOF fold per
  * row, no shuffle, stateless — exactly what a streaming stage needs. */
object QualityClassifier {

  val Buckets = 64

  /** Bucket weights in [-1e6, 1e6] micro-units. */
  def weights: Array[Long] =
    Array.tabulate(Buckets) { b =>
      (java.lang.Long.parseLong(MinHashLsh.md5hex(s"qw_$b").substring(0, 8), 16)
        % 2000001L) - 1000000L
    }

  private def weightMap: Column =
    map(weights.zipWithIndex.flatMap { case (w, b) =>
      Seq(lit(b.toLong), lit(w)) }: _*)

  /** Sum of bucket weights over the words of `text`, in micro-units.
    * Bucket = the shared [[MinHashLsh.h32]] (the Spark/DuckDB-parity
    * hash) mod [[Buckets]]. */
  def scoreMicro(text: Column): Column =
    aggregate(
      transform(split(text, " "), w =>
        element_at(weightMap, MinHashLsh.h32(w) % Buckets)),
      lit(0L), (acc, x) => acc + x)

  /** `df` + (`cls_score_micro`, `cls_keep`): keep iff the linear score
    * is non-negative. */
  def withScore(df: DataFrame): DataFrame =
    df.withColumn("cls_score_micro", scoreMicro(col("text")))
      .withColumn("cls_keep", (col("cls_score_micro") >= 0L).cast("long"))
}
