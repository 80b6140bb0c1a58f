package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: the standard two-phase salted shape.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer; at 100 TB a single pathological key (one token, one empty
  * document hash) can stall the stage. Salting splits each key into
  * `salts` sub-keys for the partial aggregate, then combines the partials
  * in a second (tiny) aggregation. Exact for any commutative+associative
  * aggregate (sum/count/min/max); AQE's skew handling covers joins, but
  * single-key aggregation skew still needs this shape.
  *
  * The salt is a round-robin over each row's position
  * (`monotonically_increasing_id % salts`) — NOT a hash of row content
  * (identical duplicate rows of a hot key would then share one salt, which
  * is exactly the case salting exists for) and NOT `rand()`.
  *
  * CONTRACT: the input must have deterministic partition contents AND
  * order — file scans and persisted/checkpointed datasets qualify; the
  * direct output of a shuffle does not (reduce-side fetch order can differ
  * across task attempts — the SPARK-23207 class of problem — which would
  * let a retried partial see different salts and double-count or drop
  * rows). The contract is ENFORCED by default: unless the caller vouches
  * with `assumeDeterministic = true`, the input is pinned with
  * `localCheckpoint()` before salting, so a retried task replays the exact
  * checkpointed blocks instead of re-running a nondeterministic lineage.
  */
object SkewAgg {

  private def saltCol(salts: Int) =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Pin partition contents/order unless the caller vouches for the input,
    * cutting the lineage via an eager localCheckpoint (blocks are reclaimed
    * by the ContextCleaner once the result is no longer referenced).
    *
    * A merely-`persist()`ed input is NOT exempt: persistence is an
    * optimization hint — an unmaterialized or evicted cache block
    * recomputes through the original (possibly nondeterministic) lineage
    * on retry, which is exactly the salt-desync hazard the pin closes.
    * Only the caller's explicit `assumeDeterministic` skips it. */
  private def pinned(df: DataFrame, assumeDeterministic: Boolean): DataFrame =
    if (assumeDeterministic) df else df.localCheckpoint()

  /** `SELECT key..., sum(value) GROUP BY key...` with two-phase salting.
    * Pass `assumeDeterministic = true` only for inputs with stable
    * partitioning (file scans, persisted datasets) to skip the pin. */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      salts: Int = 32,
      assumeDeterministic: Boolean = false): DataFrame = {
    require(salts > 0)
    val salted = pinned(df, assumeDeterministic).withColumn("__salt", saltCol(salts))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Count per key with two-phase salting. */
  def saltedCount(
      df: DataFrame,
      keyCols: Seq[String],
      salts: Int = 32,
      assumeDeterministic: Boolean = false): DataFrame = {
    require(salts > 0)
    val salted = pinned(df, assumeDeterministic).withColumn("__salt", saltCol(salts))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }
}
