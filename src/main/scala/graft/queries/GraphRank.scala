package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge

/** Integer-arithmetic PageRank (Page et al. 1999) over an edge list —
  * the iterative core of `p_graph_pagerank`, parameterized so a real
  * 20-iteration centrality run plans the same bounded DAG as the
  * 3-iteration oracle query.
  *
  * All arithmetic is BIGINT at a 10⁹ scale with truncating division
  * (score//outdeg contributions, (85·inflow)//100 damping, +0.15·10⁹
  * teleport) so engine floats never meet. Each iteration is the canonical
  * distributed shape: scores ⋈ outdeg (contribution), equi-join onto
  * edges by src, ONE groupBy(dst) sum with map-side combine, left join
  * back to the node set. Dangling nodes leak their mass — pinned
  * identically in the DuckDB oracle.
  *
  * Lineage control: every `checkpointEvery` iterations the score table is
  * cut with an eager `localCheckpoint` and the PREVIOUS checkpoint's
  * blocks are freed ([[GraftBridge.freeLocalCheckpoint]] — `clearCache()`
  * does not cover checkpoint RDDs), so arbitrarily many iterations hold
  * at most one materialized score generation plus a bounded plan tail.
  * The final result may root at the last checkpoint; callers looping far
  * beyond the default can free it the same way once consumed. */
object GraphRank {

  def pageRank(
      nodes: DataFrame, // column: vec_id
      edges: DataFrame, // columns: src, dst
      iterations: Int,
      checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var scores = nodes.select(col("vec_id"), lit(1000000000L).as("score"))
    var prevCkpt: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val inflow = scores
        .join(outdeg, col("vec_id") === col("src"))
        .select(col("vec_id").as("psrc"), expr("score div outdeg").as("c"))
        .join(edges.withColumnRenamed("src", "esrc"),
          col("psrc") === col("esrc"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      scores = nodes
        .join(inflow, col("vec_id") === col("dst"), "left")
        .select(col("vec_id"),
          expr("CAST(150000000 + (85 * coalesce(inflow, CAST(0 AS BIGINT)))" +
            " div 100 AS BIGINT)").as("score"))
      if (i % checkpointEvery == 0 && i < iterations) {
        val ck = scores.localCheckpoint(true)
        prevCkpt.foreach(GraftBridge.freeLocalCheckpoint)
        prevCkpt = Some(ck)
        scores = ck
      }
    }
    scores
  }
}
