package graft

import graft.queries.GraphRank

/** The parameterized PageRank core: deep iteration counts must stay
  * exact (vs an independent Scala integer model) AND bounded in plan
  * size — the localCheckpoint cadence cuts lineage every 5 rounds, so a
  * 12-iteration run analyzes the same few joins as a 2-iteration run. */
class GraphRankSpec extends SparkTestBase {

  private val n = 20L
  private val rawEdges: Seq[(Long, Long)] =
    (0L until n).flatMap(i => Seq((i, (i * 7 + 1) % n), (i, (i * 3 + 2) % n)))
      .filter(e => e._1 != e._2).distinct

  /** Independent integer-PageRank model (same BIGINT scale + truncation). */
  private def model(iters: Int): Map[Long, Long] = {
    val out = rawEdges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var score = (0L until n).map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      out.foreach { case (src, dsts) =>
        val c = score(src) / dsts.size
        dsts.foreach(d => inflow(d) += c)
      }
      score = (0L until n)
        .map(v => v -> (150000000L + (85L * inflow(v)) / 100L)).toMap
    }
    score
  }

  test("12 iterations with checkpoint cadence equal the Scala integer model") {
    implicit val s = spark
    import s.implicits._
    val nodes = (0L until n).toDF("vec_id")
    val edges = rawEdges.toDF("src", "dst")
    val got = GraphRank.pageRank(nodes, edges, iterations = 12, checkpointEvery = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === model(12))
    // And at a depth below the first checkpoint, identical code path.
    val got3 = GraphRank.pageRank(nodes, edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3 === model(3))
    // The size-gated broadcast plan (small-graph path) is arithmetic-
    // identical to the shuffle plan.
    val gotBc = GraphRank.pageRank(nodes, edges, iterations = 3,
      broadcastSmall = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotBc === model(3))
    val gotBc12 = GraphRank.pageRank(nodes, edges, iterations = 12,
      checkpointEvery = 5, broadcastSmall = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotBc12 === model(12))
  }

  test("the analyzed plan stays bounded: a 12-iteration run carries no more " +
    "joins than a 2-iteration run (lineage cut at the checkpoints)") {
    implicit val s = spark
    import s.implicits._
    val nodes = (0L until n).toDF("vec_id")
    val edges = rawEdges.toDF("src", "dst")
    def joins(iters: Int): Int =
      "Join".r.findAllIn(
        GraphRank.pageRank(nodes, edges, iters, checkpointEvery = 5)
          .queryExecution.analyzed.toString).size
    assert(joins(12) <= joins(2),
      "deep runs must not accumulate per-iteration joins in one plan")
  }
}
