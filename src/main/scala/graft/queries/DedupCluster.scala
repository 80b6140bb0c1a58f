package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge

/** Connected components over a verified near-dup pair list — the step a real
  * dedup pipeline runs after pair generation (keep one doc per component,
  * not one per pair). Reference-side analogue: the dedup keeps a single
  * representative per duplicate group.
  *
  * Two execution paths behind one exact semantics (component representative
  * = min doc_id in the component):
  *
  *   - DRIVER UNION-FIND when the edge list is small. After verification the
  *     pair graph is orders of magnitude smaller than the corpus (pairs are
  *     actual near-duplicates, not candidates), so even a 100 TB corpus
  *     commonly yields an edge list that fits on the driver; a path-halving
  *     union-find labels millions of edges in well under a second, versus
  *     one distributed join + shuffle + eager checkpoint PER ROUND for the
  *     iterative algorithm. Same shape as the size-gated jaccard verify:
  *     gate on measured size, never on hope.
  *
  *   - DISTRIBUTED MIN-LABEL PROPAGATION past the gate: each doc starts as
  *     its own label and repeatedly takes the min over its neighbors until
  *     fixpoint — O(component diameter) rounds (near-dup clusters are
  *     shallow), each round one equi-join + one map-side-combined min agg.
  *     The standard web-scale CC loop; no transitive-closure
  *     materialization. Each round eagerly `localCheckpoint`s to truncate
  *     lineage, and frees the PREVIOUS round's checkpoint blocks — without
  *     that, a long session leaks one block set per round
  *     (GraftBridge.freeLocalCheckpoint).
  *
  * Both paths are proven row-identical in PipelineQueriesSpec (the gate
  * forced both ways on the same graph).
  */
object DedupCluster {

  /** Edge-count ceiling for the driver path. The driver materializes
    * collected Rows, a tuple array, and a boxed label map — budget
    * ~100 bytes/edge, so 1M edges ≈ 100 MB: safe under any default
    * driver heap. Env-overridable (malformed values fall back). */
  def driverMaxEdges: Long = parseDriverMax(sys.env.get("GRAFT_CLUSTER_DRIVER_MAX"))

  private[graft] def parseDriverMax(raw: Option[String]): Long =
    raw.flatMap(v => scala.util.Try(v.trim.toLong).toOption).getOrElse(1000000L)

  /** Cluster report over verified pairs `(da, db)`:
    * `(cluster_rep, n_members, max_doc)` sorted by representative. */
  def clusters(s: SparkSession, pairsIn: DataFrame,
      maxDriverEdges: Long = driverMaxEdges): DataFrame = {
    val l = labels(s, pairsIn, maxDriverEdges)
    // Materialize the report before dropping the labels checkpoint —
    // a freed localCheckpoint has no lineage to recompute from. (On the
    // driver path the free is a no-op: no LogicalRDD in the plan.)
    val out = summarize(l).localCheckpoint(true)
    GraftBridge.freeLocalCheckpoint(l)
    out
  }

  /** Per-member cluster labels `(doc, rep)` over verified pairs — the
    * member-level form of [[clusters]], same size gate. Docs in no pair are
    * absent (their implicit rep is themselves). Past the driver gate the
    * result is an eager localCheckpoint; callers that fully consume it may
    * free it via [[GraftBridge.freeLocalCheckpoint]]. */
  def labels(s: SparkSession, pairsIn: DataFrame,
      maxDriverEdges: Long = driverMaxEdges): DataFrame = {
    val pairs = pairsIn
      .select(col("da").cast("long").as("da"), col("db").cast("long").as("db"))
      .persist()
    val nEdges = pairs.count()
    val res =
      if (nEdges <= maxDriverEdges) driverLabels(s, pairs)
      else propagateLabels(s, pairs)
    pairs.unpersist()
    res
  }

  private def summarize(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("rep").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"), max(col("doc")).as("max_doc"))
      .orderBy("cluster_rep")

  /** Driver path: collect the verified edges, union-find with path halving.
    * Union attaches the larger root beneath the smaller, so a component's
    * root is always its min member — identical to the propagation fixpoint.
    */
  private def driverLabels(s: SparkSession, pairs: DataFrame): DataFrame = {
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = p
        p = gp
      }
      x
    }
    edges.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra < rb) parent.update(rb, ra)
      else if (rb < ra) parent.update(ra, rb)
    }
    val nodes = edges.iterator.flatMap { case (a, b) => Iterator(a, b) }.toSet
    import s.implicits._
    nodes.toSeq.map(n => (n, find(n))).toDF("doc", "rep")
  }

  /** Distributed path: min-label propagation to fixpoint. Returns the final
    * per-doc labels as an eager localCheckpoint (caller frees it). */
  private def propagateLabels(s: SparkSession, pairs: DataFrame): DataFrame = {
    val sym = pairs
      .unionByName(pairs.select(col("db").as("da"), col("da").as("db")))
      .toDF("a", "b")
      .persist()
    var labels = sym.select(col("a").as("doc")).distinct()
      .withColumn("rep", col("doc")).localCheckpoint(true)
    // sum() over an EMPTY label table (a corpus with no dup pairs) is
    // null, not 0 — guard it or the convergence check NPEs.
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum(col("rep"))).collect().head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var prevSum = labelSum(labels)
    var changed = true
    while (changed) {
      val nbr = sym
        .join(labels.select(col("doc").as("b"), col("rep").as("brep")), "b")
        .groupBy("a").agg(min(col("brep")).as("nrep"))
        .select(col("a").as("doc"), col("nrep"))
      // localCheckpoint truncates the lineage each round — an iterative
      // plan otherwise grows by two joins per round and re-executes from
      // the scan at every convergence check.
      val next = labels.join(nbr, Seq("doc"), "left")
        .select(col("doc"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      GraftBridge.freeLocalCheckpoint(labels)
      // Labels only ever decrease, so the label sum strictly decreases
      // until the fixpoint — one cheap aggregate per round instead of a
      // change-detection join.
      val s2 = labelSum(next)
      changed = s2 != prevSum
      prevSum = s2
      labels = next
    }
    sym.unpersist()
    labels
  }
}
