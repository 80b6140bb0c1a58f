package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayDotProduct

/** IVF coarse-quantized ANN as a reusable operator, parameterized by the
  * centroid TABLE — the production path where centroids come from
  * training ([[trainKMeans]]), unlike `p_ann_ivf`'s md5-derived literals
  * (kept there because the DuckDB oracle needs bit-reproducible
  * centroids).
  *
  * Scale shape (unchanged from the query): centroids broadcast, one scan
  * of the base table, per-probe `WindowGroupLimit` top-k. A centroid
  * refresh is a data swap, not a plan change.
  */
object Ivf {

  private def dot(a: Column, b: Column): Column = ArrayDotProduct.dot(a, b)

  /** Per-(vector, centroid) dot scores: `embs` is (vec_id, embedding);
    * `centroids` is (k, cvec). Adds the L2 norm for downstream cosine. */
  def scored(embs: DataFrame, centroids: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
      .crossJoin(broadcast(centroids))
      .withColumn("dk", dot(col("embedding"), col("cvec")))
      .drop("cvec")

  /** `vec_id → cluster`: argmax_k of the centroid dot, ties to lowest k. */
  def assigned(scoredDf: DataFrame): DataFrame =
    scoredDf.groupBy("vec_id")
      .agg(max_by(col("k"), struct(col("dk"), (-col("k")).as("nk"))).as("cluster"))

  /** ANN search: for each probe (rows matching `probeFilter`), rank its
    * `nprobe` nearest centroid lists and return the cosine top-`topK`
    * neighbors found there. Same plan as `p_ann_ivf`. */
  def search(
      embs: DataFrame, centroids: DataFrame,
      probeFilter: Column, nprobe: Int = 2, topK: Int = 3): DataFrame = {
    val sc = scored(embs, centroids).persist()
    try {
      val base = assigned(sc)
        .join(sc.filter(col("k") === 0).select("vec_id", "embedding", "norm"), "vec_id")
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
          col("norm").as("nb"), col("cluster"))
      val wc = Window.partitionBy("vec_id").orderBy(col("dk").desc, col("k"))
      val probes = sc.filter(probeFilter)
        .withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= nprobe)
        .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
          col("norm").as("na"), col("k").as("cluster"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(probes).join(base, Seq("cluster"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= topK)
        .select("query_id", "neighbor_id", "rank", "cos")
        .orderBy("query_id", "rank")
        // The persisted scores feed three consumers lazily; materialize
        // before unpersisting.
        .localCheckpoint(true)
    } finally sc.unpersist()
  }

  /** Cluster-blocked greedy prune over per-(vector, centroid) scores —
    * the SemDeDup core shared by [[semanticDedup]] and the
    * oracle-verified `p_dedup_semantic` (which passes its
    * bit-reproducible md5-centroid scores): within each nearest-centroid
    * cluster, prune every vector with a lower-id neighbor at cosine >=
    * `cosineThreshold`. Output `(pruned_id, cluster, keeper_id,
    * n_dup_lower)` sorted by pruned id. */
  def semanticPrune(scoredDf: DataFrame, cosineThreshold: Double): DataFrame = {
    val base = assigned(scoredDf)
      .join(scoredDf.filter(col("k") === 0).select("vec_id", "embedding", "norm"),
        "vec_id")
    val a = base.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("norm").as("na"), col("cluster"))
    val b = base.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("norm").as("nb"), col("cluster"))
    val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
    a.join(b, Seq("cluster")).filter(col("vec_a") < col("vec_b"))
      .filter(cos >= cosineThreshold)
      .groupBy(col("vec_b").as("pruned_id"), col("cluster"))
      .agg(min(col("vec_a")).as("keeper_id"), count(lit(1)).as("n_dup_lower"))
      .orderBy("pruned_id")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) with a caller-supplied
    * quantizer TABLE `(k, cvec)` — e.g. [[trainKMeans]] output. The
    * pairwise work is confined to within-cluster join partitions, so cost
    * tracks sum(|cluster|²) controlled by K (a corpus-scale deployment
    * trains K ~10⁵ so clusters stay small); the assignment pass is one
    * scan against the broadcast centroid table. A quantizer refresh is a
    * data swap, not a plan change. */
  def semanticDedup(embs: DataFrame, centroids: DataFrame,
      cosineThreshold: Double = 0.45): DataFrame = {
    val sc = scored(embs, centroids).persist()
    // The scores feed the assignment and both pair sides lazily;
    // materialize before unpersisting (same pattern as [[search]]).
    try semanticPrune(sc, cosineThreshold).localCheckpoint(true)
    finally sc.unpersist()
  }

  /** Spherical k-means (Lloyd's loop) over the embeddings: assign by
    * max-dot against UNIT centroids (≡ cosine), recompute each centroid
    * as its members' per-dimension mean, re-normalize. Deterministic
    * given `init` (seed with the hash centroids, or a fixed row sample);
    * an empty cluster keeps its previous centroid. At 100 TB training
    * runs on a SAMPLE — each iteration is one scan + one tiny
    * (k × dim) aggregate collect, and the result feeds [[search]] as a
    * data swap. */
  def trainKMeans(
      embs: DataFrame, iters: Int, init: Seq[Array[Double]]): Seq[Array[Double]] = {
    val spark = embs.sparkSession
    import spark.implicits._
    val dim = init.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var cents = init.map(normalize)
    (0 until iters).foreach { _ =>
      val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("k", "cvec")
      val means = embs.select(col("vec_id"), col("embedding"))
        .join(assigned(scored(embs, cdf)), "vec_id")
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          val v = new Array[Double](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          c -> v
        }
      cents = cents.zipWithIndex.map { case (old, c) =>
        means.get(c).map(normalize).getOrElse(old)
      }
    }
    cents
  }
}
