package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge

/** The composed curation pass a training-data pipeline actually materializes
  * — the individual report operators (`p_quality_gopher`, `p_dedup_exact*`,
  * `p_dedup_minhash_lsh`/`p_dedup_cluster`, `p_decontaminate`,
  * `p_mix_weights`/`p_mix_resample`) chained into one per-document decision:
  *
  *   1. drop held-out eval sources (they are the benchmark, not the corpus);
  *   2. Gopher quality rules (reuses the `p_quality_gopher` query verbatim);
  *   3. exact dedup among survivors — keeper = min doc_id per md5(text);
  *   4. near-dup collapse — verified MinHash-LSH pairs restricted to
  *      survivors, connected components ([[DedupCluster.labels]]), keep each
  *      component's min member;
  *   5. decontamination — drop docs whose 3-gram overlap with the eval
  *      slice reaches `contaminationPctMax` (the same shingle construction
  *      as `p_decontaminate`, parameterized by `evalSources`; the REPORT
  *      query keeps its canonical src0/src1 slice and 10% flag).
  *      The default cut is 80% — "verbatim contamination" — because the
  *      threshold must be calibrated to the corpus's base overlap rate:
  *      on this synthetic ~40-word vocabulary every doc shares ≥18% of
  *      its 3-grams with the eval slice at sf0.1 (measured), so the 10%
  *      cut a real web corpus uses (base rate ≈ 0) would return an empty
  *      corpus here. Real deployments tune this the same way: pick the
  *      knee above the corpus's accidental-overlap distribution;
  *   6. mixture resampling — uniform-target source weights RECOMPUTED over
  *      the surviving corpus, per-doc copy count = floor(weight) +
  *      md5-hash bernoulli on frac(weight) (deterministic, never rand();
  *      same formula as `p_mix_resample`, which derives weights from the
  *      RAW corpus — here the weights reflect what dedup kept).
  *
  * 100 TB posture: every stage is one of the already-audited shapes — the
  * rules are scan-local, both dedups are hash/band equi-joins, the flag and
  * keep joins are id equi-joins on ever-shrinking survivor sets, and the
  * weight table is #sources rows broadcast back. Nothing here adds a new
  * shuffle class on top of the component operators.
  */
object CurationPipeline {

  /** Default held-out slice — matches `p_decontaminate`'s eval stand-in. */
  val DefaultEvalSources: Seq[String] = Seq("src0", "src1")

  /** Default contamination cut (percent of a doc's distinct 3-grams found
    * in the eval slice) — see the class note on calibration. */
  val DefaultContaminationPctMax: Int = 80

  private def queryFn(name: String): (SparkSession, String) => DataFrame =
    PipelineQueries.specs.find(_.name == name)
      .getOrElse(sys.error(s"unknown component query $name")).fn

  /** One derived stage chain: the survivor frames, the cache-managed
    * intermediates, and the eager local checkpoints ([[release]] drops all
    * three; only the first two re-persist after a clearCache). */
  private case class StageChain(frames: Seq[(String, DataFrame)],
      intermediates: Seq[DataFrame], checkpoints: Seq[DataFrame])

  /** Session-scoped memo for the derived stage chain, keyed by the full
    * parameter tuple: repeated `curate`/`stageCounts` calls with the same
    * parameters REUSE one set of persisted frames (and pay the eager
    * label-propagation work once) instead of accumulating a new copy per
    * invocation. Long-lived service callers drop a configuration with
    * [[release]]; `catalog.clearCache()` only drops the CacheManager
    * entries — the chain re-persists on next use, recomputing from the
    * eager `pruned` checkpoint (whose blocks clearCache does not touch). */
  private val stageMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Seq[String], Int), StageChain]()

  private def stagesShared(s: SparkSession, dir: String,
      evalSources: Seq[String],
      contaminationPctMax: Int): Seq[(String, DataFrame)] = {
    val chain = stageMemo.computeIfAbsent(
      (s, dir, evalSources, contaminationPctMax),
      _ => stages(s, dir, evalSources, contaminationPctMax))
    // Re-persist after an external clearCache — same contract as
    // PipelineQueries.minhashVerifiedPairsShared. The eager checkpoints
    // are RDD-block-backed, outside the CacheManager: clearCache leaves
    // them alone, so they need no re-persist.
    (chain.frames.map(_._2) ++ chain.intermediates).foreach { df =>
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist()
    }
    chain.frames
  }

  /** Drop one configuration's cached frames, intermediates, and checkpoint
    * blocks (no-op for a configuration never derived). Frames previously
    * returned for this configuration must not be acted on afterwards:
    * their lineage bottoms out in the freed checkpoint. */
  def release(s: SparkSession, dir: String,
      evalSources: Seq[String] = DefaultEvalSources,
      contaminationPctMax: Int = DefaultContaminationPctMax): Unit =
    Option(stageMemo.remove((s, dir, evalSources, contaminationPctMax)))
      .foreach { chain =>
        (chain.frames.map(_._2) ++ chain.intermediates)
          .foreach(_.unpersist(blocking = false))
        chain.checkpoints.foreach(GraftBridge.freeLocalCheckpoint)
      }

  /** Survivor sets after each stage, in order, as
    * `(stageName, docs(doc_id, source, ntok, grp, h_mod))`, plus the heavy
    * persisted intermediates. The text column is consumed AT THE SCAN —
    * the exact-dedup group key and the resample bernoulli draw are both
    * md5-derived, so only two fixed-width columns flow through the stage
    * joins, never the document body (at 100 TB the text IS the table;
    * shuffling it through five stages would dominate the job). */
  private def stages(s: SparkSession, dir: String,
      evalSources: Seq[String],
      contaminationPctMax: Int): StageChain = {
    val raw = s.read.parquet(s"$dir/documents.parquet")
    val isEval = col("source").isin(evalSources: _*)
    val base = raw
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        md5(col("text")).as("grp"),
        (conv(substring(md5(concat(col("text"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
          % lit(1000000L)).as("h_mod"))

    val train = base.filter(!isEval)

    val qualityKeep = queryFn("p_quality_gopher")(s, dir)
      .filter(col("keep") === 1).select("doc_id")
    val quality = train.join(qualityKeep, "doc_id")

    val exactKeepers = quality
      .groupBy("grp")
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exact = quality.join(exactKeepers, "doc_id")

    // Verified near-dup pairs restricted to current survivors; component
    // labels over that subgraph; drop every member that is not its
    // component's min. The persisted survivor id set is tiny relative to
    // the corpus — both restriction joins prune pair traffic early.
    // labels() is eager (driver union-find or checkpointed propagation),
    // so `pruned` is materialized immediately as an EAGER localCheckpoint
    // — its lineage is truncated BEFORE the labels checkpoint is freed, so
    // a later recomputation (cache eviction, executor loss of ordinary
    // cached blocks) never walks into freed blocks. The same
    // no-lineage-to-recompute trade as DedupCluster.clusters applies to
    // the checkpoint blocks themselves. Free is a no-op on the driver
    // union-find path — no LogicalRDD in labels' plan.
    val ids = exact.select("doc_id").persist()
    val pairs = PipelineQueries.minhashVerifiedPairsShared(s, dir)
      .join(ids.select(col("doc_id").as("da")), "da")
      .join(ids.select(col("doc_id").as("db")), "db")
      .select("da", "db")
    val labels = DedupCluster.labels(s, pairs)
    val pruned = labels
      .filter(col("doc") =!= col("rep"))
      .select(col("doc").as("doc_id"))
      .localCheckpoint(true)
    GraftBridge.freeLocalCheckpoint(labels)
    ids.unpersist()
    val nearDup = exact.join(pruned, Seq("doc_id"), "left_anti")

    // Same shingle construction as p_decontaminate, parameterized by
    // evalSources (the report query's slice is fixed at src0/src1 — it
    // cannot stand in for a custom eval set). One row per train doc WITH
    // shingles; docs too short to shingle cannot be contaminated — left
    // join, null ⇒ keep.
    val evalSh = PipelineQueries.shingleRows(raw.filter(isEval))
      .select("sh").distinct()
    val trainSh = PipelineQueries.shingleRows(raw.filter(!isEval)).persist()
    val tot = trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hit = trainSh.join(evalSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("nc"))
    val flags = tot.join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nc"), lit(0L)).as("n_contaminated"), col("n_shingles"))
    val clean = nearDup.join(flags, Seq("doc_id"), "left")
      .filter(coalesce(col("n_contaminated"), lit(0L)) * 100 <
        lit(contaminationPctMax.toLong) * coalesce(col("n_shingles"), lit(1L)))
      .drop("n_contaminated", "n_shingles")

    StageChain(
      Seq("a_raw" -> train, "b_quality" -> quality, "c_exact_dedup" -> exact,
        "d_near_dedup" -> nearDup, "e_decontaminated" -> clean),
      intermediates = Seq(trainSh),
      checkpoints = Seq(pruned))
  }

  /** Survivor-weighted uniform-target resample over the final stage's
    * survivors. Totals are cast to DECIMAL before the ×1e6 scaling: a
    * 100 TB corpus holds ~1e13 tokens, and `total_tokens * 1000000`
    * overflows BIGINT there (the DuckDB oracle computes the same
    * expression in HUGEINT — integer math must not be the divergence). */
  private def resample(survivors: DataFrame): DataFrame = {
    val per = survivors.groupBy("source")
      .agg(sum(col("ntok")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    val weights = per.crossJoin(broadcast(tot))
      .select(col("source"),
        expr("CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000) div " +
          "(CAST(n_sources AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
          .as("weight_ppm"))
    survivors
      .join(broadcast(weights), "source")
      .select(col("doc_id"), col("source"), col("ntok").as("n_tokens"),
        col("weight_ppm"),
        (expr("weight_ppm div 1000000") +
          when(col("h_mod") < col("weight_ppm") % lit(1000000L), lit(1L))
            .otherwise(lit(0L))).as("n_repeats"))
  }

  private def funnelOf(st: Seq[(String, DataFrame)]): DataFrame =
    st.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("sum_tokens"))
    }.reduce(_ unionByName _).orderBy("stage")

  /** The curated corpus: one row per kept document —
    * `(doc_id, source, n_tokens, weight_ppm, n_repeats)`, resampling
    * weights computed over the SURVIVING corpus. */
  def curate(s: SparkSession, dir: String,
      evalSources: Seq[String] = DefaultEvalSources,
      contaminationPctMax: Int = DefaultContaminationPctMax): DataFrame =
    resample(stagesShared(s, dir, evalSources, contaminationPctMax).last._2)

  /** Stage survival audit `(stage, n_docs, sum_tokens)` — the composed
    * pipeline's funnel report (`p_curate_funnel` generalized to the full
    * stage chain). Each stage plan embeds its predecessors; the narrow
    * (5-column) survivor frames are persisted (via the shared chain) so
    * the five aggregates pay the chain once instead of O(stages²)
    * re-derivations. */
  def stageCounts(s: SparkSession, dir: String,
      evalSources: Seq[String] = DefaultEvalSources,
      contaminationPctMax: Int = DefaultContaminationPctMax): DataFrame =
    funnelOf(stagesShared(s, dir, evalSources, contaminationPctMax))

  /** Both outputs over ONE stage-chain derivation — the curated corpus and
    * its funnel audit share the persisted survivor frames instead of each
    * re-running the chain (the `Tools curate` verb consumes this). */
  def curateWithFunnel(s: SparkSession, dir: String,
      evalSources: Seq[String] = DefaultEvalSources,
      contaminationPctMax: Int = DefaultContaminationPctMax)
      : (DataFrame, DataFrame) = {
    val st = stagesShared(s, dir, evalSources, contaminationPctMax)
    (resample(st.last._2), funnelOf(st))
  }
}
