package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the flagship temporal reads (not part of the driver
  * contract): replicates the events-derived mutation stream `factor`× in
  * HEIGHT — copy i shifts every height by i·span, so each key's history
  * really is `factor`× deeper, the exact axis a long-lived deployment
  * grows along — materializes it once to /dev/shm parquet (height-sorted
  * within tablet ranges, the compacted-store layout), builds a TabletIndex
  * snapshot at 95% of max height (untimed: ingestion maintains snapshots
  * incrementally), then times min-of-3 with full materialization:
  *
  *   read_full     readTabletAt at max height, no snapshot (O(history)
  *                 scan + argmax)
  *   read_snap     readTabletAtWithSnapshot — hydration semi-join +
  *                 tail-bounded argmax (what StateAsOfRule now plans)
  *   asof_join     batch as-of join, probe count growing with history
  *   asof_join_recent_{full,snap}
  *                 the production point-lookup shape — a fixed-rate probe
  *                 set above the snapshot height — through the full-history
  *                 route vs the snapshot-pruned route (identical results;
  *                 growth comparison is the point)
  *   singlet_hist  full singlet history, most recent first
  *
  * Usage: runMain graft.TemporalProbe <factor> [baseDir]
  */
object TemporalProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val root = s"/dev/shm/graft-tprobe/${new java.io.File(baseDir).getName}-${factor}x"
    val mutPath = s"$root/mutations.parquet"
    val snapPath = s"$root/snapshot.parquet"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

    val span = graft.queries.TemporalQueries.mutations(spark, baseDir)
      .agg(max(col("height"))).head().getLong(0) + 1
    val maxH = span * factor - 1
    val snapH = maxH * 95L / 100L

    val mutZPath = s"$root/mutations_z.parquet"
    // Existence keyed on the LAST artifact written: a corpus root left by
    // an older probe build (mutations.parquet present, the z layout not)
    // must regenerate everything, not crash on the missing half.
    if (!fs.exists(new org.apache.hadoop.fs.Path(mutZPath))) {
      val m0 = graft.queries.TemporalQueries.mutations(spark, baseDir)
      val rep = m0
        .crossJoin(broadcast(spark.range(factor.toLong).toDF("copy")))
        .select(col("tablet_id"),
          (col("height") + col("copy") * lit(span)).as("height"),
          col("primary_key"),
          concat(col("value"), lit("#"), col("copy")).as("value"),
          col("is_deletion"))
      // 1 MB row groups: the default 128 MB block gives these probe-scale
      // files ONE row group each, collapsing row-group pruning to file
      // pruning; a production tablet spans thousands of row groups, and
      // the smaller block reproduces that granularity at probe scale
      // (identical setting for both layouts — granularity is not the
      // variable under test).
      rep.repartitionByRange(cpus.toInt, col("tablet_id"), col("height"))
        .sortWithinPartitions("tablet_id", "height")
        .write.mode("overwrite")
        .option("parquet.block.size", (1024 * 1024).toString)
        .parquet(mutPath)
      val m = spark.read.parquet(mutPath)
      // The SAME corpus in the Z-ORDER layout (compactTabletRowsInterleaved's
      // clustering), for the point-read layout comparison.
      val dims = graft.store.ZOrder.dimsOf(m, "primary_key", "height")
      m.withColumn("__z",
          graft.store.ZOrder.zValue(col("primary_key"), col("height"), dims))
        .repartitionByRange(cpus.toInt, col("tablet_id"), col("__z"))
        .sortWithinPartitions(col("tablet_id"), col("__z"))
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", (1024 * 1024).toString)
        .parquet(mutZPath)
      graft.snapshot.Snapshots.buildTabletIndex(m, "click", snapH)
        .write.mode("overwrite").parquet(snapPath)
    }
    val mz = spark.read.parquet(mutZPath)
    val m = spark.read.parquet(mutPath)
    val snap = spark.read.parquet(snapPath)
    println(s"corpus: ${m.count()} mutations, span $span × $factor, " +
      s"maxH $maxH, snapshot at $snapH (${snap.count()} keys)")

    // The store read path: hydration scan bounded at min(snapshot height)
    // (computed untimed here, as the store computes it from the tiny
    // parquet-backed snapshot before building the plan).
    val lo = graft.snapshot.Snapshots.hydrationBoundOf(snap)
    println(s"hydration lower bound: ${lo.get} (band ${snapH - lo.get} of $maxH heights)")

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "read_full" -> (() =>
        graft.read.TemporalReads.readTabletAt(m, "click", maxH)),
      "read_snap_unbounded" -> (() =>
        graft.snapshot.Snapshots.readTabletAtWithSnapshot(m, snap, snapH, "click", maxH)),
      "read_snap" -> (() =>
        graft.snapshot.Snapshots.readTabletAtWithSnapshot(
          m, snap, snapH, "click", maxH, Nil, lo)),
      "asof_join" -> (() => {
        val probes = m.filter(col("height") % 9973 === 0)
          .select(col("height").as("probe_id"), col("tablet_id"),
            col("primary_key"), (col("height") + 500).as("at_height"))
        graft.read.TemporalReads.asOfJoin(m, probes)
      }),
      // The same join through the snapshot-pruned route, but with probes
      // restricted to the snapshot's tablet ABOVE the snapshot height —
      // the production shape (point lookups against recent state). Its
      // full-history twin runs the identical probe set for a like-for-like
      // growth comparison.
      "asof_join_recent_full" -> (() => {
        val probes = m.filter(col("height") % 997 === 0 &&
            col("height") > lit(snapH) && col("tablet_id") === "click")
          .select(col("height").as("probe_id"), col("tablet_id"),
            col("primary_key"), (col("height") + 500).as("at_height"))
        graft.read.TemporalReads.asOfJoin(m, probes)
      }),
      "asof_join_recent_snap" -> (() => {
        val probes = m.filter(col("height") % 997 === 0 &&
            col("height") > lit(snapH) && col("tablet_id") === "click")
          .select(col("height").as("probe_id"), col("tablet_id"),
            col("primary_key"), (col("height") + 500).as("at_height"))
        graft.snapshot.Snapshots.asOfJoinWithSnapshot(
          m, probes, snap, snapH, "click", lo)
      }),
      "singlet_hist" -> (() =>
        graft.read.TemporalReads.readSingletEntries(
          m.withColumnRenamed("tablet_id", "singlet_id"), "signup")
          .drop(graft.read.TemporalReads.SourceRankCol)),
      // Point-read layout comparison: one key's as-of lookup against the
      // height-sorted layout (every row group of the tablet holds every
      // key) vs the Z-ORDER layout (row groups carry tight key ranges, so
      // the pushed primary_key predicate row-group-prunes). Identical
      // semantics, identical results — layout is the only variable.
      "point_read_heightsorted" -> (() =>
        graft.read.TemporalReads.readTabletRowAt(m, "click", "0042", maxH)),
      "point_read_zorder" -> (() =>
        graft.read.TemporalReads.readTabletRowAt(mz, "click", "0042", maxH)),
      // What the z layout costs the OTHER read: the snapshot-bounded tail
      // scan that the height-sorted layout serves optimally.
      "read_snap_zorder" -> (() =>
        graft.snapshot.Snapshots.readTabletAtWithSnapshot(
          mz, snap, snapH, "click", maxH, Nil, lo)))

    // INTERLEAVED sampling (the Bench lesson): N sweeps over the whole set
    // rather than back-to-back runs of one query, so a multi-second host
    // noise window can't own every sample of a single query.
    val n = sys.env.getOrElse("PROBE_N", "5").toInt
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to n).foreach { _ =>
      queries.foreach { case (name, mk) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk().selectExpr("count(*)", "bit_xor(xxhash64(struct(*)))").collect()
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    queries.foreach { case (name, _) =>
      val runs = samples(name)
      println(f"TPROBE factor=$factor query=$name min=${runs.min}%.2f " +
        runs.map(r => f"$r%.2f").mkString("runs=[", ",", "]"))
    }

    // SCAN-ROWS instrument: tmpfs makes wall-clock layout-blind (I/O is
    // page-cached), so the layout comparison's honest metric is what the
    // scans actually DECODE — each FileSourceScan's numOutputRows counts
    // the rows of the row groups that survived min/max pruning (Spark
    // evaluates parquet pushdown at row-group granularity), i.e. the I/O
    // that becomes wall-clock on a cluster reading object storage.
    queries.foreach { case (name, mk) =>
      spark.catalog.clearCache()
      val q = mk().selectExpr("count(*)", "bit_xor(xxhash64(struct(*)))")
      q.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          Seq(s.metrics("numOutputRows").value)
        case other =>
          other.children.flatMap(scans) ++
            other.subqueries.flatMap(scans) ++ (other match {
              case q_ : org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                scans(q_.plan)
              case _ => Nil
            })
      }
      val rows = scans(q.queryExecution.executedPlan).sum
      println(f"TPROBE factor=$factor query=$name scan_rows=$rows")
    }
    spark.stop()
  }
}
