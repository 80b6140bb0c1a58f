package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.snapshot.Snapshots
import graft.store.StateStore

/** Index-build cost bench: demonstrates that the steady-state
  * (incremental) snapshot build is bounded by TAIL size while the
  * from-scratch build grows with HISTORY size — the property the reference
  * gets from `startHeight = prev.AtHeight + 1` (indexing.go:265–271).
  *
  * Grows one tablet's history in equal steps; at each step head it times
  *   (a) a from-scratch `buildTabletIndex` over `[0, head]`, and
  *   (b) an incremental `buildTabletIndexIncremental` seeded from the
  *       previous step's snapshot over the constant-size tail,
  * then writes the step's snapshot so the next step has a seed. Expected
  * output: (a) climbs roughly linearly with step, (b) stays flat.
  *
  * Run: `sbt "runMain graft.BenchIndexBuild [steps] [rowsPerStep]"`
  */
object BenchIndexBuild {
  def main(args: Array[String]): Unit = {
    val steps = if (args.length > 0) args(0).toInt else 5
    val rowsPerStep = if (args.length > 1) args(1).toInt else 400000
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-idx-bench").toString
    val store = new StateStore(root)

    def timeSec[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    (1 to steps).foreach { step =>
      val lo = (step - 1).toLong * rowsPerStep
      val head = step.toLong * rowsPerStep - 1
      // Distinct height per row; 50k-key space so the index stays snapshot-
      // sized while history keeps growing past it.
      val chunk = spark.range(lo, head + 1).select(
        lit(1).as("collection"), lit("t1").as("tablet_id"),
        col("id").as("height"), format_string("pk%06d", pmod(col("id"), lit(50000))).as("primary_key"),
        encode(concat(lit("v"), col("id")), "utf-8").as("value"),
        (pmod(col("id"), lit(101)) === lit(0)).as("is_deletion"))
      store.writeTabletRows(chunk, f"step$step%03d")

      // Same work on both sides of the comparison (aggregate + count); the
      // snapshot WRITE happens outside both timers, so the numbers isolate
      // build cost.
      val (_, scratchSec) =
        timeSec(Snapshots.buildTabletIndex(store.tabletRows, "t1", head).count())
      val incSec = store.latestTabletSnapshotMeta("t1", head) match {
        case Some((prevH, _, prevIdx)) =>
          val tail = store.tabletRows.filter(
            col("tablet_id") === lit("t1") &&
              col("height") > lit(prevH) && col("height") <= lit(head))
          val (_, s) = timeSec(Snapshots.buildTabletIndexIncremental(tail, prevIdx).count())
          s
        case None => scratchSec
      }
      store.writeTabletSnapshot(
        Snapshots.buildTabletIndex(store.tabletRows, "t1", head), "t1", head,
        Snapshots.squelchCount(store.tabletRows, "t1", head), 1)
      println(f"""{"step":$step,"history_rows":${head + 1},"tail_rows":$rowsPerStep,""" +
        f""""scratch_sec":$scratchSec%.2f,"incremental_sec":$incSec%.2f}""")
    }
    spark.stop()
  }
}
