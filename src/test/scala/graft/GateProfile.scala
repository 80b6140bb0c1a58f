package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the streaming gate queries — phase-level
  * wall-clock/job/stage/task breakdown of t_changefeed_cdc /
  * t_changefeed_emit_fresh / t_materialized_state, the evidence tool
  * behind the rounds' merge-path job-count claims. Lives in the TEST
  * source set (it is measurement tooling, not product code — the
  * round-21 advice):
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.GateProfile emit_fresh"
  *
  * Env knobs: GATE_REPS (default 2), GATE_JOB_NAMES=1 to print one line
  * per Spark job with its call site. Session config mirrors Bench
  * (local dir on /dev/shm, 64 MB broadcast threshold) so the measured
  * job counts are the bench's.
  */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "cdc"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          if (sys.env.contains("GATE_JOB_NAMES")) {
            val desc = Option(j.properties)
              .map(_.getProperty("spark.job.description", "")).getOrElse("")
            val site = j.stageInfos.map(_.name).headOption.getOrElse("")
            println(s"[gate-job] $site | $desc")
          }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      })

    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t = System.nanoTime()
      println(f"[gate] $tag%-28s ${(t - t0) / 1e9}%6.2f s  " +
        f"jobs=${jobs.getAndSet(0)}%3d stages=${stages.getAndSet(0)}%3d " +
        f"tasks=${tasks.getAndSet(0)}%4d")
      t0 = t
    }

    val reps = sys.env.getOrElse("GATE_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"== rep $rep ($which)")
      t0 = System.nanoTime()
      which match {
        case "cdc" =>
          val s = spark
          val root = java.nio.file.Files.createTempDirectory("gp-cf").toString
          val store = new graft.store.StateStore(root,
            graft.store.StateStore.ManifestCommit)(s)
          val m = graft.queries.TemporalQueries.mutations(s, sfDir)
            .filter(col("tablet_id") === "error")
          val sink = "gp_" + java.util.UUID.randomUUID().toString.replace("-", "")
          val prevParts = s.conf.get("spark.sql.shuffle.partitions")
          s.conf.set("spark.sql.shuffle.partitions", "8")
          lap("setup")
          try {
            val q = store.changefeedDiffStream().writeStream.format("memory")
              .queryName(sink)
              .option("checkpointLocation",
                java.nio.file.Files.createTempDirectory("gp-cf-ck").toString)
              .outputMode("append").start()
            lap("stream start")
            try {
              Seq(-1L, 1500L, 3000L, 4500L, 6000L).sliding(2).zipWithIndex.foreach {
                case (Seq(lo, hi), i) =>
                  store.writeTabletRows(
                    m.filter(col("height") > lo && col("height") <= hi)
                      .select(lit(1).as("collection"), col("tablet_id"), col("height"),
                        col("primary_key"), col("value").cast("binary").as("value"),
                        col("is_deletion")),
                    commitId = s"w$i")
                  lap(s"commit w$i")
                  q.processAllAvailable()
                  lap(s"drain  w$i")
              }
            } finally q.stop()
            lap("stop")
            val n = s.table(sink).collect().length
            lap(s"collect ($n rows)")
          } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)

        case "emit_fresh" =>
          val s = spark
          implicit val is = s
          val target = java.nio.file.Files.createTempDirectory("gp-ef").toString
          val m = graft.queries.TemporalQueries.mutations(s, sfDir)
            .filter(col("tablet_id") === "view")
          val prevParts = s.conf.get("spark.sql.shuffle.partitions")
          s.conf.set("spark.sql.shuffle.partitions", "8")
          lap("setup")
          try {
            val t = graft.streaming.StateMaterializer.targetTable(target)
            val keyCols = graft.streaming.StateMaterializer.KeyCols
            Seq((-1L, 2000L), (2000L, 4000L), (4000L, 6000L)).zipWithIndex.foreach {
              case ((lo, hi), i) =>
                val windowRows = m.filter(col("height") > lo && col("height") <= hi)
                  .select(lit(1).as("collection"), col("tablet_id"), col("height"),
                    col("primary_key"), col("value").cast("binary").as("value"),
                    col("is_deletion"))
                val winners = graft.read.TemporalReads
                  .latestPerKey(windowRows, keyCols, Seq("value", "collection"))
                  .select(graft.model.Schemas.tabletRows.fieldNames.map(col).toSeq: _*)
                t.merge(winners, keyCols, orderCol = "height",
                  deleteCol = "is_deletion", commitId = s"w$i",
                  keepTombstones = true)
                lap(s"merge w$i")
            }
            graft.streaming.StateMaterializer.compact(target, numFiles = 4)
            lap("compact")
            val sink = "gp_" + java.util.UUID.randomUUID().toString.replace("-", "")
            val q2 = graft.streaming.ManifestChangefeed
              .stream(s, target, onRewrite = "emitFresh")
              .writeStream.format("memory").queryName(sink)
              .option("checkpointLocation",
                java.nio.file.Files.createTempDirectory("gp-ef-ck").toString)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            require(q2.awaitTermination(300000L))
            q2.stop()
            lap("drain")
            val n = s.table(sink).collect().length
            lap(s"collect ($n rows)")
          } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)

        case "mat_state" =>
          val s = spark
          implicit val is = s
          val root = java.nio.file.Files.createTempDirectory("gp-mat").toString
          val target = java.nio.file.Files.createTempDirectory("gp-mat-t").toString
          val store = new graft.store.StateStore(root,
            graft.store.StateStore.ManifestCommit)(s)
          val m = graft.queries.TemporalQueries.mutations(s, sfDir)
            .filter(col("tablet_id") === "view")
          lap("setup")
          Seq((-1L, 2000L), (2000L, 4000L), (4000L, 6000L)).zipWithIndex.foreach {
            case ((lo, hi), i) =>
              store.writeTabletRows(
                m.filter(col("height") > lo && col("height") <= hi)
                  .select(lit(1).as("collection"), col("tablet_id"), col("height"),
                    col("primary_key"), col("value").cast("binary").as("value"),
                    col("is_deletion")),
                commitId = s"w$i")
              lap(s"commit w$i")
          }
          val prevParts = s.conf.get("spark.sql.shuffle.partitions")
          s.conf.set("spark.sql.shuffle.partitions", "8")
          try {
            val q = graft.streaming.StateMaterializer.start(store, target,
              java.nio.file.Files.createTempDirectory("gp-mat-ck").toString)
            try q.processAllAvailable() finally q.stop()
            lap("materializer drain")
            val n = graft.streaming.StateMaterializer.read(target)
              .filter(col("tablet_id") === "view").collect().length
            lap(s"serving read ($n rows)")
          } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
    }
    spark.stop()
  }
}
