package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness: times one named query repeatedly (PROBE_N, default 3)
  * and prints its formatted plan. Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = sys.env.getOrElse("PROBE_N", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Shuffle/spill files on tmpfs: the virtio disk's kernel-time
      // spikes dominated bench variance at this data scale.
      .config("spark.local.dir", "/dev/shm/spark-graft")
      // Single-JVM local[32] with a large heap: 64 MB broadcasts are safe
      // and fast here (the default 10 MB is sized for small executors).
      // Corpus-derived frames stay guarded by their own size gates, which
      // read THIS threshold - at real corpus scale their estimates exceed
      // any sane setting and the joins fail over to shuffle plans.
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional broadcast-threshold override, for exercising size-gated
    // non-broadcast paths on scaled corpora.
    sys.env.get("PROBE_BC_THRESHOLD")
      .foreach(spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    sys.env.get("PROBE_OPEN_COST")
      .foreach(spark.conf.set("spark.sql.files.openCostInBytes", _))
    sys.env.get("PROBE_MIN_PARTS")
      .foreach(spark.conf.set("spark.sql.files.minPartitionNum", _))
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name == "entry") (s, _) => SparkEntry.entry(s)
      else SparkEntry.queries(name)
    if (sys.env.contains("PROBE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    // count() lets Catalyst prune projections (and eliminate sorts) the
    // aggregate doesn't need — fine for shuffle-bound queries, but a
    // scan-local operator's whole cost can vanish. PROBE_FULL=1 instead
    // folds every output column through xxhash64, forcing materialization
    // while still returning one row.
    val full = sys.env.contains("PROBE_FULL")
    (1 to n).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val c =
        if (full) df.selectExpr("count(*)", "bit_xor(xxhash64(struct(*)))")
          .collect().head.getLong(0)
        else df.count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    spark.stop()
  }
}
