package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Shuffle/spill files on tmpfs: the virtio disk's kernel-time
      // spikes dominated bench variance at this data scale.
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (codegen compiler, parquet footer reads, shuffle
    // machinery) so the first timed query doesn't pay JVM start-up costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        // Drop the previous run's persisted intermediates: accumulated
        // caches otherwise crowd the heap and GC noise dominates the tail
        // of the run (measured: up to 3x variance on the shingle queries).
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val v =
        try {
          val first = once()
          // Queries at or above 0.3 s re-run twice and report the MIN of 3:
          // a single sample mixes one-time analysis/codegen and ±40% host
          // noise into round-over-round deltas (both measured), so single
          // runs could not adjudicate even 2x regressions. The min is the
          // most reproducible point estimate of the query's actual cost.
          // (Threshold lowered from 1.0 s in round 9: with ~70 sub-second
          // queries the single-sample noise summed to ±7 s on the TOTAL.)
          if (first >= 0.3) (first +: (1 to 2).map(_ => once())).min else first
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            // A crashed query must not read as a fast run: -1, not its
            // time-to-failure.
            -1.0
        }
      name -> v
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // `failed` makes totals across runs with different crash sets honestly
    // incomparable at a glance — a crashed heavy query must not read as a
    // speedup.
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
