package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (comma-separated names); the driver leaves it
    // unset and dumps everything.
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    // A crashed query must land in the ARTIFACT, never vanish from it:
    // swallowing to stderr made the driver's correctness JSON silently
    // omit the row (round 19: t_changefeed_emit_fresh — green at HEAD —
    // fell off the recorded board when one contended-host run tripped a
    // drain bound). Every failure is recorded in errors.json beside
    // oracle_sql.json, and errors.json is written UNCONDITIONALLY (empty
    // object when clean) so "no failures" and "harness died before
    // writing it" stay distinguishable.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      def attempt(): Unit = fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      try {
        try attempt()
        catch { case e1: Throwable if scala.util.control.NonFatal(e1) =>
          // One retry, NonFatal ONLY: the observed failure class is
          // transient host contention tripping a streaming-drain or
          // wait bound, not a wrong plan — a second attempt on a
          // settled host recovers the row instead of shrinking the
          // board. A fatal VM error (OOM, stack overflow) must NOT
          // re-run the heaviest query on a heap in unknown state; it
          // falls through to the recording layer below.
          System.err.println(s"[verify] $name failed " +
            s"(${e1.getMessage}); retrying once")
          spark.catalog.clearCache()
          attempt()
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed after retry: ${e.getMessage}")
        failures(name) =
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
      }
      // Queries persist shared intermediates (shingle indexes, simhash
      // tables); running all of them in one session would accumulate those
      // blocks. Same per-query hygiene as Bench.
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (failures.nonEmpty) System.err.println(
      s"[verify] ${failures.size} quer${if (failures.size == 1) "y" else "ies"} " +
        s"FAILED (recorded in errors.json): ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
