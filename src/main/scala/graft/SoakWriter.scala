package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.streaming.StateMaterializer

/** A SEPARATE-JVM PUBLISHER for [[SoakIngest]]: its own SparkSession and
  * [[graft.store.ManifestTable]] instance compacting the SAME serving
  * target the parent's materializer merges into every second — what a
  * co-located maintenance process is in production. What the in-JVM
  * concurrency specs cannot prove: the optimistic publish's exclusive
  * create, reservation blocking, fencing nonce, and time-based retry
  * budget exercised across REAL process boundaries (no shared JVM state,
  * no common lock — only the store's metadata objects serialize them).
  *
  * Every compaction here either wins its generation race outright or
  * re-derives and retries ([[graft.store.ManifestTable.replaceAllRetrying]]);
  * the parent's merges block-and-retry behind this process's
  * reservations and land after the publish. The parent's end-of-run
  * `serve_equiv_match` is the zero-lost-commits arbiter: if any
  * cross-process interleaving dropped or clobbered a commit, the serving
  * table would diverge from the store's own as-of read.
  *
  * Args: `targetPath seconds intervalMillis summaryFile`. Emits one JSON
  * line per compaction on stdout (inherited by the parent's log) and a
  * final summary JSON with this process's publish-contention counters.
  */
object SoakWriter {
  def main(args: Array[String]): Unit = {
    val target = args(0)
    val seconds = args(1).toLong
    val intervalMs = args(2).toLong
    val summaryFile = args(3)
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-soak-fork-writer")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ONE table instance for the whole run so the publish-contention
    // counters accumulate across compactions.
    val t = StateMaterializer.targetTable(target)

    var compactions = 0L
    var skipped = 0L
    var errors = 0L
    var lastMs = -1L
    val deadline = System.currentTimeMillis() + seconds * 1000L
    while (System.currentTimeMillis() < deadline) {
      try {
        // Skip until the materializer has published something to compact.
        if (t.currentGeneration().exists(_ > 0L)) {
          val t0 = System.currentTimeMillis()
          t.replaceAllRetrying(
            () => t.read()
              .repartitionByRange(8, StateMaterializer.KeyCols.map(col): _*)
              .sortWithinPartitions(StateMaterializer.KeyCols.map(col): _*),
            commitId = "fork-compact-" + java.util.UUID.randomUUID().toString)
          compactions += 1L
          lastMs = System.currentTimeMillis() - t0
          println(s"""{"soak_fork_writer":{"compactions":$compactions,""" +
            s""""compact_ms":$lastMs,"lost_races":${t.lostRaceCount.get()},""" +
            s""""fenced":${t.fencedPublishCount.get()},""" +
            s""""rebased":${t.rebasedMergeCount.get()},""" +
            s""""escalated":${t.escalatedMergeCount.get()}}}""")
        } else skipped += 1L
      } catch {
        case scala.util.control.NonFatal(e) =>
          errors += 1L
          println(s"""{"soak_fork_writer_error":"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(160).replace("\"", "'")
              .replace("\n", " ")}"}""")
      }
      Thread.sleep(intervalMs)
    }
    val summary = s"""{"fork_writer_compactions":$compactions,""" +
      s""""fork_writer_errors":$errors,"fork_writer_skipped":$skipped,""" +
      s""""fork_writer_last_ms":$lastMs,""" +
      s""""fork_writer_lost_races":${t.lostRaceCount.get()},""" +
      s""""fork_writer_takeovers":${t.leaseTakeoverCount.get()},""" +
      s""""fork_writer_fenced":${t.fencedPublishCount.get()},""" +
      s""""fork_writer_rebased":${t.rebasedMergeCount.get()},""" +
      s""""fork_writer_escalated":${t.escalatedMergeCount.get()},""" +
      s""""fork_writer_head_check":"${t.verifyHead().getOrElse("clean")}"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(summaryFile),
      summary.getBytes("UTF-8"))
    println(summary)
    spark.stop()
  }
}
