package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model._
import graft.read.TemporalReads
import graft.store.StateStore
import graft.streaming.{IngestionPipeline, StreamedBlock}

/** End-to-end usage sample of the ingestion + read path (the library's
  * streaming surface): blocks stream in with fork metadata, irreversible
  * blocks land in Parquet with a checkpoint, and an as-of read overlays the
  * speculative branch. Run: `sbt "runMain graft.demo.IngestionDemo"`. */
object IngestionDemo {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Optional arg: reuse an existing store root (restart/replay semantics).
    val root =
      if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft-demo").toString
    val store = new StateStore(root)
    // Tiny index threshold so the demo's 3 mutations trigger a snapshot
    // build inside the commit flow (production default: 25,000).
    val pipeline = new IngestionPipeline(store, indexMinMutations = 2)
    implicit val sqlCtx = spark.sqlContext

    def block(n: Long, step: String) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, step,
      Seq(TabletRowM(1, "balances", n, s"acct${n % 3}", s"v$n".getBytes, false)),
      Seq(SingletEntryM(1, "total_supply", n, s"supply-$n".getBytes, false)))

    // Blocks arrive as one-block FILES in a tailed archive directory (the
    // concrete source, reference pipeline.go:37–62): one file pre-exists,
    // one appears while the query is running.
    import graft.streaming.BlockArchiveSource
    val archive = s"$root/blocks"
    BlockArchiveSource.writeArchiveFile(
      Seq(block(0, "irreversible"), block(1, "irreversible"), block(2, "irreversible")),
      archive)
    val q = pipeline.start(
      BlockArchiveSource.readStream(spark, archive), s"$root/ckpt", triggerMillis = 50)
    q.processAllAvailable()
    BlockArchiveSource.writeArchiveFile(
      Seq(block(3, "new"), block(4, "new")), archive)
    q.processAllAvailable()
    q.stop()

    println(s"durable rows: ${store.tabletRows.count()}")
    println(s"checkpoint:   ${store.checkpoint(StateStore.GlobalCheckpointKey)}")
    println(s"fork head:    ${pipeline.forkDB.head} (LIB ${pipeline.forkDB.lib})")
    val spec = pipeline.speculativeTabletRows("a4").getOrElse(Nil)
    println(s"speculative:  ${spec.map(_.count()).sum} rows on branch a4")
    println(s"snapshot:     ${store.latestTabletSnapshot("balances")
      .map { case (h, df) => s"at_height=$h keys=${df.count()}" }.getOrElse("none")}")
    val singletAt1 = store.readSingletEntryAt("total_supply", 1).collect()
      .map(r => new String(r.getAs[Array[Byte]](2))).mkString
    println(s"singlet@h1:   $singletAt1 (history depth ${store.readSingletEntries("total_supply").count()})")
    // Retention prune: write two more snapshot versions (each built at the
    // height it is recorded at), keep first+last.
    Seq(3L, 4L).foreach { h =>
      store.writeTabletSnapshot(
        graft.snapshot.Snapshots.buildTabletIndex(store.tabletRows, "balances", h),
        "balances", h,
        graft.snapshot.Snapshots.squelchCount(store.tabletRows, "balances", h))
    }
    val keptHeights = store.pruneTabletSnapshots("balances", pruneFrequency = 99)
    println(s"pruned:       kept snapshot heights ${keptHeights.mkString(",")}")
    val asOf = store.readTabletAt("balances", 4, spec) // snapshot ∪ tail ∪ overlay
    println("as-of h=4 with overlay:")
    asOf.collect().foreach(r =>
      println(s"  ${r.getString(0)} -> ${new String(r.getAs[Array[Byte]](2))} (h=${r.getLong(1)})"))

    // Streaming analytics over an event stream: watermarked window agg +
    // keyed-state sessionization (event-time timeout).
    import graft.streaming.StreamingAnalytics
    import graft.streaming.StreamingAnalytics.Event
    import java.sql.Timestamp
    val events = MemoryStream[Event]
    def e(u: Long, min: Long, v: Double = 1.0) =
      Event(u, "click", new Timestamp(min * 60000L), v)
    val win = StreamingAnalytics
      .hourlyWindowCounts(events.toDF().toDF("user_id", "event_type", "ts", "value"))
      .writeStream.format("memory").queryName("demo_win")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    val sess = StreamingAnalytics
      .sessionize(events.toDS().withWatermark("ts", "0 seconds"), gapMillis = 10 * 60000L)
      .writeStream.format("memory").queryName("demo_sess")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    events.addData(e(1, 1), e(1, 5), e(2, 62))
    win.processAllAvailable(); sess.processAllAvailable()
    events.addData(e(1, 30)) // gap > 10 min closes user 1's session
    win.processAllAvailable(); sess.processAllAvailable()
    win.stop(); sess.stop()
    println("windowed counts:")
    spark.table("demo_win").orderBy("window_start", "event_type").collect()
      .foreach(r => println(s"  ${r.getTimestamp(0)} ${r.getString(1)} n=${r.getLong(2)}"))
    println("closed sessions:")
    spark.table("demo_sess").collect().foreach(r =>
      println(s"  user=${r.getLong(0)} [${r.getLong(1) / 60000}m..${r.getLong(2) / 60000}m] n=${r.getLong(3)}"))

    // Skew-resistant aggregation: salted two-phase sum equals the direct
    // aggregation on a 90%-hot-key dataset.
    import org.apache.spark.sql.functions.{when => sWhen, col => sCol, lit => sLit, concat, sum => sSum}
    val skewed = spark.range(100000).select(
      sWhen(sCol("id") % 10 === 0, concat(sLit("k"), sCol("id") % 7))
        .otherwise(sLit("hot")).as("k"),
      (sCol("id") % 101).as("v"))
    val direct = skewed.groupBy("k").agg(sSum("v").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.functions.SkewAgg.saltedSum(skewed, Seq("k"), "v", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"salted agg:   keys=${direct.size} equal=${direct == salted} " +
      s"hot=${salted("hot")}")

    // Custom expressions are registered for SQL via GraftExtensions.
    println("SQL surface:")
    spark.sql("SELECT graft_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS dot, " +
      "graft_word_shingles('the quick brown fox', 3) AS shingles")
      .collect().foreach(r =>
        println(s"  graft_dot=${r.getDouble(0)} shingles=${r.getSeq[String](1).mkString("|")}"))
    spark.stop()
  }
}
