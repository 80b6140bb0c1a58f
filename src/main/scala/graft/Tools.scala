package graft

import org.apache.spark.sql.SparkSession
import graft.store.{Backfill, StateStore}
import graft.streaming.{BlockArchiveSource, IngestionPipeline}

/** Operational CLI — the Spark analogue of the reference app's modes
  * (app/fluxdb/app.go:38–41: inject / reproc-shard / reproc-inject; the
  * gRPC "server" mode has no analogue — the DataFrame API is the query
  * surface) plus its repair tools (reindex, prune, shard reconciliation).
  *
  * Usage: `sbt "runMain graft.Tools <command> <args...>"`
  *
  *   inject <root> <archiveDir> <ckptDir>     stream a block archive into the store
  *   shard <mutationsParquet> <out> <n>       reproc-shard: mutations → n shard files
  *   inject-shard <shardPath> <i> <root>      reproc-inject: replay shard i
  *   shard-status <root> <n>                  per-shard progress report
  *   finalize-sharding <root> <n>             global checkpoint + drop shard markers
  *   reindex <root> [maxHeight] [lowerBound] [dryRun]
  *   reindex-tablet <root> <tablet>
  *   prune <root> <tablet> <frequency>        snapshot retention prune
  *   compact <root>                           fold per-batch dirs + checkpoint log
  *   checkpoint <root>                        print the live global checkpoint
  *   read-tablet <root> <tablet> <height>     snapshot-aware as-of read
  */
object Tools {

  def run(args: Seq[String])(implicit spark: SparkSession): String = args.toList match {
    case "inject" :: root :: archive :: ckpt :: Nil =>
      val pipeline = new IngestionPipeline(new StateStore(root))
      val q = pipeline.start(BlockArchiveSource.readStream(spark, archive), ckpt)
      q.processAllAvailable()
      q.stop()
      run(Seq("checkpoint", root))
    case "shard" :: mutations :: out :: n :: Nil =>
      Backfill.run(spark.read.parquet(mutations), out, n.toInt)
      s"sharded $mutations into $n shards at $out"
    case "inject-shard" :: shardPath :: i :: root :: Nil =>
      Backfill.injectShard(spark, shardPath, i.toInt, new StateStore(root))
      s"injected shard $i"
    case "shard-status" :: root :: n :: Nil =>
      new StateStore(root).verifyAllShardsWritten(n.toInt).collect()
        .map(r => s"${r.getString(0)} height=${r.get(1)} ${r.getString(2)}")
        .mkString("\n")
    case "finalize-sharding" :: root :: n :: Nil =>
      val cp = new StateStore(root).finalizeSharding(n.toInt)
      s"finalized at height ${cp.height} (block ${cp.blockId})"
    case "reindex" :: root :: rest =>
      val dry = rest.contains("dryRun")
      val pos = rest.filterNot(_ == "dryRun")
      val maxH = pos.headOption.map(_.toLong).getOrElse(Long.MaxValue)
      val lower = pos.drop(1).headOption.getOrElse("")
      val (tablets, entries) =
        new StateStore(root).reindexTablets(maxH, lower, dryRun = dry)
      s"${if (dry) "would reindex" else "reindexed"} $entries entries across $tablets tablets"
    case "reindex-tablet" :: root :: tablet :: Nil =>
      new StateStore(root).reindexTablet(tablet)
        .map(h => s"reindexed $tablet at height $h")
        .getOrElse("re-index not required")
    case "prune" :: root :: tablet :: freq :: Nil =>
      val kept = new StateStore(root).pruneTabletSnapshots(tablet, freq.toInt)
      s"kept snapshot heights ${kept.mkString(",")}"
    case "compact" :: root :: Nil =>
      val store = new StateStore(root)
      val t = store.compactTabletRows()
      val e = store.compactSingletEntries()
      store.compactCheckpoints()
      s"compacted $t tablet-row and $e singlet-entry batch dirs; checkpoint log folded"
    case "checkpoint" :: root :: Nil =>
      new StateStore(root).checkpoint(StateStore.GlobalCheckpointKey)
        .map(cp => s"checkpoint height=${cp.height} block=${cp.blockId}")
        .getOrElse("no checkpoint")
    case "read-tablet" :: root :: tablet :: height :: Nil =>
      // The server mode's flagship read (read.go:35–178), snapshot-aware.
      new StateStore(root).readTabletAt(tablet, height.toLong).collect()
        .map(r => s"${r.getString(0)} h=${r.getLong(1)} " +
          new String(r.getAs[Array[Byte]](2), "UTF-8"))
        .mkString("\n")
    case other =>
      throw new IllegalArgumentException(
        s"unknown command: ${other.mkString(" ")} (see Tools scaladoc)")
  }

  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(args.toSeq))
    spark.stop()
  }
}
