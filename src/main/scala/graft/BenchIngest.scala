package graft

import org.apache.spark.sql.SparkSession
import graft.model._
import graft.store.StateStore
import graft.streaming.{IngestionPipeline, StreamedBlock}

/** Ingestion-throughput bench against the reference's envelope: fluxdb
  * flushes at >5,000 writable rows or 1 s (pipeline.go:374–382), i.e. a
  * sustained design rate around 5k rows/s per node. This drives the same
  * commit path the streaming pipeline uses (fork bookkeeping, linearity
  * guard, parquet append, checkpoint-last) over synthetic blocks and
  * reports end-to-end rows/sec.
  *
  * Run: `sbt "runMain graft.BenchIngest [nBatches] [blocksPerBatch] [rowsPerBlock]"`
  */
object BenchIngest {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 20
    val blocksPerBatch = if (args.length > 1) args(1).toInt else 100
    val rowsPerBlock = if (args.length > 2) args(2).toInt else 50
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-ingest-bench").toString
    // GRAFT_COMMIT_PROTOCOL=manifest benches the object-store commit path.
    val proto =
      if (sys.env.get("GRAFT_COMMIT_PROTOCOL").contains("manifest"))
        StateStore.ManifestCommit
      else StateStore.RenameCommit
    val store = new StateStore(root, proto)
    val pipeline = new IngestionPipeline(store)

    def block(h: Long) = StreamedBlock(
      s"b$h", s"b${h - 1}", h, "irreversible",
      (0 until rowsPerBlock).map(i =>
        TabletRowM(1, s"t${i % 16}", h, f"pk${(h * rowsPerBlock + i) % 9973}%06d",
          s"value-$h-$i".getBytes("UTF-8"), false)),
      Nil)

    // Warm-up batch (session + codegen + parquet writer init).
    pipeline.commitBatch(Seq(block(0)).toDS(), -1)
    val rowsBeforeTimed = store.tabletRows.count()
    val t0 = System.nanoTime()
    var h = 1L
    (0 until nBatches).foreach { b =>
      val blocks = (h until h + blocksPerBatch).map(block)
      h += blocksPerBatch
      pipeline.commitBatch(blocks.toDS(), b)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = nBatches.toLong * blocksPerBatch * rowsPerBlock
    // Exclude the warm-up batch so written == rows is a real loss check.
    val written = store.tabletRows.count() - rowsBeforeTimed
    println(f"""{"metric":"ingest_rows_per_sec","value":${rows / secs}%.0f,"rows":$rows,"sec":$secs%.2f,"written":$written,"batches":$nBatches}""")
    spark.stop()
  }
}
