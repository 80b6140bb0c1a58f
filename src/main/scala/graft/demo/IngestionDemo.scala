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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val store = new StateStore(root)
    val pipeline = new IngestionPipeline(store)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamedBlock]

    def block(n: Long, step: String) = StreamedBlock(
      s"a$n", s"a${n - 1}", n, step,
      Seq(TabletRowM(1, "balances", n, s"acct${n % 3}", s"v$n".getBytes, false)), Nil)

    val q = pipeline.start(source.toDS(), s"$root/ckpt", triggerMillis = 50)
    source.addData(
      block(0, "irreversible"), block(1, "irreversible"), block(2, "irreversible"),
      block(3, "new"), block(4, "new"))
    q.processAllAvailable()
    q.stop()

    println(s"durable rows: ${store.tabletRows.count()}")
    println(s"checkpoint:   ${store.checkpoint(StateStore.GlobalCheckpointKey)}")
    println(s"fork head:    ${pipeline.forkDB.head} (LIB ${pipeline.forkDB.lib})")
    val spec = pipeline.speculativeTabletRows("a4").getOrElse(Nil)
    println(s"speculative:  ${spec.map(_.count()).sum} rows on branch a4")
    val asOf = TemporalReads.readTabletAt(store.tabletRows, "balances", 4, spec)
    println("as-of h=4 with overlay:")
    asOf.collect().foreach(r =>
      println(s"  ${r.getString(0)} -> ${new String(r.getAs[Array[Byte]](2))} (h=${r.getLong(1)})"))
    spark.stop()
  }
}
