package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the jaccard pipeline. */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")

    val d = spark.read.parquet(s"$dir/documents.parquet").withColumn("grp", md5(col("text")))
    val members = d.select(col("grp"), col("doc_id")).persist()
    val reps = members.groupBy("grp").agg(min(col("doc_id")).as("doc_id"))
    val repDocs = d.join(reps, Seq("grp", "doc_id"))
    val sh = repDocs.select(col("doc_id"),
      explode(graft.functions.WordShingles.shingles(col("text"), 3)).as("sh"))
      .withColumn("h", h60(col("sh"))).persist()
    t("materialize sh")(sh.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy("doc_id").orderBy(col("h"), col("sh"))
    val prefix = sh.withColumn("rk", row_number().over(wOrd))
      .join(sizes, "doc_id")
      .filter(col("rk") <= expr("n - (n + 1) div 2 + 1"))
      .select(col("doc_id"), col("h")).persist()
    t("prefix index")(prefix.count())
    val a = prefix.select(col("doc_id").as("da"), col("h"))
    val b = prefix.select(col("doc_id").as("db"), col("h"))
    val cands = a.join(b, Seq("h")).filter(col("da") < col("db"))
      .select("da", "db").distinct().persist()
    t("cands")(cands.count())
    val repArr = sh.groupBy("doc_id")
      .agg(collect_list(col("h")).as("shs"), count(lit(1)).as("n"))
    val va = broadcast(repArr.select(col("doc_id").as("da"), col("shs").as("sa"), col("n").as("na")))
    val vb = broadcast(repArr.select(col("doc_id").as("db"), col("shs").as("sb"), col("n").as("nb")))
    val repPairs = cands.join(va, "da").join(vb, "db")
      .withColumn("n_common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(lit(2) * col("n_common") >= col("na") + col("nb") - col("n_common"))
    t("verify")(repPairs.count())
    spark.stop()
  }
}
