package graft

import graft.functions.SkewAgg
import org.apache.spark.sql.functions._

class SkewAggSpec extends SparkTestBase {
  import spark.implicits._

  test("salted sum/count equal the direct aggregation on a skewed key") {
    // 90% of rows land on one hot key.
    val df = spark.range(10000)
      .select(when(col("id") % 10 === 0, concat(lit("k"), col("id") % 7))
        .otherwise(lit("hot")).as("k"),
        (col("id") % 101).as("v"))
    val directRows = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val saltedSum = SkewAgg.saltedSum(df, Seq("k"), "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedCount = SkewAgg.saltedCount(df, Seq("k"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedSum.keySet === directRows.keySet)
    directRows.foreach { case (k, (s, n)) =>
      assert(saltedSum(k) === s, s"sum mismatch for $k")
      assert(saltedCount(k) === n, s"count mismatch for $k")
    }
    assert(directRows.nonEmpty)
  }

  test("salted partial stage fans out even IDENTICAL duplicate rows of a hot key") {
    // Every row is byte-identical — a content-derived salt would collapse
    // them all into one bucket (the exact pathology salting must fix).
    val df = spark.range(1000).select(lit("hot").as("k"), lit(1L).as("v"))
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
    val groups = salted.groupBy("k", "__salt").count().collect()
    assert(groups.length > 1, "all duplicate rows landed on one salt bucket")
    // And the public API still aggregates duplicates exactly.
    val out = SkewAgg.saltedSum(df, Seq("k"), "v", 8).collect()
    assert(out.length === 1 && out.head.getLong(1) === 1000L)
  }

  test("AQE splits a skewed sort-merge-join partition at runtime — the " +
    "join-side complement to salted aggregation (SURVEY §4)") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // Also force the post-shuffle coalesce off so partition sizes stay
      // observable, and the join to SMJ (no broadcast escape hatch).
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Hot key 0 carries ~10 MB of fact rows; 100 cold keys carry a few
      // rows each — one shuffle partition dwarfs the median.
      val fact = spark.range(100000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 100).as("k"),
        concat(lit("p"), lpad(col("id").cast("string"), 200, "x")).as("pad"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("dv"))
      // Aggregate over the payload so column pruning can't drop it from
      // the shuffle (a bare count() would shuffle only the join key).
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("bytes"))
      val row = joined.collect()(0)
      assert(row.getLong(0) === 100000L && row.getLong(1) > 0L)
      // After execution AQE has re-planned: the final plan must show the
      // skew-split SMJ (isSkewJoin renders as "skew=true").
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
