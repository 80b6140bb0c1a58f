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
}
