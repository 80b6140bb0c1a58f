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

  test("salted partial stage actually fans the hot key out") {
    val df = spark.range(1000).select(lit("hot").as("k"), col("id").as("v"))
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(8)))
    val groups = salted.groupBy("k", "__salt").count().collect()
    assert(groups.length > 1, "all rows landed on one salt bucket")
  }
}
