package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed and sorted on the
  * join key join WITHOUT any exchange or sort — the storage layout the
  * 100 TB design relies on for repeated entity-key joins (mutations ⋈
  * snapshots, mutations ⋈ probe batches). Buckets are the write-time
  * equivalent of the shuffle both join sides would otherwise pay per query.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("join of co-bucketed tables runs with zero shuffle exchanges") {
    val muts = (0L until 2000L)
      .map(i => (s"t${i % 7}", i, s"pk${i % 13}", s"v$i"))
      .toDF("tablet_id", "height", "primary_key", "value")
    val other = (0L until 2000L)
      .map(i => (s"t${i % 7}", i, s"w$i"))
      .toDF("tablet_id", "at_height", "extra")
    spark.sql("DROP TABLE IF EXISTS b_muts")
    spark.sql("DROP TABLE IF EXISTS b_other")
    muts.write.bucketBy(4, "tablet_id").sortBy("tablet_id")
      .mode("overwrite").saveAsTable("b_muts")
    other.write.bucketBy(4, "tablet_id").sortBy("tablet_id")
      .mode("overwrite").saveAsTable("b_other")

    // Disable broadcast so the planner must pick the co-located path.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_muts").join(spark.table("b_other"), "tablet_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan did not use buckets:\n$plan")
      // 2000 rows over 7 keys: five keys get 286 rows, two get 285;
      // the self-key join yields sum(n_i^2).
      assert(joined.count() === 5L * 286 * 286 + 2L * 285 * 285)

      // Contrast: the same join over plain (unbucketed) data shuffles.
      val plainPlan = muts.join(other, "tablet_id")
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        "expected the unbucketed join to shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_muts")
      spark.sql("DROP TABLE IF EXISTS b_other")
    }
  }
}
