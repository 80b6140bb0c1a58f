package graft

import graft.model.{CollectionRegistry, CollectionSpec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

class RegistryExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("collection registry: registration rules and typed JSON decode") {
    CollectionRegistry.clear()
    val spec = CollectionRegistry.register(
      CollectionSpec(0x0001, "balances", isSinglet = false,
        valueSchema = Some(StructType(Seq(
          StructField("token", StringType), StructField("amount", LongType))))))
    intercept[IllegalArgumentException] {
      CollectionRegistry.register(spec) // duplicate id
    }
    intercept[IllegalArgumentException] {
      CollectionRegistry.register(CollectionSpec(0xFFF5, "reserved", isSinglet = true))
    }
    val df = Seq(("""{"token":"tk","amount":42}""".getBytes("UTF-8"), 1L))
      .toDF("value", "height")
    val decoded = CollectionRegistry.decoded(df, spec)
    val row = decoded.select($"value_decoded.token", $"value_decoded.amount").collect().head
    assert(row.getString(0) === "tk" && row.getLong(1) === 42L)
    CollectionRegistry.clear()
  }

  test("GraftExtensions registers graft_dot and graft_word_shingles for SQL") {
    // Extensions apply at session build time. Clear the default session so
    // getOrCreate builds a NEW session over the existing SparkContext (do
    // NOT stop it — the context is shared with the other suites).
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val dot = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dot === 11.0)
      val sh = s2.sql(
        "SELECT graft_word_shingles('a b c d', 3) AS s")
        .collect().head.getSeq[String](0)
      assert(sh === Seq("a b c", "b c d"))
      val ic = s2.sql(
        "SELECT graft_sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 9L)) AS c")
        .collect().head.getLong(0)
      assert(ic === 2L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("stateAsOf custom logical plan: the injected rule rewrites the marker " +
    "into the readTabletAt plan, results match exactly, and operators " +
    "stacked over the marker keep resolving") {
    import org.apache.spark.sql.functions.col
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val dir = "/root/testdata/sf0.001"
      val m = graft.queries.TemporalQueries.mutations(s2, dir)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, String)] =
        df.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      val viaNode = graft.plans.StateAsOf.stateAsOf(m, "click", 8000L)
      val direct = graft.read.TemporalReads.readTabletAt(m, "click", 8000L)
      assert(rows(viaNode) === rows(direct))
      assert(rows(viaNode).nonEmpty)
      // The marker is planned away entirely.
      assert(!viaNode.queryExecution.optimizedPlan.toString.contains("StateAsOf"))
      // Composability: a caller predicate stacked OVER the marker resolves
      // and agrees with the function-call form.
      val overMarker = graft.plans.StateAsOf.stateAsOf(m, "click", 8000L)
        .filter(col("primary_key") < "0500").count()
      val overDirect = direct.filter(col("primary_key") < "0500").count()
      assert(overMarker === overDirect && overMarker > 0L)
      // A child missing the read's columns fails loudly (the analyzer
      // wraps the node's IllegalArgumentException).
      val ex = intercept[Exception] {
        graft.plans.StateAsOf.stateAsOf(
          m.drop("value"), "click", 8000L).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(m2 =>
        m2.contains("must carry column") || m2.contains("cannot be resolved")),
        messages(ex).mkString(" | "))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
