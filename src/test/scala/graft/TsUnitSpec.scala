package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}
import org.apache.spark.sql.functions._

import graft.queries.TemporalQueries

/** The timestamp-unit contract for the `events` corpus.
  *
  * The driver has regenerated `/root/testdata` with `ts` as TIMESTAMP(NANOS)
  * in one round and TIMESTAMP(MICROS) in another; `eventsWithTs` long-reads
  * the physical int64, so the unit MUST come from the parquet footer, never
  * from an assumption. This spec drives the same logical corpus through both
  * footer encodings and asserts the entry point yields identical nanosecond
  * values and identical hour/session bucketing — so neither regeneration
  * direction can silently re-break the event analytics again.
  */
class TsUnitSpec extends SparkTestBase {

  /** Logical corpus: ns timestamps spanning 3 hours with >30-min gaps so
    * both hour buckets and session splits are exercised. */
  private val rows: Seq[(Long, Long, Long, String, Double, String)] =
    (0L until 200L).map { i =>
      val ns = i * 137L * 1000000000L + (i % 7) * 2100L * 1000000000L
      (i, ns, i % 13, if (i % 3 == 0) "click" else "view", i * 0.5, s"""{"k":$i}""")
    }

  private def writeMicrosFixture(dir: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      import spark.implicits._
      rows.toDF("event_id", "ns", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(expr("ns div 1000")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** Spark cannot write TIMESTAMP(NANOS); use the parquet-hadoop example
    * writer to produce the footer shape the driver's older corpora had. */
  private def writeNanosFixture(dir: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter.builder(new Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ns, uid, typ, v, props) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", ns); g.add("user_id", uid)
      g.add("event_type", typ); g.add("value", v); g.add("props", props)
      writer.write(g)
    } finally writer.close()
  }

  private lazy val usDir = { val d = tmpDir("ts-us"); writeMicrosFixture(d); d }
  private lazy val nsDir = { val d = tmpDir("ts-ns"); writeNanosFixture(d); d }

  test("footer unit detection: µs → 1000, ns → 1") {
    assert(TemporalQueries.tsNanosPerTick(spark, s"$usDir/events.parquet") === 1000L)
    assert(TemporalQueries.tsNanosPerTick(spark, s"$nsDir/events.parquet") === 1L)
  }

  test("a TIMESTAMP(MILLIS) regeneration also normalizes (tick 1e6)") {
    val d = tmpDir("ts-ms")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      import spark.implicits._
      rows.toDF("event_id", "ns", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_millis(expr("ns div 1000000")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    assert(TemporalQueries.tsNanosPerTick(spark, s"$d/events.parquet") === 1000000L)
    val got = TemporalQueries.eventsWithTs(spark, d)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ns values round down to the ms grid — compare against the
    // ms-truncated logical corpus.
    val expected = rows.map { case (id, n, _, _, _, _) =>
      id -> (n / 1000000L) * 1000000L }.toMap
    assert(got === expected)
  }

  test("eventsWithTs yields identical nanosecond values through both encodings") {
    def tsById(dir: String): Map[Long, Long] =
      TemporalQueries.eventsWithTs(spark, dir)
        .select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val us = tsById(usDir); val ns = tsById(nsDir)
    assert(us.size === rows.size)
    assert(us === ns)
    val expected = rows.map { case (id, n, _, _, _, _) => id -> n }.toMap
    assert(ns === expected)
  }

  test("hour bucketing and session splits are encoding-invariant") {
    def buckets(dir: String): Seq[(Long, Long)] =
      TemporalQueries.eventsWithTs(spark, dir)
        .groupBy(expr("ts div 3600000000000").as("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val us = buckets(usDir); val ns = buckets(nsDir)
    assert(us === ns)
    assert(us.size > 1, "fixture must span multiple hour buckets")
  }

  test("the live testdata footer carries a timestamp-annotated ts (unit contract)") {
    // Whatever unit the driver regenerates with, detection must resolve it;
    // today's corpora are µs. All three scale factors must agree with
    // each other — a mixed-unit regeneration would corrupt cross-sf
    // comparisons silently.
    val ticks = Seq("sf0.001", "sf0.01", "sf0.1").map { sf =>
      TemporalQueries.tsNanosPerTick(spark, s"/root/testdata/$sf/events.parquet")
    }
    ticks.foreach(t => assert(Set(1L, 1000L, 1000000L).contains(t)))
    assert(ticks.distinct.size === 1, s"mixed ts units across scale factors: $ticks")
  }
}
