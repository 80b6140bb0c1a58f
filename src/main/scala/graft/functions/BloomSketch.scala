package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom sketches probed by Spark's BUILT-IN `might_contain` expression —
  * no Scala UDF anywhere on the probe path, so membership tests stay
  * inside whole-stage codegen (the same expression Spark's own runtime
  * semi-join filters use).
  *
  * Convention: items are inserted and probed as `xxhash64(value)` LONGS —
  * exactly what `might_contain` evaluates against a deserialized sketch
  * (`mightContainLong`), and the hashing runs through the codegen'd
  * `xxhash64` expression on BOTH sides, so build and probe can never
  * drift. The serialized form is the spark-sketch V1 layout the built-in
  * deserializes. */
object BloomSketch {

  /** Fold `df(col)`'s values into one serialized sketch: xxhash64 per
    * value inside the scan, then OR-merged per-partition partial filters
    * (treeAggregate — the same mergeable-sketch shape as
    * `df.stat.bloomFilter`, which cannot be used here because it inserts
    * raw strings, a convention `might_contain` does not test). */
  def build(df: DataFrame, column: String, fpp: Double = 0.001): Array[Byte] = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df.select(xxhash64(col(column))).as[Long]
    val n = math.max(hashes.count(), 1L)
    val bf = hashes.rdd.treeAggregate(BloomFilter.create(n, fpp))(
      (f, h) => { f.putLong(h); f },
      (a, b) => { a.mergeInPlace(b); a })
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership probe as a pure built-in expression column.
    * `BloomFilterMightContain` is not in the SQL function registry (Spark
    * reserves it for its own runtime join filters), so the Column is
    * built from the Catalyst expression directly. */
  def mightContain(sketch: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftBridge.expression(lit(sketch)),
        GraftBridge.expression(xxhash64(value))))
  }
}
