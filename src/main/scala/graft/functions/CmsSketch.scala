package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd Count-Min-Sketch frequency probe — the CMS counterpart of
  * [[BloomSketch.mightContain]]'s built-in upgrade. Spark ships a CMS
  * BUILDER (`df.stat.countMinSketch` / the `count_min_sketch` aggregate)
  * but no probe expression — estimates historically went through a
  * closure UDF over a broadcast sketch, the one non-codegen island left
  * on the sketch-family probe paths. This expression closes that gap:
  * the deserialized sketch rides the generated class's references array
  * (`addReferenceObj`, exactly how Spark's own
  * `BloomFilterMightContain` carries its filter), and the per-row probe
  * is a direct `estimateCount` call inside whole-stage codegen — no
  * UDF boxing, no Scala closure dispatch.
  *
  * Probe convention matches the builder's insert convention:
  * `CountMinSketchImpl.add(String)` hashes the string's UTF-8 bytes,
  * identical to `estimateCount(byte[])` over `UTF8String.getBytes` — so
  * build and probe agree without materializing a `java.lang.String` per
  * row (the UDF paid that conversion on every probe).
  *
  * The sketch is a case-class FIELD (serialized form), not a child
  * expression: a multi-megabyte binary literal in the tree would bloat
  * every plan string and constant-folding pass; the expression
  * deserializes once per instance (transient lazy) on the driver and the
  * live object is what codegen references. */
case class CmsEstimateCount(sketchBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType.sql}")

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(value: Any): Any =
    cms.estimateCount(value.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // CountMinSketchImpl is Externalizable: the DESERIALIZED sketch ships
    // in the codegen references array, so executors never re-parse bytes.
    val cmsRef = ctx.addReferenceObj("graftCms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cmsRef.estimateCount($v.getBytes());")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimateCount =
    copy(child = newChild)

  override def prettyName: String = "graft_cms_estimate_count"
}

object CmsSketch {
  /** Column-level probe: estimated frequency of `value` under the
    * serialized Count-Min sketch, as a codegen'd expression. */
  def estimateCount(sketch: Array[Byte], value: Column): Column =
    GraftBridge.column(
      CmsEstimateCount(sketch, GraftBridge.expression(value)))

  /** Serialize a built sketch for [[estimateCount]]. */
  def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }
}
