package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. 2003) as one compiled
  * pass: word `gramN`-grams of a space-separated text, each hashed with the
  * 32-bit md5-derived hash (`conv(substring(md5(g),1,8),16,10)` — the first
  * four digest bytes as an unsigned int), a sliding window of `window` over
  * the hash sequence keeping each window's MINIMUM, distinct-ed.
  *
  * Exactly the declarative chain it replaces (pinned in FunctionsSpec):
  *
  *   gs  = transform(slice(ws, 1, size(ws) - gramN + 1), ...)   // grams
  *   hs  = transform(gs, g -> conv(substring(md5(g),1,8),16,10))
  *   fps = array_distinct(transform(
  *           sequence(1, greatest(size(hs) - window + 1, 1)),
  *           i -> array_min(slice(hs, i, window))))
  *
  * — four interpreted HOF lambdas and three intermediate arrays per row,
  * the whole scan cost of `p_winnow_fingerprint`. Texts with fewer than
  * `gramN` words yield an empty array (callers filter those out); when the
  * gram count is below `window`, the single window over the whole (short)
  * hash sequence applies, exactly like the `greatest(..., 1)` guard.
  * Distinct keeps first-occurrence order (no consumer depends on order).
  */
case class WinnowFingerprints(child: Expression, gramN: Int, window: Int)
    extends UnaryExpression {

  require(gramN >= 1 && window >= 1, "gramN and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType.sql}")

  def compute(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < gramN) return new GenericArrayData(Array.empty[Any])
    val nGrams = words.length - gramN + 1
    val md = WinnowFingerprints.digest.get()
    val sb = new java.lang.StringBuilder()
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < gramN) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // First 8 hex chars of the md5 = first 4 digest bytes, unsigned.
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val nWins = math.max(nGrams - window + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nWins) {
      var min = hs(i)
      var j = i + 1
      val end = math.min(i + window, nGrams)
      while (j < end) { if (hs(j) < min) min = hs(j); j += 1 }
      seen.add(min)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_fingerprints"
}

object WinnowFingerprints {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def fingerprints(text: Column, gramN: Int, window: Int): Column =
    GraftBridge.column(
      WinnowFingerprints(GraftBridge.expression(text), gramN, window))
}
