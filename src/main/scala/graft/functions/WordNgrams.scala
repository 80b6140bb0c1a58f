package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL (non-distinct) adjacent word n-grams of a space-separated
  * text, one compiled pass per row — [[WordShingles]]' order-preserving,
  * duplicate-keeping sibling.
  *
  * Exactly `transform(slice(ws, 1, size(ws) - (n-1)), (w, i) ->
  * concat_ws(' ', slice(ws, i+1, n)))` over `ws = split(text, ' ')` (with
  * the `greatest(..., 0)` guard for short texts): texts with fewer than n
  * words yield an empty array; otherwise `len(ws) - n + 1` grams in
  * position order, repeats kept. That HOF formulation evaluates its lambda
  * interpreted per element (plus a per-element array slice + concat), which
  * made n-gram construction the scan-stage hot spot of the bigram/span
  * queries; this is a single JVM method inside whole-stage codegen.
  *
  * Split semantics match `split(text, ' ')`: Java's `split(" ", -1)` keeps
  * empty tokens from leading/adjacent spaces, exactly like Spark's `split`
  * and DuckDB's `string_split` (same equivalence WordShingles pins).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType.sql}")

  def compute(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngrammer", this, classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "graft_word_ngrams"
}

object WordNgrams {
  def ngrams(text: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(text), n))
}
