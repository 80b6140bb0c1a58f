package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled greedy BPE merge fold over a symbol array — the per-word kernel
  * of `p_bpe_train` / `p_bpe_encode`.
  *
  * Replaces the declarative `aggregate(syms, ..., (acc, x) -> CASE ...)`
  * formulation: Spark evaluates higher-order-function lambdas interpreted
  * (one expression-tree walk per element, plus an array COPY per element for
  * the accumulator append), which made the encode fold the single hottest
  * loop on the bench. Semantics are exactly the BPE-defined greedy
  * left-to-right pass, identical to the `aggregate` fold it replaces (the
  * spec pins equivalence against that formulation):
  *
  *   out = []
  *   for x in syms: if out.last == l && x == r then out.last = l||r
  *                  else out += x
  *
  * applied once per merge, in rank order. Note the merged symbol `l||r`
  * becomes the new "last" and can itself match a later `l` — by design
  * (both formulations, and reference BPE, share this).
  */
private[functions] object BpeMergeFold {

  /** In-place sequential merge fold. `buf` holds the current symbols in
    * [0, n); returns the new length after applying merge (l, r) -> lr. */
  def foldOne(buf: Array[UTF8String], n: Int,
      l: UTF8String, r: UTF8String, lr: UTF8String): Int = {
    // Null elements (possible only under a containsNull input type; `split`
    // never produces them) never match a merge side — same as the `===`
    // null semantics of the declarative fold this replaces.
    var out = 0
    var i = 0
    while (i < n) {
      if (out > 0 && buf(out - 1) != null && buf(i) != null &&
          buf(out - 1).equals(l) && buf(i).equals(r)) {
        buf(out - 1) = lr
      } else {
        buf(out) = buf(i)
        out += 1
      }
      i += 1
    }
    out
  }

  def toBuffer(in: ArrayData): Array[UTF8String] = {
    val n = in.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) { buf(i) = in.getUTF8String(i); i += 1 }
    buf
  }
}

/** `syms -> syms'` after greedily applying the fixed merge list in order;
  * returns `array<string>`. One compiled pass per merge per row. */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got ${dt.sql}")
  }

  @transient private lazy val ls = merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rs = merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val lrs = merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  def compute(in: ArrayData): ArrayData = {
    val buf = BpeMergeFold.toBuffer(in)
    var n = buf.length
    var m = 0
    while (m < ls.length) {
      n = BpeMergeFold.foldOne(buf, n, ls(m), rs(m), lrs(m))
      m += 1
    }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApplyMerges].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_apply_merges"
}

/** `size(BpeApplyMerges(syms, merges))` without materializing the output
  * array — the encode path only consumes the token COUNT. Returns long. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got ${dt.sql}")
  }

  @transient private lazy val ls = merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rs = merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val lrs = merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  def compute(in: ArrayData): Long = {
    val buf = BpeMergeFold.toBuffer(in)
    var n = buf.length
    var m = 0
    while (m < ls.length) {
      n = BpeMergeFold.foldOne(buf, n, ls(m), rs(m), lrs(m))
      m += 1
    }
    n.toLong
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_token_count"
}

object BpeApplyMerges {
  /** Apply one merge (the training-round step). */
  def applyOne(syms: Column, l: String, r: String): Column =
    GraftBridge.column(
      BpeApplyMerges(GraftBridge.expression(syms), Seq((l, r))))
}

object BpeTokenCount {
  /** Token count after applying `merges` in rank order (the encode step). */
  def count(syms: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(
      BpeTokenCount(GraftBridge.expression(syms), merges))
}
