package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd `|A ∩ B|` over two SORTED long arrays — the verification
  * kernel of the set-similarity dedup joins (n-gram Jaccard).
  *
  * Exactly `size(array_intersect(a, b))` for ascending-sorted inputs
  * (DISTINCT common values: duplicate runs count once; a null run —
  * `sort_array` places nulls first — counts once when present in both),
  * but as a two-pointer merge instead of a hash-set build plus an
  * intermediate result-array materialization per pair. The intersect was
  * the remaining hot spot of `p_dedup_ngram_jaccard` verification: only
  * the COUNT is ever used, so allocating the intersection array per
  * candidate pair was pure overhead.
  *
  * Inputs MUST be sorted ascending (as `sort_array(collect_list(...))`
  * produces); unsorted inputs give an undercount, which is why the
  * query-side arrays are sorted at aggregation time (they already were —
  * the prefix filter needs the same global order).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be array<bigint>, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val na = aa.numElements()
    val nb = bb.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    // sort_array(asc) places nulls first: a null run on both sides is one
    // common (distinct) value, matching array_intersect.
    val aHadNull = { while (i < na && aa.isNullAt(i)) i += 1; i > 0 }
    val bHadNull = { while (j < nb && bb.isNullAt(j)) j += 1; j > 0 }
    if (aHadNull && bHadNull) cnt += 1
    while (i < na && j < nb) {
      val x = aa.getLong(i)
      val y = bb.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        cnt += 1
        while (i < na && !aa.isNullAt(i) && aa.getLong(i) == x) i += 1
        while (j < nb && !bb.isNullAt(j) && bb.getLong(j) == x) j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val aNull = ctx.freshName("aNull")
      val bNull = ctx.freshName("bNull")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $na && $a.isNullAt($i)) $i++;
         |while ($j < $nb && $b.isNullAt($j)) $j++;
         |boolean $aNull = $i > 0; boolean $bNull = $j > 0;
         |if ($aNull && $bNull) $cnt++;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else {
         |    $cnt++;
         |    while ($i < $na && !$a.isNullAt($i) && $a.getLong($i) == $x) $i++;
         |    while ($j < $nb && !$b.isNullAt($j) && $b.getLong($j) == $x) $j++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}

object SortedIntersectCount {
  /** Column-level entry point: distinct-intersection count of two sorted
    * long arrays as a codegen'd expression. */
  def count(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
