package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's custom Catalyst expressions, via the public
  * `SparkSessionExtensions` API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM ...")
  * spark.sql("SELECT explode(graft_word_shingles(text, 3)) FROM docs")
  * }}}
  *
  * Registered functions:
  *   - `graft_dot(array, array) -> double` — codegen'd sequential-fold dot
  *     product ([[ArrayDotProduct]]).
  *   - `graft_word_shingles(text, n) -> array<string>` — distinct word
  *     n-grams in one compiled pass ([[WordShingles]]).
  *   - `graft_sorted_intersect_count(a, b) -> bigint` — distinct
  *     intersection count of two sorted long arrays
  *     ([[SortedIntersectCount]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Custom logical plan: `stateAsOf` marker → readTabletAt plan
    // (SURVEY.md §7.3's optional Catalyst rewrite; see graft.plans.StateAsOf).
    ext.injectResolutionRule(session => new graft.plans.StateAsOfRule(session))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_word_shingles(text, n) takes exactly 2 arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Integer, _) => v.intValue
          case other => throw new IllegalArgumentException(
            s"graft_word_shingles: n must be an integer literal, got $other")
        }
        WordShingles(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_sorted_intersect_count(a, b) takes exactly 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
  }
}
