package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.GraftBridge

/** `stateAsOf` as a CUSTOM LOGICAL PLAN — the optional Catalyst
  * convenience SURVEY.md §7.3 sketches: a marker node that declares
  * "the state of tablet T as of height H" over any mutation-stream
  * relation, planned by [[StateAsOfRule]] (injected through
  * `SparkSessionExtensions`, see [[graft.functions.GraftExtensions]])
  * into the exact snapshot-free read plan
  * [[graft.read.TemporalReads.readTabletAt]] builds: height/tablet
  * filter → last-write-wins argmax per primary key → tombstone filter →
  * PK-sorted (primary_key, height, value).
  *
  * Why a node + rule rather than just the function call: the marker
  * composes — callers can stack further operators over `stateAsOf`
  * BEFORE it is planned, and Catalyst then optimizes the whole tree as
  * one unit (e.g. a caller's `primary_key` predicate lands below the
  * argmax window once the rewrite has run). The function-call API
  * ([[graft.read.TemporalReads.readTabletAt]]) remains the primary
  * surface; this is the ergonomic/SQL-extension path over the same
  * semantics, and its results are spec-pinned equal.
  */
final case class StateAsOf(child: LogicalPlan, tabletId: String, atHeight: Long)
    extends UnaryNode {

  override def output: Seq[Attribute] =
    StateAsOf.OutputCols.map { n =>
      child.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"stateAsOf child must carry column '$n'; has " +
          child.output.map(_.name).mkString(", ")))
    }

  override protected def withNewChildInternal(newChild: LogicalPlan): StateAsOf =
    copy(child = newChild)
}

object StateAsOf {
  /** The read's output schema, in reference order (read.go:171–177). */
  val OutputCols: Seq[String] = Seq("primary_key", "height", "value")

  /** Declarative API: plans the marker node; requires a session built
    * `.withExtensions(new GraftExtensions)` (otherwise the node has no
    * physical strategy and execution fails loudly). */
  def stateAsOf(mutations: DataFrame, tabletId: String, atHeight: Long): DataFrame =
    GraftBridge.ofRows(mutations.sparkSession,
      StateAsOf(GraftBridge.logicalPlan(mutations), tabletId, atHeight))
}

/** Resolution rule rewriting [[StateAsOf]] into the readTabletAt plan.
  * The marker promised the child's attribute ids for its output; the
  * rewrite ends in fresh window/aggregate attributes, so a thin Project
  * re-aliases them back to the promised ids — operators already resolved
  * against the marker keep resolving unchanged. */
final class StateAsOfRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s @ StateAsOf(child, tablet, h) if child.resolved =>
      val rewritten = graft.read.TemporalReads
        .readTabletAt(GraftBridge.ofRows(spark, child), tablet, h)
        .queryExecution.analyzed
      val realigned: Seq[NamedExpression] =
        rewritten.output.zip(s.output).map { case (a, e) =>
          Alias(a, e.name)(exprId = e.exprId)
        }
      Project(realigned, rewritten)
  }
}
