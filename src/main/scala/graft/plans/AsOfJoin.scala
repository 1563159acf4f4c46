package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeMap, AttributeReference, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** As-of join as a first-class Catalyst operator.
  *
  * Semantics (the reference's S5/A2 "price as of trade time" /
  * attribution shape, and the SQL contract of q54's correlated
  * subquery): for every left row, pick the single right row with equal
  * `by` keys and the greatest `on` value that is `<=` the left row's
  * `on` value; ties on `on` resolve to the greatest `tiebreak`. A null
  * `on` or `by` on either side never matches (SQL comparison
  * semantics). `left` outer keeps unmatched left rows with nulls;
  * `inner` drops them.
  *
  * Why a custom operator (brief preference order (c)): the composed
  * renderings both carry avoidable cost at scale —
  *  - per-row correlated subquery: a range join that rewrites to a
  *    quadratic-in-group BroadcastNestedLoop or an aggregate-under-
  *    join, and
  *  - the union-and-window rendering (q54): a union of both full
  *    relations through ONE window sort carrying every column of both
  *    sides (null-padded) through the shuffle.
  * The native plan shuffles each side once on `by`, sorts each side
  * `(by, on)` within partitions, and streams BOTH sorted iterators
  * through a single merge pass (O(n+m), no buffering beyond one
  * retained row per side) — the same execution shape Pandas/DuckDB/
  * kdb use for ASOF, re-expressed with Spark's Exchange/Sort
  * machinery so AQE, ReuseExchange, and partition-count tuning all
  * still apply. Distribution/ordering are DECLARED (requiredChild*),
  * not hand-built: Catalyst inserts the minimal Exchange/Sort, and
  * reuses an existing partitioning when the child already clusters by
  * `by` (e.g. bucketed tables — zero shuffle).
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftOn: Expression,
    rightOn: Expression,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    rightTiebreak: Seq[Expression],
    isLeftOuter: Boolean) extends BinaryNode {

  require(GraftSqlBridge.sameType(leftOn.dataType, rightOn.dataType),
    s"as-of `on` types differ: ${leftOn.dataType} vs ${rightOn.dataType}")
  require(leftBy.length == rightBy.length &&
    leftBy.zip(rightBy).forall { case (l, r) =>
      GraftSqlBridge.sameType(l.dataType, r.dataType) },
    "as-of `by` key lists must match pairwise in length and type")

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: a deterministic filter over the as-of join whose
  * references are only left `by` keys holds identically for the
  * matched right row (equal `by` values), so it pushes below the join
  * — to the left as-is and to the right with `by` attributes
  * substituted. Both children then scan/shuffle only the surviving
  * keys; on a partitioned source the predicate reaches the reader as
  * partition pruning. Conjuncts referencing anything else stay above. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin)
        if j.leftBy.forall(_.isInstanceOf[AttributeReference]) &&
          j.rightBy.forall(_.isInstanceOf[AttributeReference]) =>
      val lBy = j.leftBy.map(_.asInstanceOf[AttributeReference])
      val rBy = j.rightBy.map(_.asInstanceOf[AttributeReference])
      val byMap = AttributeMap(lBy.zip(rBy))
      val (push, keep) = splitConjunctivePredicates(cond).partition { c =>
        c.deterministic && c.references.nonEmpty &&
          c.references.subsetOf(AttributeSet(lBy))
      }
      if (push.isEmpty) f
      else {
        val rightPred = push
          .map(_.transform { case a: AttributeReference => byMap.getOrElse(a, a) })
          .reduce(And)
        val pushed = j.copy(
          left = Filter(push.reduce(And), j.left),
          right = Filter(rightPred, j.right))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** User-facing API: `AsOf.joinAsOf(trades, quotes, on = ("ts","q_ts"),
  * by = Seq(("sym","q_sym")), tiebreak = Seq("q_id"))`. Column names
  * resolve against each side; right-side output gets fresh expression
  * ids (self-join safe); output names must be disjoint.
  *
  * Registration: the planner strategy and pushdown rule must be
  * attached to the session. The production path is declaring
  * `spark.sql.extensions=graft.GraftExtensions` at session build. As a
  * test/REPL convenience, `joinAsOf` on a session built WITHOUT the
  * extension falls back to `AsOfJoinExec.ensureRegistered`, which
  * appends to the session's `experimental` methods — a SESSION-WIDE,
  * unremovable side effect: the strategy and rule then run (as no-ops
  * on non-as-of plans) for every later query on that session. */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame,
      on: (String, String),
      by: Seq[(String, String)],
      tiebreak: Seq[String] = Nil,
      joinType: String = "left"): DataFrame = {
    val outer = joinType.toLowerCase match {
      case "left" | "leftouter" | "left_outer" => true
      case "inner" => false
      case other => throw new IllegalArgumentException(
        s"as-of join type must be 'left' or 'inner', got '$other'")
    }
    // name matching honors spark.sql.caseSensitive, like any built-in
    // column resolution
    val resolve = left.sparkSession.sessionState.conf.resolver
    val dup = left.columns.filter(l => right.columns.exists(resolve(l, _)))
    require(dup.isEmpty,
      s"as-of join output column names must be disjoint; rename: ${dup.mkString(", ")}")
    // re-alias the right side so a self-join carries fresh expression
    // ids at its top project (the analyzer's DeduplicateRelations does
    // not run over manually assembled plans)
    val rightFresh = right.toDF(right.columns.toIndexedSeq: _*)
    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan = GraftSqlBridge.analyzed(rightFresh)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.filter(a => resolve(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"as-of: no column '$name' on the $side side " +
            s"(have: ${plan.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"as-of: column '$name' is ambiguous on the $side side " +
            s"(${many.size} matches)")
      }
    val node = AsOfJoin(
      lPlan, rPlan,
      leftOn = attr(lPlan, on._1, "left"),
      rightOn = attr(rPlan, on._2, "right"),
      leftBy = by.map(p => attr(lPlan, p._1, "left")),
      rightBy = by.map(p => attr(rPlan, p._2, "right")),
      rightTiebreak = tiebreak.map(attr(rPlan, _, "right")),
      isLeftOuter = outer)
    AsOfJoinExec.ensureRegistered(left.sparkSession)
    GraftSqlBridge.ofRows(left.sparkSession, node)
  }
}
