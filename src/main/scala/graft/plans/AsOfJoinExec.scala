package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical as-of join: a single merge pass over two sorted streams.
  *
  * Execution model at 1000 executors: `requiredChildDistribution`
  * clusters both sides on the `by` keys (one hash shuffle each, or
  * none when a child is already co-partitioned — bucketed tables,
  * upstream aggregations); `requiredChildOrdering` sorts each
  * partition `(by, on[, tiebreak])` ascending. `doExecute` then zips
  * co-partitions and streams both iterators once: for each left row
  * (non-decreasing key), the right pointer advances while its
  * `(by, on)` is `<=` the left key, retaining only the latest
  * candidate — O(n+m) compares, ONE retained row of state, no
  * per-group materialization, no window buffer; memory stays O(1)
  * regardless of group size.
  *
  * Skew caveat: AQE's OptimizeSkewedJoin matches only
  * SortMergeJoin/ShuffledHashJoin nodes, so a hot `by` key is NOT
  * auto-split here — it lands in one task (splitting a group would
  * break the single-pass merge, which needs each `by` group whole).
  * The O(1) state means the task cannot OOM, but it can straggle; at
  * 100 TB, mitigate a known-hot key by pre-filtering it into its own
  * as-of join or range-chunking `on` per hot key and unioning.
  */
final case class AsOfJoinExec(
    leftOn: Expression,
    rightOn: Expression,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    rightTiebreak: Seq[Expression],
    isLeftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty) Seq(AllTuples, AllTuples)
    else Seq(ClusteredDistribution(leftBy), ClusteredDistribution(rightBy))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)),
    ((rightBy :+ rightOn) ++ rightTiebreak).map(SortOrder(_, Ascending)))

  // rows stream out in left order, partitioning untouched — declaring
  // both lets Catalyst elide downstream sorts/exchanges on these keys
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftOn).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val byTypes = leftBy.map(_.dataType)
    val onType = leftOn.dataType
    val nBy = byTypes.length
    val outer = isLeftOuter
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftBy :+ leftOn, lOut)
      val rKeyProj = UnsafeProjection.create(rightBy :+ rightOn, rOut)
      val byOrd = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(byTypes :+ onType)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered
      // the one retained row: latest right candidate with valid keys
      var lastRight: InternalRow = null
      var lastRightKey: InternalRow = null

      def anyKeyNull(key: InternalRow): Boolean = {
        var i = 0
        while (i <= nBy) { // by keys AND the on value
          if (key.isNullAt(i)) return true
          i += 1
        }
        false
      }

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        // advance the right side through everything at-or-before lKey
        var advancing = rBuf.hasNext
        while (advancing) {
          val rKey = rKeyProj(rBuf.head)
          if (keyOrd.compare(rKey, lKey) <= 0) {
            val r = rBuf.next()
            // null by/on never matches (SQL comparison semantics);
            // equal (by, on) rows overwrite in tiebreak order → the
            // greatest tiebreak is the retained one
            if (!anyKeyNull(rKey)) {
              lastRight = r.copy()
              lastRightKey = rKey.copy()
            }
            advancing = rBuf.hasNext
          } else advancing = false
        }
        val matched = lastRightKey != null && !anyKeyNull(lKey) &&
          byOrd.compare(lastRightKey, lKey) == 0
        if (matched) Iterator.single(resultProj(joined(lRow, lastRight)))
        else if (outer) Iterator.single(resultProj(joined(lRow, nullRight)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical [[AsOfJoin]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftOn, j.rightOn, j.leftBy, j.rightBy, j.rightTiebreak,
        j.isLeftOuter, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

object AsOfJoinExec {
  /** Idempotently attach the strategy + pushdown rule to a session
    * built without `spark.sql.extensions=graft.GraftExtensions`.
    *
    * `planner.strategies` / `optimizer.batches` see BOTH injection
    * paths (extensions at session build, `experimental` here), so a
    * session already carrying them — extensions-built, or a racing
    * caller — is left untouched: appending again would run the
    * strategy and the rule twice on every query. The lock serializes
    * the check-then-append read-modify-write on `experimental`. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    exp.synchronized {
      if (!spark.sessionState.planner.strategies.exists(_ eq AsOfJoinStrategy))
        exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
      if (!spark.sessionState.optimizer.batches
            .exists(_.rules.exists(_ eq PushFilterThroughAsOfJoin)))
        exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughAsOfJoin
    }
  }
}
