package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native AS-OF join — the whole-operator extension demo (SURVEY §2.2,
  * preference order (c)): for every left row, attach the LAST right row of
  * the same key whose ordering tuple is strictly below the left row's
  * (lexicographic on the `ord` expressions; add a unique tiebreaker to
  * make it total). Spark has no asof join; the idiomatic composition is a
  * window over a union (`join_asof`), which carries every left row
  * through the window sort TWICE (union first, filter after). This
  * operator is the shape a 100 TB engine wants instead: co-partition both
  * sides on the key (one shuffle each), sort within partitions by
  * (key, ord), and stream a single forward merge — no union, no window
  * buffer, no candidate retention beyond ONE row per side.
  *
  * Pieces: [[AsOfJoinPlan]] (logical), [[AsOfJoinStrategy]] (planner
  * rule, injected via `experimental.extraStrategies` in Tables.conf and
  * `injectPlannerStrategy` in GraftExtensions), [[AsOfJoinExec]]
  * (physical merge). EnsureRequirements supplies the exchanges and sorts
  * from the declared distribution/ordering requirements — the operator
  * itself never schedules data movement, exactly like the built-in
  * SortMergeJoinExec it is modeled on.
  */
object AsOfJoin {

  /** Left as-of join `left ⟕asof right`. Column-name based; the right
    * side's attributes must not collide with the left's (alias first —
    * required anyway for a readable output schema).
    */
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftOrd: Seq[String], rightOrd: Seq[String]): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val dup = lp.outputSet.intersect(rp.outputSet)
    require(dup.isEmpty,
      s"asof join sides share attributes $dup — alias the right side first " +
        "(self-joins need fresh exprIds, same as Dataset.join's dedup)")
    def attrs(p: LogicalPlan, names: Seq[String]): Seq[Attribute] =
      names.map(n => p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]")))
    require(leftKeys.length == rightKeys.length && leftOrd.length == rightOrd.length,
      "asof join: key/ord lists must pair up")
    val (lk, rk) = (attrs(lp, leftKeys), attrs(rp, rightKeys))
    val (lo, ro) = (attrs(lp, leftOrd), attrs(rp, rightOrd))
    // The exec builds its comparators from the LEFT types and applies
    // them to right-side projections — mismatched pairs would not error,
    // they would silently mis-compare (e.g. an int read through a long
    // ordering loses sign extension). Fail here instead.
    (lk.zip(rk) ++ lo.zip(ro)).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asof join: paired columns ${l.name} (${l.dataType.catalogString}) and " +
          s"${r.name} (${r.dataType.catalogString}) must have identical types")
    }
    GraftSqlShim.ofRows(left.sparkSession, AsOfJoinPlan(lp, rp, lk, rk, lo, ro))
  }
}

/** Logical AS-OF join node. Output = left columns ++ right columns (right
  * nullable: a left row with no prior right row pads nulls, like a left
  * outer join).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrd: Seq[Expression], rightOrd: Seq[Expression])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lo, ro) =>
      AsOfJoinExec(lk, rk, lo, ro, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical streaming-merge as-of join.
  *
  * Requirements do the heavy lifting: both children clustered on their
  * keys (EnsureRequirements co-partitions them) and sorted by
  * (keys, ord) — after which each partition pair zips into one forward
  * pass holding exactly one candidate row. Memory per task is O(1) rows;
  * contrast with the window composition, which buffers per-key frames.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrd: Seq[Expression], rightOrd: Seq[Expression],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrd).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrd).map(SortOrder(_, Ascending)))

  // Rows never change partitions or order relative to the left child.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lk = leftKeys; val rk = rightKeys
    val lo = leftOrd; val ro = rightOrd
    val keyTypes = lk.map(_.dataType)
    val ordTypes = lo.map(_.dataType)
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lOrdProj = UnsafeProjection.create(lo, lOut)
      val rOrdProj = UnsafeProjection.create(ro, rOut)
      val keyCmp = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ordCmp = RowOrdering.createNaturalAscendingOrdering(ordTypes)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(out, out)

      new Iterator[InternalRow] {
        // Sorter output buffers are reused — copy anything retained across
        // next() calls (the lookahead row and the current candidate).
        // InternalRow, not UnsafeRow: if EnsureRequirements elides the
        // Sort (child already satisfies ordering/distribution) the child
        // may emit non-Unsafe rows, and a blind cast would CCE at runtime
        // — same buffering contract as SortMergeJoin's.
        private def fetchRight(): InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        private var rHead: InternalRow = fetchRight()
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lOrdRow = lOrdProj(l)
          var advancing = rHead != null
          while (advancing) {
            val rKey = rKeyProj(rHead)
            val c = keyCmp.compare(rKey, lKey)
            if (c < 0 || (c == 0 && ordCmp.compare(rOrdProj(rHead), lOrdRow) < 0)) {
              if (c == 0) {
                cand = rHead
                // Re-copy the key only on key-group change — within a
                // group every matched row shares it, and this is the
                // innermost loop.
                if (candKey == null || keyCmp.compare(candKey, rKey) != 0)
                  candKey = rKey.copy()
              }
              rHead = fetchRight()
              advancing = rHead != null
            } else advancing = false
          }
          outRows += 1
          if (cand != null && keyCmp.compare(candKey, lKey) == 0) {
            matched += 1
            resultProj(joined(l, cand))
          } else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
