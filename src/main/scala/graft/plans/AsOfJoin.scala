package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.GraftBridge

/** AS-OF JOIN as a first-class operator — custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, the tier of extension the composed
  * forms can't reach (SURVEY.md §2.6 / the d19 window formulation).
  *
  * Semantics (Pandas `merge_asof` / DuckDB `ASOF JOIN` parity): for
  * every LEFT row, attach the single RIGHT row with equal keys and
  * the LARGEST right time ≤ the left time; no match ⇒ right columns
  * null (left outer). Null times never match (a null left time gets
  * no row; null-time right rows are skipped).
  *
  * Why a custom operator instead of the window trick: the composed
  * form (union both sides + `last(...) ignoreNulls` window, d19)
  * materializes BOTH tables through one shuffle AND a window sort,
  * carries every left column through the window, and only yields one
  * attached column per window pass. The operator shuffles each side
  * once on its own keys (the SAME exchange a sort-merge equi-join
  * would plan — EnsureRequirements co-partitions the children), sorts
  * within partitions by (keys, time), and then a single forward merge
  * pass attaches ALL right columns at once: no repeated window
  * passes, no union, per-partition state = ONE buffered right row.
  * At 100 TB that is exactly a sort-merge join's cost envelope, and
  * bucketed/sorted tables make the exchanges vanish entirely.
  *
  * Determinism: if several right rows share (keys, time), the one
  * latest in the within-partition sort wins — give the exec a total
  * order by appending a `rightTieBreak` column (the API requires one).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Option[Long] = None,
    direction: String = "backward")
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

/** Physical as-of merge join. Children arrive hash-clustered on
  * their keys (ClusteredDistribution ⇒ the planner inserts/reuses
  * the same exchanges a shuffled equi-join gets, and co-partitions
  * them) and sorted by (keys, time, [tie]) — the merge is then a
  * single O(|L| + |R|) forward pass per partition holding one
  * buffered right row, never a hash table. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Option[Long],
    direction: String,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  require(Seq("backward", "forward", "nearest").contains(direction),
    s"as-of direction must be backward/forward/nearest, got $direction")
  // tolerance and the forward/nearest directions need an integral
  // distance between times — long-backed Catalyst types only
  // (timestamp = epoch micros, date = days)
  if (tolerance.isDefined || direction != "backward") {
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType, TimestampNTZType}
    require(Seq(TimestampType, TimestampNTZType, DateType, LongType,
      IntegerType).contains(leftTime.dataType),
      s"as-of tolerance/direction needs an integral time type, got " +
        leftTime.dataType.sql)
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ rightTieBreak)
      .map(SortOrder(_, Ascending)))

  // one-to-at-most-one join: left rows pass through in place
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val nRight = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // downstream operators (sort, exchange, collect) expect
      // UnsafeRow-backed iterators — flatten the JoinedRow view
      val outProj = UnsafeProjection.create(output, output)
      def timeLong(r: InternalRow): Long = r.get(0, timeType) match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case other => other.asInstanceOf[Number].longValue()
      }
      // the merge state: last right row whose (key, time) has been
      // passed by the left cursor, its key and time, plus the FIRST
      // row of the tied group sharing that time — forward-at-equality
      // must return the group's first row (pandas merge_asof picks
      // the first duplicate going forward) while backward returns
      // its last
      var best: InternalRow = null
      var bestKey: InternalRow = null
      var bestTime = 0L
      var bestGroupFirst: InternalRow = null
      var rHead: InternalRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltRow = lTimeProj(l).copy()
        val lTimeNull = ltRow.isNullAt(0)
        // advance the right cursor past every row at a smaller key,
        // or same key with time <= left time (each becoming `best`)
        var done = lTimeNull // null left time matches nothing
        while (!done && (rHead != null || rIter.hasNext)) {
          if (rHead == null) rHead = rIter.next()
          val rk = rKeyProj(rHead)
          val c = keyOrd.compare(rk, lk)
          if (c < 0) rHead = null // smaller key: discard, keep going
          else if (c == 0) {
            val rt = rTimeProj(rHead)
            if (!rt.isNullAt(0) && timeOrd.compare(rt, ltRow) <= 0) {
              // timeLong is only safe under the integral-type check
              // (tolerance / forward / nearest); plain backward never
              // reads bestTime or the group tracker
              if (tolerance.isDefined || direction != "backward") {
                val rtLong = timeLong(rt)
                // new (key, time) group ⇒ this row is its first member
                val sameGroup = best != null && bestKey != null &&
                  keyOrd.compare(bestKey, lk) == 0 && bestTime == rtLong
                best = rHead.copy() // candidate; later ones overwrite
                if (!sameGroup) bestGroupFirst = best
                bestTime = rtLong
              } else {
                best = rHead.copy()
              }
              bestKey = lk.copy()
              rHead = null
            } else if (rt.isNullAt(0)) rHead = null // never matches
            else done = true // right row is in the future
          } else done = true // right cursor is on a larger key
        }
        // the advance loop leaves `best` = largest rt <= lt for this
        // key (backward candidate) and `rHead` = the first row past
        // it (the forward candidate when its key matches). tolerance:
        // each direction checks only ITS closest candidate — any
        // other row is farther by construction.
        val backOk = !lTimeNull && best != null && bestKey != null &&
          keyOrd.compare(bestKey, lk) == 0 &&
          tolerance.forall(t => timeLong(ltRow) - bestTime <= t)
        val row =
          if (direction == "backward") { if (backOk) best else null }
          else {
            val fwdRow =
              if (!lTimeNull && rHead != null &&
                  keyOrd.compare(rKeyProj(rHead), lk) == 0) {
                val rt = rTimeProj(rHead)
                if (!rt.isNullAt(0) &&
                    tolerance.forall(t =>
                      timeLong(rt) - timeLong(ltRow) <= t)) rHead
                else null
              } else null
            direction match {
              case "forward" =>
                // an exact-time group was consumed into `best`; its
                // FIRST member is the forward match (pandas picks the
                // first duplicate going forward; `best` alone would
                // flip the tie policy between the equal-time and
                // strictly-future cases)
                if (backOk && bestTime == timeLong(ltRow))
                  bestGroupFirst
                else fwdRow
              case _ => // nearest: closer of the two, ties backward
                if (backOk && fwdRow != null) {
                  val db = timeLong(ltRow) - bestTime
                  val df = timeLong(rTimeProj(fwdRow)) - timeLong(ltRow)
                  if (db <= df) best else fwdRow
                } else if (backOk) best
                else fwdRow
            }
          }
        outProj(joined(l, if (row != null) row else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]) or the public
  * `spark.experimental.extraStrategies` (what [[AsOf.join]] does for
  * a live session). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, tol, dir) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, tol, dir,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push a Filter THROUGH [[AsOfJoinPlan]].
  *
  * Catalyst's PushPredicateThroughJoin only knows built-in Join
  * nodes — a custom operator is a pushdown BARRIER by default, so
  * `asOfJoin.filter(left-only predicate)` would scan the whole left
  * table, join it, and discard rows after the fact. This rule
  * restores the invariant the engine promises everywhere ("filters
  * reach the scan"):
  *
  *   - conjuncts over LEFT output only → below the left child.
  *     Safe for any predicate: the join attaches columns to left
  *     rows 1:1 (left outer), it never creates or duplicates them,
  *     so filtering before ≡ filtering after.
  *   - conjuncts touching right output stay above: right columns
  *     are null-extended on misses, and dropping right rows
  *     pre-join would CHANGE which row is "latest at-or-before" —
  *     not merely filter the output. (Same reasoning that stops
  *     Catalyst pushing into the null-producing side of an outer
  *     join.)
  *
  * Registered with [[GraftExtensions]] (`injectOptimizerRule`) and by
  * [[AsOf.register]] via the public `experimental.extraOptimizations`.
  */
object PushFilterThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case f @ Filter(cond, j: AsOfJoinPlan) =>
        val (push, keep) = splitConjunctivePredicates(cond)
          .partition(c => c.deterministic &&
            c.references.subsetOf(j.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = j.copy(
            left = Filter(push.reduce(And), j.left))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
}

/** Public DataFrame API for the as-of join. */
object AsOf {

  /** Ensure the planner knows the operator (idempotent; public
    * `experimental` hooks, so it works on any live session). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
  }

  /** left AS-OF JOIN right: every left row + the right row with
    * equal `on` keys and the largest `rightTime` ≤ `leftTime`
    * (left outer; `rightTieBreak` totals the order among equal-time
    * right rows). `tolerance` (pandas merge_asof parity) bounds how
    * far back the match may reach: leftTime − rightTime ≤ tolerance,
    * in the time column's integral unit (MICROSECONDS for
    * timestamps, days for dates). Right columns keep their names —
    * pass pre-aliased inputs if names collide, as with any join. */
  def join(left: DataFrame, right: DataFrame,
           leftOn: Seq[String], rightOn: Seq[String],
           leftTime: String, rightTime: String,
           rightTieBreak: String,
           tolerance: Option[Long] = None,
           direction: String = "backward"): DataFrame = {
    require(leftOn.nonEmpty && leftOn.size == rightOn.size,
      "as-of join needs matching non-empty key lists")
    val spark = left.sparkSession
    register(spark)
    val lPlan = GraftBridge.analyzed(left)
    // re-alias the right side: a self-as-of-join (events to events)
    // would otherwise carry duplicate attribute ids on both sides
    val rAnalyzed = GraftBridge.analyzed(right)
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val lk = leftOn.map(attr(lPlan, _))
    val rk = rightOn.map(attr(rPlan, _))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    // a custom LogicalPlan gets NO analyzer type coercion: the exec's
    // orderings are built from the LEFT types and applied to both
    // sides' UnsafeRows, so an int-vs-long key would compare raw
    // bytes and silently mis-join — reject mismatches here instead
    lk.zip(rk).zipWithIndex.foreach { case ((l, r), i) =>
      require(l.dataType == r.dataType,
        s"as-of join key $i type mismatch: ${l.dataType.sql} vs " +
          s"${r.dataType.sql} — cast the inputs to a common type")
    }
    require(lt.dataType == rt.dataType,
      s"as-of join time type mismatch: ${lt.dataType.sql} vs " +
        s"${rt.dataType.sql} — cast the inputs to a common type")
    val plan = AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
      attr(rPlan, rightTieBreak), tolerance, direction)
    GraftBridge.ofRows(spark, plan)
  }
}
