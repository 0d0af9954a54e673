package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator: logical node + planner strategy
  * + physical operator (build-brief preference (c) — exercised here
  * because an as-of join genuinely has no single built-in operator; the
  * window composition in j5/j8 is the preference-(a) alternative and the
  * two are pinned equal in AsOfJoinSpec).
  *
  * Semantics: for every left row, attach the right row with the
  * greatest `rightTime` ≤/< `leftTime` (backward; default strict `<`) or
  * the least `rightTime` ≥/> `leftTime` (forward), within the same join
  * key group. Unmatched left rows keep nulls on the right — i.e. a left
  * as-of join, the shape every feature-attribution pipeline wants.
  *
  * Physical plan for 100 TB: both sides hash-shuffle ONCE on the join
  * keys (ClusteredDistribution — AQE still coalesces/skew-splits the
  * exchanges), then each partition builds an index of the right side
  * keyed by join key with a time-sorted run per key, and streams the
  * left side through binary searches. Right groups must fit in executor
  * memory per key-partition — the same contract as a shuffled hash
  * join's build side; the left side streams unbuffered.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    strict: Boolean,
    toleranceNative: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.forward, j.strict, j.toleranceNative,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    strict: Boolean,
    toleranceNative: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Co-partition both sides on the join keys; EnsureRequirements inserts
  // the (at most) two exchanges, and reuses existing compatible ones.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    require(leftTime.dataType == rightTime.dataType,
      s"as-of time columns must agree in type: ${leftTime.dataType} vs ${rightTime.dataType}")
    val timeType = leftTime.dataType
    // Orderable scalar types only: struct/array/map time values read from
    // a reused projection buffer would be views that the next row
    // overwrites (string values are cloned at build below).
    require(!timeType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
      !timeType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      !timeType.isInstanceOf[org.apache.spark.sql.types.MapType] &&
      timeType != org.apache.spark.sql.types.NullType,
      s"as-of time column must be an atomic orderable type, got $timeType")
    // Tolerance bounds the match distance in the time type's NATIVE unit
    // (µs for timestamps, days for dates, raw value for integrals), so
    // it needs the underlying numeric, not just an ordering.
    toleranceNative.foreach { t =>
      require(t >= 0, s"as-of tolerance must be non-negative, got $t")
      import org.apache.spark.sql.types._
      require(timeType.isInstanceOf[TimestampType] ||
        timeType.isInstanceOf[TimestampNTZType] || timeType.isInstanceOf[DateType] ||
        timeType.isInstanceOf[LongType] || timeType.isInstanceOf[IntegerType],
        s"as-of tolerance requires an integral-backed time type, got $timeType")
    }
    val tol = toleranceNative
    val fwd = forward
    val strictCmp = strict
    val rightWidth = right.output.size
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val ord = TypeUtils.getInterpretedOrdering(timeType)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      // Buffered right rows go through an UnsafeProjection so (a) their
      // byte image is a deterministic tiebreak for equal timestamps and
      // (b) buffering is layout-independent of the child's row class.
      val rRowProj = UnsafeProjection.create(rightOut, rightOut)
      // key -> time-sorted (time, row) run. Right rows with a null key
      // or null time can never be as-of matches (SQL comparison
      // semantics), so they are dropped at build.
      val index = new java.util.HashMap[InternalRow, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]()
      rIter.foreach { row =>
        val k = rKeyProj(row)
        val t = rTimeProj(row)
        if (!k.anyNull && !t.isNullAt(0)) {
          var buf = index.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty[(Any, InternalRow)]
            index.put(k.copy(), buf)
          }
          // String time values are views into the projection's reused
          // buffer — clone before buffering (binary/decimal reads
          // already materialize fresh objects).
          val tv = t.get(0, timeType) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
            case other => other
          }
          buf += ((tv, rRowProj(row).copy()))
        }
      }
      // Equal-time runs are ordered by the rows' unsafe byte image:
      // shuffle fetch order is nondeterministic across runs, so without
      // a total order the matched payload for a tied timestamp would be
      // nondeterministic at cluster scale. The tiebreak is arbitrary but
      // stable: backward matches take the byte-wise greatest duplicate,
      // forward the smallest.
      def cmpRowBytes(a: InternalRow, b: InternalRow): Int = {
        val ba = a.asInstanceOf[UnsafeRow].getBytes
        val bb = b.asInstanceOf[UnsafeRow].getBytes
        var i = 0
        val n = math.min(ba.length, bb.length)
        while (i < n) {
          val c = (ba(i) & 0xff) - (bb(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        ba.length - bb.length
      }
      val byTime = new Ordering[(Any, InternalRow)] {
        override def compare(a: (Any, InternalRow), b: (Any, InternalRow)): Int = {
          val c = ord.compare(a._1, b._1)
          if (c != 0) c else cmpRowBytes(a._2, b._2)
        }
      }
      index.values().forEach { buf => buf.sortInPlace()(byTime); () }

      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // Emit UnsafeRow like Spark's own join execs: parents such as a
      // shuffle's UnsafeRowSerializer or SortExec's row sorter cast
      // input rows to UnsafeRow, and a JoinedRow would CCE there.
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      def toL(v: Any): Long = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case other => other.asInstanceOf[Number].longValue()
      }
      def search(buf: scala.collection.mutable.ArrayBuffer[(Any, InternalRow)], lt: Any): InternalRow = {
        // backward: rightmost index with t < lt (strict) or t <= lt;
        // forward:  leftmost  index with t > lt (strict) or t >= lt.
        var lo = 0
        var hi = buf.length // exclusive
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val c = ord.compare(buf(mid)._1, lt)
          val takeLeft =
            if (fwd) c > 0 || (!strictCmp && c == 0)
            else !(c < 0 || (!strictCmp && c == 0))
          if (fwd) { if (takeLeft) hi = mid else lo = mid + 1 }
          else { if (takeLeft) hi = mid else lo = mid + 1 }
        }
        // lo = first index NOT satisfying the backward predicate, or the
        // first index satisfying the forward predicate.
        val hit =
          if (fwd) { if (lo < buf.length) buf(lo) else null }
          else { if (lo > 0) buf(lo - 1) else null }
        if (hit == null) null
        else tol match {
          case Some(t) =>
            val d = if (fwd) toL(hit._1) - toL(lt) else toL(lt) - toL(hit._1)
            if (d <= t) hit._2 else null
          case None => hit._2
        }
      }

      lIter.map { lrow =>
        val k = lKeyProj(lrow)
        val t = lTimeProj(lrow)
        var m: InternalRow = null
        if (!k.anyNull && !t.isNullAt(0)) {
          val buf = index.get(k)
          if (buf != null) m = search(buf, t.get(0, timeType))
        }
        outRows += 1
        if (m != null) matched += 1
        resultProj(joined(lrow, if (m == null) nullRight else m))
      }
    }
  }
}

/** Public builder API for the as-of join. */
object AsOfJoin {

  /** Ensures the planner strategy is installed in this session
    * (idempotent). Also wired via GraftExtensions for the
    * `spark.sql.extensions` production path.
    */
  def install(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
  }

  /** Left as-of join `left` with `right` on equal `keys`, matching the
    * latest prior (backward, default) or earliest later (forward) right
    * row by time. Output = left columns ++ right columns (nullable);
    * name-collide columns on the right should be renamed by the caller
    * first, as with any join.
    *
    * `tolerance` (pandas merge_asof / kdb wj-style) bounds how far the
    * match may sit from the probe time, in the time column's NATIVE unit
    * (µs for timestamps, days for dates, the raw value for integrals);
    * a candidate farther than that leaves the left row unmatched.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      forward: Boolean = false, strict: Boolean = true,
      tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size, "key lists must align")
    val spark = left.sparkSession
    install(spark)
    val lplan = left.queryExecution.analyzed
    val rplan0 = right.queryExecution.analyzed
    // Self-join hygiene: if the two sides share attribute ids (both
    // derive from the same scan), re-alias the right side so output
    // attributes stay unambiguous — the same dedup Dataset.join performs.
    val rplan =
      if (lplan.outputSet.intersect(rplan0.outputSet).isEmpty) rplan0
      else Project(rplan0.output.map(a => Alias(a, a.name)()), rplan0)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(a => a.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found among ${plan.output.map(_.name).mkString(", ")}"))
    val lk = leftKeys.map(resolve(lplan, _))
    val rk = rightKeys.map(resolve(rplan, _))
    // Keys are matched by hashed binary layout, so types must agree
    // exactly (add explicit casts upstream, as with bucketed joins).
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    val plan = AsOfJoinPlan(
      lplan, rplan, lk, rk,
      resolve(lplan, leftTimeCol), resolve(rplan, rightTimeCol),
      forward, strict, tolerance)
    org.apache.spark.sql.graft.PlanDf.ofRows(spark, plan)
  }
}
