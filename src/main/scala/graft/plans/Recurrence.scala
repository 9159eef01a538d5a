package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.LongType

/** Keyed linear-recurrence scan — the genuinely-sequential per-key fold
  * that window functions CANNOT express (a window frame aggregates
  * inputs; a recurrence feeds its own previous OUTPUT back in):
  *
  *   s := floorDiv(s * num, den) + value        (per key, in ord order)
  *
  * This is the batch side of what `mapGroupsWithState` does in
  * streaming: exponentially-decayed activity/fraud scores, retry
  * backoff state, inventory running levels with decay. The existing
  * engine sidesteps recurrences with closed forms on DAYS-sized
  * relations (Stats.ewmaDaily) or per-group folded arrays
  * (Stats.kaplanMeier) — both capped by small cardinalities. This
  * operator runs at DATA scale: millions of keys × events, one pass.
  *
  * Implemented at the extension ladder's deepest rung (SURVEY §7.3 (c))
  * because no composition of built-ins expresses it at scale:
  *   - [[DecayedScan]] — logical node appending one LongType column;
  *   - [[GraftStrategy]] — planner strategy (injected at runtime via
  *     `spark.experimental.extraStrategies`, same discipline as the
  *     RollupRewrite/RangeJoinRewrite optimizer rules);
  *   - [[DecayedScanExec]] — physical node declaring
  *     `requiredChildDistribution = ClusteredDistribution(key)` and
  *     `requiredChildOrdering = (key, ord...)`, so Catalyst plans the
  *     ONE hash exchange + per-partition sort this needs and AQE still
  *     owns the exchange; the operator itself is a zero-allocation
  *     single pass per partition.
  *
  * Exactness contract: all-integer state; division TRUNCATES toward
  * zero — the semantics BOTH DuckDB's integer `//` and Spark's `DIV`
  * use (probed: `-7 // 2 = -3` in DuckDB, i.e. truncation, NOT floor)
  * — so results are bit-identical on any engine, partitioning, or run;
  * the recursive-CTE oracles of q294/q300 check it.
  * 100 TB shape: one key-clustered exchange, then linear scan; state is
  * ONE long per in-flight key, no per-group materialization. */
object Recurrence {

  /** Append `outName` = the running decayed sum of `valCol` (null value
    * rows contribute 0) per `keyCol`, ordered by `ordCols` (which must
    * be a deterministic total order within a key, or the recurrence
    * itself is ill-defined). Decay is the exact rational num/den,
    * applied to the PREVIOUS state: s := (s*num) quot den + v
    * (truncating division, the DuckDB-`//` / Spark-`DIV` semantics). */
  def decayedSum(df: DataFrame, keyCol: String, ordCols: Seq[String],
                 valCol: String, num: Long, den: Long,
                 outName: String = "decayed"): DataFrame = {
    require(den > 0, s"den must be positive, got $den")
    require(num >= 0 && num <= den, s"decay num/den must be in [0,1], got $num/$den")
    val spark = df.sparkSession
    GraftStrategy.register(spark)
    val key = Shim.expression(df.col(keyCol))
    val ord = ordCols.map(c => Shim.expression(df.col(c)))
    val value = Shim.expression(df.col(valCol))
    require(value.dataType == LongType,
      s"decayedSum value column must be BIGINT, got ${value.dataType.simpleString}")
    val node = DecayedScan(key, ord, value, num, den,
      AttributeReference(outName, LongType, nullable = false)(),
      df.queryExecution.analyzed)
    Shim.ofRows(spark, node)
  }

  /** Append Holt double-exponential-smoothing state per key: the
    * TWO-state coupled recurrence (level + trend, both halved each
    * step — α = β = ½ as exact truncating integer halving)
    *
    *   t = 1:  l := v,                      b := 0
    *   t > 1:  l' := (v + l + b) quot 2,    b' := (b + (l' − l)) quot 2
    *
    * that no window OR single-state scan expresses (the two states
    * feed each other). Emits `level` and `trend` columns; the h-step
    * forecast is the caller's `level + h·trend` projection. Second
    * instantiation of the custom-plan framework — same strategy, same
    * exchange/sort contract, two appended columns. */
  def holt(df: DataFrame, keyCol: String, ordCols: Seq[String],
           valCol: String): DataFrame = {
    val spark = df.sparkSession
    GraftStrategy.register(spark)
    val key = Shim.expression(df.col(keyCol))
    val ord = ordCols.map(c => Shim.expression(df.col(c)))
    val value = Shim.expression(df.col(valCol))
    require(value.dataType == LongType,
      s"holt value column must be BIGINT, got ${value.dataType.simpleString}")
    val node = HoltScan(key, ord, value,
      AttributeReference("level", LongType, nullable = false)(),
      AttributeReference("trend", LongType, nullable = false)(),
      df.queryExecution.analyzed)
    Shim.ofRows(spark, node)
  }
}

/** Logical node for [[Recurrence.holt]]: child plus (level, trend). */
case class HoltScan(key: Expression, ord: Seq[Expression],
                    value: Expression,
                    levelAttr: AttributeReference,
                    trendAttr: AttributeReference,
                    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ levelAttr :+ trendAttr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(levelAttr, trendAttr))
  override protected def withNewChildInternal(newChild: LogicalPlan): HoltScan =
    copy(child = newChild)
}

/** Logical node: child plus one appended non-null LongType column. The
  * output attribute is created by the caller and threaded through
  * copies, keeping its exprId stable across analyzer transforms. */
case class DecayedScan(key: Expression, ord: Seq[Expression],
                       value: Expression, num: Long, den: Long,
                       outAttr: AttributeReference,
                       child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): DecayedScan =
    copy(child = newChild)
}

/** Planner strategy for the engine's custom logical nodes. Stateless
  * object; `register` appends it to the session's experimental
  * strategies exactly once (idempotent, same pattern as the optimizer
  * rule injectors). */
object GraftStrategy extends SparkStrategy {

  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(this)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DecayedScan(key, ord, value, num, den, outAttr, child) =>
      DecayedScanExec(key, ord, value, num, den, outAttr,
        planLater(child)) :: Nil
    case HoltScan(key, ord, value, levelAttr, trendAttr, child) =>
      HoltScanExec(key, ord, value, levelAttr, trendAttr,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical keyed-recurrence scan. Declares the distribution/ordering
  * it needs instead of shuffling itself — EnsureRequirements plans the
  * exchange + sort, AQE coalesces/skew-splits it like any other
  * shuffle. The scan is a single allocation-free pass: one reused
  * UnsafeProjection for the key, one bound expression for the value,
  * one JoinedRow + UnsafeProjection to append the state column. */
case class DecayedScanExec(key: Expression, ord: Seq[Expression],
                           value: Expression, num: Long, den: Long,
                           outAttr: Attribute,
                           child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(key, Ascending) +: ord.map(o => SortOrder(o, Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = Seq(key)
    val valueExpr = value
    val n = num
    val d = den
    val outputAttrs = output
    child.execute().mapPartitions(iter => {
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundValue = BindReferences.bindReference(valueExpr, childOutput)
      val joined = new JoinedRow
      val state = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      var curKey: UnsafeRow = null
      var s = 0L
      iter.map { row =>
        val k = keyProj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy()
          s = 0L
        }
        val v = boundValue.eval(row)
        val vl = if (v == null) 0L else v.asInstanceOf[Long]
        s = Math.addExact(Math.multiplyExact(s, n) / d, vl)
        state.setLong(0, s)
        outProj(joined(row, state))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): DecayedScanExec =
    copy(child = newChild)
}

/** Physical Holt scan — same shape as DecayedScanExec with two state
  * longs. All divisions truncate toward zero (DuckDB-`//` parity; the
  * trend CAN go negative, so this is load-bearing, not cosmetic). */
case class HoltScanExec(key: Expression, ord: Seq[Expression],
                        value: Expression,
                        levelAttr: Attribute, trendAttr: Attribute,
                        child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ levelAttr :+ trendAttr
  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(levelAttr, trendAttr))
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(key, Ascending) +: ord.map(o => SortOrder(o, Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = Seq(key)
    val valueExpr = value
    val outputAttrs = output
    child.execute().mapPartitions(iter => {
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundValue = BindReferences.bindReference(valueExpr, childOutput)
      val joined = new JoinedRow
      val state = new GenericInternalRow(2)
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      var curKey: UnsafeRow = null
      var first = true
      var l = 0L
      var b = 0L
      iter.map { row =>
        val k = keyProj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy()
          first = true
        }
        val v = boundValue.eval(row)
        val vl = if (v == null) 0L else v.asInstanceOf[Long]
        if (first) { l = vl; b = 0L; first = false }
        else {
          val lNew = Math.addExact(vl, Math.addExact(l, b)) / 2
          b = Math.addExact(b, Math.subtractExact(lNew, l)) / 2
          l = lNew
        }
        state.setLong(0, l)
        state.setLong(1, b)
        outProj(joined(row, state))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): HoltScanExec =
    copy(child = newChild)
}
