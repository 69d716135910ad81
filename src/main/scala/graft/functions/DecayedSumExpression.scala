package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AggregateWindowFunction,
  AttributeReference, Coalesce, Expression, Literal, ShiftRight}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_decayed_sum(x, shift)` — exponentially decayed running sum
  * as a native DECLARATIVE window function (the ClickHouse
  * `exponentialTimeDecayedSum` surface at fixed row cadence), in
  * INTEGER-EXACT fixed point:
  *
  *   s₀ = 0;  sᵢ = (sᵢ₋₁ >> shift) + xᵢ
  *
  * over the window's row order — each step the accumulated mass decays
  * by 2^-shift (shift 1 = half-life of one row), then the row's
  * contribution lands. Feed pre-scaled integers (e.g. `n * 1024`) to
  * keep fractional mass through the shifts; the recurrence floors at
  * every step, so the result is a deterministic function of the row
  * SEQUENCE — exactly reproducible by any engine running the same
  * fold (the q27b recursive-CTE oracle discipline), where a float EMA
  * could never be hash-gated.
  *
  * Why a custom window function and not composition: the per-step
  * floor makes the recurrence non-linear — it cannot be rewritten as
  * Σ xᵢ·2^{-(t-i)} over any built-in windowed sum. This is the repo's
  * third Catalyst extension kind: codegen'd scalar [[Expression]]s,
  * [[org.apache.spark.sql.catalyst.expressions.aggregate
  * .TypedImperativeAggregate]]s, and now a DECLARATIVE
  * [[AggregateWindowFunction]] — the state transition is itself a
  * Catalyst expression (`(s >> shift) + coalesce(x, 0)`), so the
  * window executor evaluates it with full codegen and NO boxed
  * per-row state, the same machinery as `rank()`.
  *
  * Frame: rows UNBOUNDED PRECEDING → CURRENT ROW (inherited — the
  * running-fold frame); null inputs contribute 0 but still decay the
  * state one step (a quiet row is a time step, which is why this
  * composes with q31's gap FILL — silent hours must decay the score).
  *
  * 100 TB shape: one pass inside the window exchange, O(1) state per
  * group — the fold never materializes the series.
  */
case class DecayedSumExpression(child: Expression, shift: Int)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(shift >= 1 && shift <= 62,
    s"graft_decayed_sum: shift must be in [1, 62], got $shift")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_decayed_sum requires BIGINT, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_decayed_sum"

  private lazy val s =
    AttributeReference("s", LongType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(s)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(ShiftRight(s, Literal(shift)),
      Coalesce(Seq(child, Literal(0L)))))
  override lazy val evaluateExpression: Expression = s

  override protected def withNewChildInternal(
      newChild: Expression): DecayedSumExpression = copy(child = newChild)
}

object DecayedSumExpression {

  import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder,
    UnspecifiedFrame, WindowExpression, WindowSpecDefinition}

  /** Column face with the window spec built in catalyst directly
    * (Spark 4's Column-node `.over(…)` does not thread a RAW bridged
    * expression into a WindowExpression — the same reason
    * [[org.apache.spark.sql.GraftSqlBridge.catalystExpression]]
    * exists): ascending `orderBy`, the function's own running-fold
    * frame.
    */
  def decayedSumOver(
      c: Column, shift: Int,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    GraftSqlBridge.column(WindowExpression(
      DecayedSumExpression(GraftSqlBridge.expression(c), shift),
      WindowSpecDefinition(
        partitionBy.map(GraftSqlBridge.expression),
        orderBy.map(o => SortOrder(GraftSqlBridge.expression(o), Ascending)),
        UnspecifiedFrame)))
}
