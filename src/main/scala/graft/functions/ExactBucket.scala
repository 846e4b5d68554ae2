package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Cast, Expression, IntegralDivide, LessThan, Literal, Remainder, Subtract}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Exact floor-division bucketing for band/range joins — shared by the
  * [[graft.plans.BandJoinRewrite]] optimizer rule and
  * [[graft.operators.RangeJoinOps]] so the two can never bucket
  * differently.
  *
  * Why not the obvious forms: `floor(v / delta)` goes through double
  * division and can misbucket `|v| ≥ 2^53` (a silently dropped boundary
  * pair); `(x - pmod(x, d)) / d` is exact except that the subtraction
  * wraps for x within delta of Long.MinValue. This form is exact for
  * EVERY long: truncated integral divide, minus one when the remainder
  * is negative (i.e. x < 0 and d ∤ x) — no intermediate can overflow. */
object ExactBucket {

  def expr(v: Expression, delta: Long): Expression = {
    require(delta > 0, "bucket width must be positive")
    val x = Cast(v, LongType)
    val d = Literal(delta, LongType)
    val q = IntegralDivide(x, d)
    val r = Remainder(x, d)
    // r < 0 exactly when x < 0 and d does not divide x
    CaseWhen(
      Seq((LessThan(r, Literal(0L, LongType)),
        Subtract(q, Literal(1L, LongType)))),
      Some(q))
  }

  def col(v: Column, delta: Long): Column =
    ColumnBridge.column(expr(ColumnBridge.expression(v), delta))
}
