package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, NumericType}

/** IEEE 754 binary16 (half-precision) conversion — the value layer of
  * stream type 14, the one stream the reference plans but never ships
  * ("1/2 Precision float (16) (planned but not yet implemented)",
  * README.md:45, etsdSave.c:410-412). We implement it: the block codec
  * stores the 16-bit pattern in a FullS-shaped lane (all-ones = the
  * usual invalid sentinel, etsd.h:77), and these conversions move
  * between patterns and doubles, following the reference's own
  * convention that float conversion is a user-level concern for its
  * 32-bit streams (README.md:44 "converted by user").
  *
  * `bits` rounds a double DIRECTLY to binary16 (round-to-nearest-even
  * on the double's bit pattern — no intermediate float32 rounding, so
  * no double-rounding anomalies); `value` is exact (every half value is
  * a double). NaNs canonicalize to 0x7E00 so the 0xFFFF sentinel can
  * never be produced from a valid double. */
object HalfFloat {

  /** Round a double to the nearest binary16, returning the bit pattern
    * (0..0xFFFD range for finite values, 0x7C00/0xFC00 = ±inf,
    * 0x7E00 = NaN — never 0xFFFF, the codec's invalid sentinel). */
  def bits(d: Double): Long = {
    val db = java.lang.Double.doubleToLongBits(d)
    val sign = ((db >>> 48) & 0x8000L).toInt
    val v = db & 0x7FFFFFFFFFFFFFFFL
    if (v >= 0x7FF0000000000000L)                    // inf / NaN
      return (sign | (if (v > 0x7FF0000000000000L) 0x7E00 else 0x7C00)).toLong
    if (v >= 0x40F0000000000000L)                    // |d| >= 65536 -> inf
      return (sign | 0x7C00).toLong
    if (v >= 0x3F10000000000000L) {                  // normal: |d| >= 2^-14
      // rebias exponent (1023 -> 15), then drop 42 mantissa bits with
      // round-to-nearest-even; a carry out of the mantissa correctly
      // bumps the exponent (65520 ties up to 0x7C00 = inf)
      val h = v - 0x3F00000000000000L
      val r = (h + 0x1FFFFFFFFFFL + ((h >> 42) & 1L)) >> 42
      return (sign | r.toInt).toLong
    }
    if (v <= 0x3E60000000000000L)                    // |d| <= 2^-25 -> ±0
      return sign.toLong                             // (the tie rounds to even)
    // subnormal half: r = RNE(M * 2^(E+24)), M the 53-bit significand
    val e = (v >>> 52).toInt - 1023                  // in [-25, -15]
    val m = (v & 0xFFFFFFFFFFFFFL) | (1L << 52)
    val s = 28 - e                                   // in [43, 53]
    val r = (m + ((1L << (s - 1)) - 1) + ((m >> s) & 1L)) >> s
    (sign | r.toInt).toLong                          // r = 0x400 carries to 2^-14
  }

  /** Exact double value of a binary16 bit pattern (low 16 bits used). */
  def value(b: Long): Double = {
    val h = (b & 0xFFFFL).toInt
    val m = h & 0x3FF
    val e = (h >>> 10) & 0x1F
    val mag =
      if (e == 0) Math.scalb(m.toDouble, -24)
      else if (e == 0x1F) { if (m != 0) return Double.NaN else Double.PositiveInfinity }
      else Math.scalb((m | 0x400).toDouble, e - 25)
    if ((h & 0x8000) != 0) -mag else mag
  }

  /** Column form of [[bits]]: double → binary16 pattern as long. */
  def halfBits(c: Column): Column = column(HalfBits(expression(c)))
  /** Column form of [[value]]: binary16 pattern (long) → double. */
  def halfValue(c: Column): Column = column(HalfValue(expression(c)))
}

/** `graft_half_bits(double) -> bigint`: nearest binary16 bit pattern. */
case class HalfBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_half_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_half_bits requires a double argument, got ${t.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HalfFloat.bits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfFloat.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): HalfBits =
    copy(child = newChild)
}

object HalfBits {
  private[graft] val registryEntry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_half_bits"),
    new ExpressionInfo(classOf[HalfBits].getName, "graft_half_bits"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_half_bits takes one argument")
      HalfBits(args.head)
    })
}

/** `graft_half(bigint) -> double`: exact value of a binary16 pattern. */
case class HalfValue(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_half"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_half requires a numeric argument, got ${t.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HalfFloat.value(input.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfFloat.value((long) $c)")

  override protected def withNewChildInternal(newChild: Expression): HalfValue =
    copy(child = newChild)
}

object HalfValue {
  private[graft] val registryEntry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_half"),
    new ExpressionInfo(classOf[HalfValue].getName, "graft_half"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_half takes one argument")
      HalfValue(args.head)
    })
}
