package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** One-pass box-filter resize of an opaque binary payload to a fixed
  * `width`-sample thumbnail — the "resize" stage of the multimodal
  * training-data surface ([[graft.operators.MultimodalOps]]). Sample j
  * is the round-half-up mean of the source bytes in
  * `[j·n/width, max((j+1)·n/width, j·n/width + 1))` (unsigned byte
  * values 0-255): the classic integer area/box resample — downsampling
  * averages each bucket, upsampling (n < width) degenerates to
  * nearest-neighbor replication. All arithmetic is exact integer, so
  * the DuckDB oracle mirrors it bit-for-bit from the same definition.
  *
  * Why an expression and not composed built-ins: Spark has no
  * byte-indexing function over `binary`, so the declarative route is
  * hex-string surgery per byte or an explode to one row PER BYTE —
  * at the 100 TB design point that is a payload-length×row blowup
  * before the first aggregate (the oracle SQL does exactly that,
  * which is fine for a correctness reference and fatal for a plan).
  * Here the whole resample is one tight JVM loop per payload inside
  * whole-stage codegen (`doGenCode` emits a static call, the
  * [[LongArrayDot]] / [[SpanAnchors]] shape).
  *
  * Empty payload → empty array (zero thumbnail rows after the
  * caller's `posexplode`, matching the zero-frames convention of
  * [[graft.operators.MultimodalOps.sampleFrames]]); NULL → NULL. */
case class BinaryResize(child: Expression, width: Int)
  extends UnaryExpression {
  require(width > 0, "graft_resize width must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_resize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_resize requires a binary argument, got ${t.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    BinaryResize.resize(input.asInstanceOf[Array[Byte]], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BinaryResize.resize($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): BinaryResize =
    copy(child = newChild)
}

object BinaryResize {
  /** One pass: bucket sums over the payload, round-half-up means out.
    * `(j·n)/w` in Long so a 2 GiB payload × width cannot overflow. */
  def resize(payload: Array[Byte], w: Int): ArrayData = {
    val n = payload.length
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val out = new Array[Int](w)
    var j = 0
    while (j < w) {
      val lo = (j.toLong * n / w).toInt
      var hi = ((j + 1).toLong * n / w).toInt
      if (hi <= lo) hi = lo + 1 // upsampling: at least the nearest byte
      var s = 0L
      var i = lo
      while (i < hi) { s += payload(i) & 0xFF; i += 1 }
      val c = hi - lo
      out(j) = ((2L * s + c) / (2L * c)).toInt // round-half-up mean
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def apply(bin: Column, width: Int): Column =
    ColumnBridge.column(
      BinaryResize(ColumnBridge.expression(bin), width))

  private[graft] val registryEntry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_resize"),
    new ExpressionInfo(classOf[BinaryResize].getName, "graft_resize"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_resize takes (binary, width)")
      val w = args(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"graft_resize width must be an int literal, got $other")
      }
      BinaryResize(args(0), w)
    })
}
