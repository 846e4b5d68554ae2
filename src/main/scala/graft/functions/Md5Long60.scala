package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash of a string — value-identical to the SQL chain
  * `CAST(conv(substring(md5(c), 1, 15), 16, 10) AS BIGINT)` (the first 15
  * hex digits of the digest read as one number = the digest's first 8
  * bytes big-endian, logically shifted right 4), but computed straight
  * from the digest bytes: no hex-string render, no base-16 string parse,
  * no per-call `MessageDigest` allocation. This chain runs once per
  * shingle/token across the whole corpus — the single hottest scalar in
  * the dedup operators — which is exactly the case the brief reserves for
  * a custom codegen'd Catalyst `Expression` over built-in composition.
  *
  * The DuckDB oracles keep the equivalent hex-string SQL
  * ([[DetHash.h60Sql]]); both sides still produce bit-identical values. */
case class Md5Long60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_h60 requires a string argument, got ${t.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    Md5Long60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 8 digest bytes big-endian, >>> 4 == first 15 hex digits. */
  def hash(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** Function-registry entry so `graft_h60('…')` also works in SQL text /
    * `expr(...)` lambdas once the session is built with
    * [[graft.GraftExtensions]]. */
  private[graft] val registryEntry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_h60"),
    new ExpressionInfo(classOf[Md5Long60].getName, "graft_h60"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_h60 takes one argument")
      Md5Long60(args.head)
    })
}
