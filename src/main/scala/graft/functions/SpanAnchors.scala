package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined span anchoring + hashing in ONE per-document pass —
  * the hot scalar of [[graft.operators.TextAnalysisOps.spanDedup]]
  * (the exact-substring dedup signal of Lee et al., "Deduplicating
  * Training Data Makes Language Models Better"; anchor scheme à la
  * Schleimer et al.'s winnowing).
  *
  * For a normalized document this returns the [[DetHash]]-style 60-bit
  * md5 hash of every `spanLen`-codepoint window whose start is an
  * ANCHOR: position i (1-based, codepoints) anchors iff the rolling
  * base-31 mod-1000000007 polynomial of the 8 codepoints at i..i+7 is
  * ≡ 0 (mod `anchorMod`). Content-defined starts mean the same
  * substring anchors at the same relative offsets in every document, so
  * an unaligned copy is still caught — which fixed-stride windows
  * structurally miss.
  *
  * Why an expression and not composed built-ins: the anchor probe runs
  * once per CHARACTER of the corpus. As a higher-order-function lambda
  * (the previous shape — an md5 per position) every probe pays
  * interpreted per-element evaluation plus a full digest; here the scan
  * is one tight JVM loop per document — integer rolling arithmetic per
  * position, a digest only at the ~1/anchorMod anchored positions —
  * and the expression itself stays inside whole-stage codegen
  * (`doGenCode` emits a static call, same shape as [[Md5Long60]]).
  * Measured at sf0.1 this removed ~10M interpreted md5 probes from
  * llm_span_dedup.
  *
  * Cross-engine contract (the DuckDB oracle mirrors it verbatim):
  * codepoints via `string_split(norm, '')` + `ascii`, the same 8-term
  * Horner mod 1000000007, `substr(norm, i, spanLen)` + h60 at anchors.
  * All arithmetic is exact signed-64-bit: max intermediate is
  * (P-1)*31 + 0x10FFFF < 2⁶³. */
case class SpanAnchors(child: Expression, spanLen: Int, anchorMod: Int)
  extends UnaryExpression {
  require(spanLen >= 8 && anchorMod > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_anchors"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_span_anchors requires a string argument, got ${t.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    SpanAnchors.spans(input.asInstanceOf[UTF8String], spanLen, anchorMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpanAnchors.spans($c, $spanLen, $anchorMod)")

  override protected def withNewChildInternal(newChild: Expression): SpanAnchors =
    copy(child = newChild)
}

object SpanAnchors {
  /** Polynomial modulus/base shared with the SQL mirror ([[anchorSql]]). */
  val PolyP = 1000000007L
  val PolyB = 31L
  /** Probe window: 8 codepoints, the prefix whose hash decides anchoring. */
  val Window = 8

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def column(norm: Column, spanLen: Int, anchorMod: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      SpanAnchors(ColumnBridge.expression(norm), spanLen, anchorMod))
  }

  /** One pass over the document: rolling window polynomial, h60 digest at
    * anchors. Codepoint-indexed to match SQL `substr`/`ascii` semantics
    * (surrogate pairs count once). */
  def spans(s: UTF8String, spanLen: Int, anchorMod: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray()
    val n = cps.length
    if (n < spanLen) return new GenericArrayData(Array.empty[Long])
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    // highest-position base power, for removing the outgoing codepoint
    var bw = 1L
    var k = 1
    while (k < Window) { bw = bw * PolyB % PolyP; k += 1 }
    // h = polynomial of cps[j .. j+Window-1], here for j = 0
    var h = 0L
    k = 0
    while (k < Window) { h = (h * PolyB + cps(k)) % PolyP; k += 1 }
    val d = digests.get()
    var j = 0
    val last = n - spanLen // inclusive, 0-based window starts
    while (j <= last) {
      if (h % anchorMod == 0) {
        d.reset()
        val span = new String(cps, j, spanLen)
        val dig = d.digest(span.getBytes("UTF-8"))
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (dig(b) & 0xFFL); b += 1 }
        out += (v >>> 4)
      }
      if (j + Window < n) {
        h = ((h - cps(j) * bw % PolyP + PolyP) % PolyP * PolyB
          + cps(j + Window)) % PolyP
      }
      j += 1
    }
    new GenericArrayData(out.result())
  }

  /** DuckDB fragment of the anchor predicate over a codepoint list `cs`
    * at 1-based position `i` — the 8-term Horner the rolling loop above
    * maintains incrementally. */
  def anchorSql(cs: String, i: String, anchorMod: Int): String = {
    val horner = (0 until Window).foldLeft("CAST(0 AS BIGINT)") {
      (acc, k) => s"(($acc * $PolyB + $cs[$i+$k]) % $PolyP)"
    }
    s"$horner % $anchorMod = 0"
  }
}
