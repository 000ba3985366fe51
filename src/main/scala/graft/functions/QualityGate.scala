package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The quality-gate decision as ONE single-pass expression: the first
  * failing rule's reason, or "ok".
  *
  * Rules (first match wins), identical to the former column formulation —
  * the DuckDB oracle keeps that formulation and must agree exactly:
  *   - split-token count < minTokens            -> "too_short"
  *   - (chars - ws chars) / chars < minAlpha    -> "low_alpha"
  *   - short-run count / tokens > maxShortRatio -> "high_short"
  *   - stopword runs / tokens < minStopRatio    -> "no_stopwords"
  *
  * Why: the CASE-chain column form re-evaluates `word_scan` per WHEN
  * branch once a filter absorbs it — FilterExec codegen has no
  * cross-predicate subexpression elimination, so a document passing all
  * rules paid ~4 scans. This expression runs the scan once per document
  * and compares in place, with the identical IEEE double arithmetic
  * (int diffs/casts then one divide per ratio). */
case class QualityGate(
    child: Expression,
    words: Seq[String],
    shortLen: Int,
    minTokens: Int,
    minAlpha: Double,
    maxShortRatio: Double,
    minStopRatio: Double) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "quality_gate"

  @transient private lazy val set: java.util.HashSet[String] = WordScan.toSet(words)

  override def nullSafeEval(input: Any): Any =
    QualityGate.reasonFor(input.asInstanceOf[UTF8String], set, shortLen,
      minTokens, minAlpha, maxShortRatio, minStopRatio)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set, classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.QualityGate.reasonFor(
         |  $c, $setRef, $shortLen, $minTokens, $minAlpha, $maxShortRatio, $minStopRatio);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QualityGate =
    copy(child = newChild)
}

object QualityGate {
  private val TooShort = UTF8String.fromString("too_short")
  private val LowAlpha = UTF8String.fromString("low_alpha")
  private val HighShort = UTF8String.fromString("high_short")
  private val NoStopwords = UTF8String.fromString("no_stopwords")
  private val Ok = UTF8String.fromString("ok")

  /** Named `reasonFor`, not `eval` (companion `eval` gets no static
    * forwarder and silently disables codegen). */
  def reasonFor(
      text: UTF8String,
      set: java.util.HashSet[String],
      shortLen: Int,
      minTokens: Int,
      minAlpha: Double,
      maxShortRatio: Double,
      minStopRatio: Double): UTF8String = {
    val sc = WordScan.scanBytes(text, set, shortLen)
    val nTokens = sc.getInt(3)
    if (nTokens < minTokens) return TooShort
    val nChars = text.numChars()
    if ((nChars - sc.getInt(4)).toDouble / nChars.toDouble < minAlpha) return LowAlpha
    if (sc.getInt(1).toDouble / nTokens.toDouble > maxShortRatio) return HighShort
    if (sc.getInt(0).toDouble / nTokens.toDouble < minStopRatio) return NoStopwords
    Ok
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def quality_gate(
      c: Column,
      words: Seq[String],
      shortLen: Int,
      minTokens: Int = 10,
      minAlpha: Double = 0.7,
      maxShortRatio: Double = 0.4,
      minStopRatio: Double = 0.01): Column =
    column(QualityGate(expression(c), words, shortLen,
      minTokens, minAlpha, maxShortRatio, minStopRatio))
}
