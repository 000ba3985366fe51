package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass intra-document repetition scan:
  * `array(n_bigrams, max_tf)` over the document's word bigrams —
  * consecutive pairs of non-empty whitespace tokens (Java
  * `split("\\s+", -1)` with empties dropped, the same token stream as
  * the vocab/ngram queries).
  *
  * `max_tf / n_bigrams` is the top-bigram fraction — the classic
  * intra-document repetition signal (a Gopher-style filter rule): pages
  * dominated by one repeated phrase (boilerplate, keyword stuffing,
  * scraper loops) score high and get gated out of training corpora.
  *
  * Why an expression and not explode→groupBy: the statistic is a pure
  * per-document function, but the relational formulation shuffles every
  * (doc, bigram) pair corpus-wide TWICE (count per bigram, then
  * re-aggregate per doc) — the same shape the signature operators
  * eliminated. This loop runs once per document, map-side, inside
  * whole-stage codegen; the DuckDB oracle keeps the relational
  * formulation and must agree exactly. */
case class RepScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "rep_scan"

  override def nullSafeEval(input: Any): Any =
    RepScan.scanText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepScan.scanText($c);")

  override protected def withNewChildInternal(newChild: Expression): RepScan =
    copy(child = newChild)
}

object RepScan {

  /** Named `scanText`, not `eval` (a companion `eval` collides with the
    * inherited `Expression.eval` static forwarder and silently disables
    * codegen). */
  def scanText(text: UTF8String): GenericArrayData = {
    val w = text.toString.split("\\s+", -1)
    val counts = new java.util.HashMap[String, java.lang.Integer]()
    var prev: String = null
    var nBigrams = 0
    var maxTf = 0
    var i = 0
    while (i < w.length) {
      val tok = w(i)
      if (tok.nonEmpty) {
        if (prev != null) {
          val key = prev + ' ' + tok
          val c = counts.getOrDefault(key, 0).intValue + 1
          counts.put(key, c)
          nBigrams += 1
          if (c > maxTf) maxTf = c
        }
        prev = tok
      }
      i += 1
    }
    new GenericArrayData(Array(nBigrams, maxTf))
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def rep_scan(c: Column): Column = column(RepScan(expression(c)))
}
