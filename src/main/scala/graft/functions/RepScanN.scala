package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass intra-document repetition scan generalized to n-gram
  * order `n`: `array(n_grams, max_tf, n_dup)` over the document's word
  * n-grams (same token stream as [[RepScan]]: whitespace split, empties
  * dropped). `n_dup` counts the INSTANCES belonging to an n-gram that
  * occurs at least twice in the document — `n_dup / n_grams` is the
  * Gopher-style "duplicate n-gram fraction" gate, complementing
  * `max_tf / n_grams` (top-gram fraction). One map-side codegen'd loop
  * per document, no shuffles (the relational explode→count→re-aggregate
  * formulation moves every (doc, gram) pair through two corpus-wide
  * exchanges — that form stays in the DuckDB oracle and must agree
  * exactly). `n` must be a foldable literal ≥ 2. */
case class RepScanN(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "rep_scan_n"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "rep_scan_n: gram order must be a literal")
    else right.eval() match {
      case n: Integer if n >= 2 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rep_scan_n: gram order must be an int >= 2, got $other")
    }
  }

  override def nullSafeEval(text: Any, n: Any): Any =
    RepScanN.scanText(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.RepScanN.scanText($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RepScanN =
    copy(left = newLeft, right = newRight)
}

object RepScanN {

  /** Named `scanText`, not `eval` (see [[RepScan.scanText]]). */
  def scanText(text: UTF8String, n: Int): GenericArrayData = {
    val w = text.toString.split("\\s+", -1)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < w.length) { if (w(i).nonEmpty) toks.add(w(i)); i += 1 }
    val counts = new java.util.HashMap[String, java.lang.Integer]()
    var nGrams = 0
    var maxTf = 0
    i = 0
    val sb = new java.lang.StringBuilder
    while (i + n <= toks.size) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      val c = counts.getOrDefault(sb.toString, 0).intValue + 1
      counts.put(sb.toString, c)
      nGrams += 1
      if (c > maxTf) maxTf = c
      i += 1
    }
    var nDup = 0
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().intValue; if (c >= 2) nDup += c }
    new GenericArrayData(Array(nGrams, maxTf, nDup))
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def rep_scan_n(c: Column, n: Int): Column =
    column(RepScanN(expression(c), Literal(n)))
}
