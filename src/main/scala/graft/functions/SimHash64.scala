package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash: 64-bit bit-vote signature over an array of feature hashes,
  * packed into one BIGINT (Charikar, STOC'02).
  *
  * Why a native expression: the same computation as a SQL higher-order
  * `aggregate(sequence(0,63), ...aggregate(hs, ...))` runs ~64·|tokens|
  * *interpreted* lambda evaluations per row — measured 15.7 s over 5k docs
  * at sf0.1. This codegen'd loop does one pass with an int[64] vote array
  * inside whole-stage codegen (~0.2 s for the same input). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.evalVotes(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.evalVotes($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Named `evalVotes` (not `eval`): a companion `eval` collides with the
    * inherited `Expression.eval(InternalRow)`, so scalac emits no static
    * forwarder and codegen falls back to interpreted execution. */
  def evalVotes(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(SimHash64(expression(c)))
  }
}
