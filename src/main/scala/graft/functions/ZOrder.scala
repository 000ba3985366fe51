package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-ORDER (Morton) interleave key for multi-dimensional data layout —
  * the clustering technique behind Delta/Iceberg OPTIMIZE ZORDER BY:
  * sort/range-partition by the interleaved key and BOTH dimensions
  * become locally clustered, so parquet row-group min/max stats prune
  * 2-D box predicates that a single-column sort can only prune on its
  * leading column. Layout-only: the key never changes query results,
  * which is exactly what q_zorder_layout's oracle (the same box query
  * over the ORIGINAL table) verifies.
  *
  * Inputs are non-negative bucket indices; the low 32 bits of each
  * operand interleave into one BIGINT (left takes even bit positions).
  * Callers bucket raw values first (e.g. `floor(x / width)`), which is
  * also what keeps the contract portable — the key is a deterministic
  * function of two integers.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKey.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Bit-spread each 32-bit operand to alternating positions (the
    * standard mask-shift ladder) and OR them offset by one. */
  def interleave(a: Long, b: Long): Long =
    spread(a & 0xFFFFFFFFL) | (spread(b & 0xFFFFFFFFL) << 1)

  def spread(v0: Long): Long = {
    var v = v0
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def zorder_key(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(ZOrderKey(expression(a), expression(b)))
  }
}
