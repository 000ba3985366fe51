package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-isomorphic fixed-width string pack: the first 14 UTF-8 bytes of
  * the input, big-endian NUL-right-padded, as a DECIMAL(38,0) — numeric
  * order ≡ memcmp order on the padded byte string, which is both engines'
  * string comparison, so `min(pack_str14(s))` decodes to exactly
  * `min(s)` (see `graft.queries.Ext.unpackLang` for the inverse).
  *
  * Value-identical to the former SQL formulation
  * `conv(hex(rpad(substring(bytes, 1, 7), 7, 0x00)), 16, 10) * 2^56 +
  * conv(hex(rpad(substring(bytes, 8, 7), 7, 0x00)), 16, 10)` but as ONE
  * codegen'd byte walk: the hex/conv/rpad chain allocated four
  * intermediate strings and ran a base-conversion parse per half per row
  * — measured as ~65% of q_profile's whole aggregate at sf0.1 (the pack
  * fed min AND max over two string columns). Inputs longer than 14 bytes
  * fail loudly, matching the old assert_true guard; NULL stays NULL
  * (UnaryExpression null-propagation) and never reaches the guard. */
case class PackStr14(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "pack_str14"

  override def nullSafeEval(input: Any): Any =
    PackStr14.packBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackStr14.packBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): PackStr14 =
    copy(child = newChild)
}

object PackStr14 {
  /** Named `packBytes`, not `eval` — see the MinWindowHash forwarder note
    * in RollingHash.scala. */
  def packBytes(bytes: Array[Byte]): Decimal = {
    if (bytes.length > 14)
      throw new IllegalArgumentException(
        "lang exceeds the 14-byte order-isomorphic pack")
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 7) {
      hi = (hi << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    while (i < 14) {
      lo = (lo << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    val v = java.math.BigInteger.valueOf(hi).shiftLeft(56)
      .or(java.math.BigInteger.valueOf(lo))
    Decimal(new java.math.BigDecimal(v), 38, 0)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def pack_str14(c: Column): Column = column(PackStr14(expression(c)))
}
