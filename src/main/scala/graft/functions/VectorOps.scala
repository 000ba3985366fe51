package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Dot product over two ARRAY<DOUBLE> columns as a native codegen'd
  * expression.
  *
  * Why: the SQL form `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, p) -> acc + p)` allocates an intermediate array and runs 2·dim
  * interpreted lambda calls per row — the entire inner loop of similarity
  * search (SURVEY.md §2d). This expression is one fused multiply-add loop
  * inside whole-stage codegen: no allocation, no virtual calls. At 100 TB
  * the brute-force scorer is exactly this loop times |corpus|·|queries|.
  *
  * The summation is sequential in index order — the same order as the SQL
  * left fold it replaces — so results are bit-identical and the DuckDB
  * oracle comparison stays exact.
  *
  * Precondition: non-null elements (embedding vectors). Shorter input
  * bounds the loop (zip semantics over the common prefix).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(VecDot.evalDot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Named `evalDot`, not `eval`: a companion `eval` collides with the
    * inherited `Expression.eval(InternalRow)` and loses its static
    * forwarder, breaking codegen (see MinWindowHash). */
  def evalDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))

  /** L2 norm as the self-dot square root (one codegen'd loop). */
  def vec_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vec_dot(a, a))
  }
}

/** Squared L2 distance over two ARRAY<DOUBLE> columns — the k-means/knn
  * inner loop. Summation is sequential in index order, exactly the
  * left-to-right fold of the SQL `aggregate(zip_with(a, b,
  * (x, y) -> (x-y)*(x-y)), 0D, +)` it replaces (which runs interpreted —
  * higher-order functions have no codegen), so oracle comparisons stay
  * bit-exact. */
case class VecSqDiff(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdiff"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(VecSqDiff.evalSqDiff(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecSqDiff.evalSqDiff($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecSqDiff =
    copy(left = newLeft, right = newRight)
}

object VecSqDiff {
  /** Named `evalSqDiff`, not `eval` — see the VecDot forwarder note. */
  def evalSqDiff(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def vec_sqdiff(a: Column, b: Column): Column =
    column(VecSqDiff(expression(a), expression(b)))
}

/** Elementwise difference of two ARRAY<DOUBLE> columns — the IVFADC
  * residual step (v − centroid(cell), Jégou et al. §IV). The SQL form
  * `zip_with(a, b, (x, y) -> x - y)` runs INTERPRETED (higher-order
  * functions have no codegen) and at 100 TB the residual projection sits
  * on every corpus row between coarse assignment and PQ encoding; this is
  * one primitive loop writing a fresh array, inside whole-stage codegen.
  * Per-element double subtraction is exact and order-free, so the DuckDB
  * oracle's list comprehension reproduces it bit-for-bit. Shorter input
  * bounds the loop (zip semantics). */
case class VecSub(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sub"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecSub.evalSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecSub.evalSub($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)
}

object VecSub {
  /** Named `evalSub`, not `eval` — see the VecDot forwarder note. */
  def evalSub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def vec_sub(a: Column, b: Column): Column =
    column(VecSub(expression(a), expression(b)))
}

/** Count of positions where two ARRAY<BIGINT> signatures agree — the
  * MinHash similarity-estimate numerator. The SQL form
  * `size(filter(zip_with(a, b, (x, y) -> x = y), m -> m))` allocates two
  * intermediate arrays and runs 2·k INTERPRETED lambda calls per candidate
  * pair (Spark higher-order functions have no codegen); this is one fused
  * loop inside whole-stage codegen. Shorter input bounds the loop. */
case class ArrEqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "arr_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(ArrEqCount.evalCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrEqCount.evalCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrEqCount =
    copy(left = newLeft, right = newRight)
}

object ArrEqCount {
  /** Named `evalCount`, not `eval` — see the VecDot forwarder note. */
  def evalCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def arr_eq_count(a: Column, b: Column): Column =
    column(ArrEqCount(expression(a), expression(b)))
}

/** Sign-bit signature over ARRAY<DOUBLE>: bit i set iff v(i) > 0, first
  * 64 dims packed into one BIGINT — the 1-bit binary-quantization code
  * (q_knn_binary). A 64-term `when(element_at...)` chain expressing the
  * same pack blew past codegen limits and fell back to interpreted
  * evaluation per JOINED PAIR (13× slower than brute force on the 20×
  * probe); this is one codegen'd loop per row. */
case class SignBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sign_bits"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SignBits.evalBits(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBits.evalBits($c);")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object SignBits {
  /** Named `evalBits`, not `eval` — see the VecDot forwarder note. */
  def evalBits(a: ArrayData): Long = {
    val n = math.min(a.numElements(), 64)
    var sig = 0L
    var i = 0
    while (i < n) { if (a.getDouble(i) > 0d) sig |= (1L << i); i += 1 }
    sig
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def sign_bits(a: Column): Column = column(SignBits(expression(a)))
}
