package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's custom expressions, via both paths:
  *
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` (cluster-wide,
  *     the `SparkSessionExtensions` route), or
  *   - `GraftFunctions.register(spark)` on an existing session.
  *
  * After either, `SELECT rolling_hash(text), min_window_hash(text, 32)`
  * works from plain SQL.
  */
object GraftFunctions {

  /** Enforce the declared argument count with a usable SQL-side message
    * (raw `exprs(i)` indexing surfaced as IndexOutOfBoundsException). */
  private def arity(fn: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$fn expects $n argument${if (n == 1) "" else "s"}, got ${exprs.length}")
      build(exprs)
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      arity("rolling_hash", 1)(exprs => RollingHash(exprs.head))),
    (FunctionIdentifier("min_window_hash"),
      new ExpressionInfo(classOf[MinWindowHash].getName, "min_window_hash"),
      arity("min_window_hash", 2)(exprs =>
        MinWindowHash(exprs.head, intArg(exprs, 1, "min_window_hash")))),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      arity("simhash64", 1)(exprs => SimHash64(exprs.head))),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      arity("vec_dot", 2)(exprs => VecDot(exprs(0), exprs(1)))),
    (FunctionIdentifier("arr_eq_count"),
      new ExpressionInfo(classOf[ArrEqCount].getName, "arr_eq_count"),
      arity("arr_eq_count", 2)(exprs => ArrEqCount(exprs(0), exprs(1)))),
    (FunctionIdentifier("vec_sqdiff"),
      new ExpressionInfo(classOf[VecSqDiff].getName, "vec_sqdiff"),
      arity("vec_sqdiff", 2)(exprs => VecSqDiff(exprs(0), exprs(1)))),
    (FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[SimHashText].getName, "simhash_text"),
      arity("simhash_text", 2)(exprs =>
        SimHashText(exprs.head, boolArg(exprs, 1, "simhash_text")))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      arity("minhash_sig", 3)(exprs =>
        MinHashSig(exprs.head, intArg(exprs, 1, "minhash_sig"), boolArg(exprs, 2, "minhash_sig")))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      arity("shingle_hashes", 2)(exprs =>
        ShingleHashes(exprs.head, boolArg(exprs, 1, "shingle_hashes")))))

  /** Constant argument extraction: any FOLDABLE integer expression is
    * accepted (`8 * 4`, `CAST(32 AS INT)`, ...), like Spark's own
    * constant-argument builtins — not only bare literals. */
  private def intArg(exprs: Seq[Expression], i: Int, fn: String): Int =
    foldedValue(exprs(i), fn, i) match {
      case v: Int => v
      case v: Short => v.toInt
      case v: Byte => v.toInt
      case v: Long if v.isValidInt => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a constant integer, got $other")
    }

  private def boolArg(exprs: Seq[Expression], i: Int, fn: String): Boolean =
    foldedValue(exprs(i), fn, i) match {
      case v: Boolean => v
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a constant boolean, got $other")
    }

  private def foldedValue(e: Expression, fn: String, i: Int): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be a constant (foldable) expression, got $e")
    val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    if (v == null) throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must not be NULL")
    v
  }

  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
