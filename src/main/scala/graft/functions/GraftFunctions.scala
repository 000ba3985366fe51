package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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

  private def mwh(exprs: Seq[Expression]): Expression = {
    val w = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"min_window_hash window must be an integer literal, got $other")
    }
    MinWindowHash(exprs.head, w)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)),
    (FunctionIdentifier("min_window_hash"),
      new ExpressionInfo(classOf[MinWindowHash].getName, "min_window_hash"),
      (exprs: Seq[Expression]) => mwh(exprs)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))),
    (FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[SimHashText].getName, "simhash_text"),
      (exprs: Seq[Expression]) => SimHashText(exprs.head, boolLit(exprs, 1, "simhash_text"))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head, intLit(exprs, 1, "minhash_sig"), boolLit(exprs, 2, "minhash_sig"))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head, boolLit(exprs, 1, "shingle_hashes"))))

  private def intLit(exprs: Seq[Expression], i: Int, fn: String): Int =
    exprs(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be an integer literal, got $other")
    }

  private def boolLit(exprs: Seq[Expression], i: Int, fn: String): Boolean =
    exprs(i) match {
      case Literal(v: Boolean, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a boolean literal, got $other")
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
