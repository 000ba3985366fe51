package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2c "UDF surface" row).
  *
  * [[SetIntersect]] is the aggregator form of the reference's
  * common-annotation detection (`JobHandler.getCommonAnnotations`,
  * `infrastructure/JobHandler.java:494-546`): fold the intersection of
  * per-record string sets. `None` = identity (no rows yet), so the merge is
  * associative and partial-aggregable — Spark runs it map-side first, which
  * is what makes a fold-style intersection scale (the shuffle carries one
  * (usually small) set per partition, not per record).
  */
object SetIntersect extends Aggregator[Seq[String], Option[Set[String]], Seq[String]] {
  def zero: Option[Set[String]] = None
  def reduce(acc: Option[Set[String]], in: Seq[String]): Option[Set[String]] =
    Some(acc.fold(in.toSet)(_ intersect in.toSet))
  def merge(a: Option[Set[String]], b: Option[Set[String]]): Option[Set[String]] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(x intersect y)
      case _ => a.orElse(b)
    }
  def finish(acc: Option[Set[String]]): Seq[String] =
    acc.getOrElse(Set.empty).toSeq.sorted
  def bufferEncoder: Encoder[Option[Set[String]]] = Encoders.kryo[Option[Set[String]]]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
