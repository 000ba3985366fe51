package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries(e, k)`: mergeable Misra–Gries frequent-items summary
  * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012) over a string column. Returns one struct
  * `(total BIGINT, candidates ARRAY<STRING>)` where `total` is the
  * number of non-null rows aggregated and `candidates` (sorted, at most
  * `k` entries) is a SUPERSET of every item whose true count exceeds
  * `total / (k + 1)`.
  *
  * This is the bounded-shuffle half of exact distributed heavy hitters:
  * a plain `groupBy(item).count()` shuffles every distinct item — at
  * 100 TB a segment/n-gram keyspace has billions of keys, most of them
  * singletons that exist only to be filtered out. The sketch pass keeps
  * at most `k` counters per partial aggregate (partial aggregation means
  * each map task ships one `k`-entry summary, not its raw keys), the
  * guaranteed-superset candidates broadcast back as an `InSet` filter,
  * and the exact verification `groupBy` then shuffles at most `k` keys
  * regardless of corpus size. Choosing `k` comfortably above the target
  * support `1/phi` (e.g. `k = 2*phi`) keeps the superset guarantee
  * strict at the threshold boundary, and the final exact re-count makes
  * the query's OUTPUT independent of partitioning and merge order — only
  * the candidate superset varies, never the verified result.
  *
  * Null inputs are skipped (not counted in `total`), matching
  * `collect_list` semantics. Update cost is O(1) amortized (each
  * decrement pass is charged against prior increments); merge is
  * O(k log k) via one sort to find the (k+1)-th largest count.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buffer] with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  import MisraGriesAgg.Buffer

  override def prettyName: String = "misra_gries"

  // type check deferred to analysis (the child is unresolved at construction)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string column, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("candidates", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buffer =
    new Buffer(0L, mutable.HashMap.empty)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      b.total += 1
      val key = v.asInstanceOf[UTF8String].toString
      b.counts.get(key) match {
        case Some(c) => b.counts.update(key, c + 1)
        case None if b.counts.size < k => b.counts.update(key, 1L)
        case None =>
          // classic MG step: a miss on a full summary decrements every
          // counter; zeros vacate their slots. Amortized O(1): each of
          // the k decrements cancels one earlier increment.
          val dead = mutable.ArrayBuffer.empty[String]
          b.counts.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else b.counts.update(kk, c - 1)
          }
          dead.foreach(b.counts.remove)
      }
    }
    b
  }

  override def merge(b: Buffer, o: Buffer): Buffer = {
    b.total += o.total
    o.counts.foreach { case (kk, c) =>
      b.counts.update(kk, b.counts.getOrElse(kk, 0L) + c)
    }
    if (b.counts.size > k) {
      // mergeable-summaries rule: subtract the (k+1)-th largest count
      // from every counter; at most k stay positive, and any item with
      // global count > total/(k+1) is still present afterwards.
      val vs = b.counts.values.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(vs.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      b.counts.foreach { case (kk, c) =>
        if (c <= cut) dead += kk else b.counts.update(kk, c - cut)
      }
      dead.foreach(b.counts.remove)
    }
    b
  }

  override def eval(b: Buffer): Any = {
    val cands = b.counts.keysIterator.toArray
    java.util.Arrays.sort(cands, java.util.Comparator.naturalOrder[String]())
    InternalRow(b.total,
      new GenericArrayData(cands.map(UTF8String.fromString(_): Any)))
  }

  // buffer wire format: one UnsafeRow (total BIGINT, keys ARRAY<STRING>,
  // counts ARRAY<BIGINT>), parallel arrays
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](
      LongType, ArrayType(StringType, containsNull = false),
      ArrayType(LongType, containsNull = false)))

  override def serialize(b: Buffer): Array[Byte] = {
    val keys = new Array[Any](b.counts.size)
    val cnts = new Array[Any](b.counts.size)
    var i = 0
    b.counts.foreach { case (kk, c) =>
      keys(i) = UTF8String.fromString(kk); cnts(i) = c; i += 1
    }
    bufProjection(InternalRow(b.total,
      new GenericArrayData(keys), new GenericArrayData(cnts))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val row = new UnsafeRow(3)
    row.pointTo(bytes, bytes.length)
    val keys = row.getArray(1)
    val cnts = row.getArray(2)
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < keys.numElements()) {
      m.update(keys.getUTF8String(i).toString, cnts.getLong(i))
      i += 1
    }
    new Buffer(row.getLong(0), m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** Mutable aggregate state: non-null row count + at most k counters. */
  final class Buffer(var total: Long, val counts: mutable.HashMap[String, Long])

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def misra_gries(c: Column, k: Int): Column =
    column(MisraGriesAgg(expression(c), k).toAggregateExpression())
}
