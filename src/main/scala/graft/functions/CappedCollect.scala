package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `capped_collect_list(e, cap)`: collect the group's values like
  * `collect_list`, but return NULL for any group whose total row count
  * exceeds `cap` — with per-group buffer memory bounded at `cap` elements
  * BY CONSTRUCTION (the count keeps running past the cap; the items are
  * discarded the moment it crosses).
  *
  * This is the skew guard for bucket-join dedup at 100 TB: a degenerate
  * LSH bucket (boilerplate corpus → millions of docs behind one
  * (band, bkey)) would make both the collected list and the downstream
  * pair explode quadratically pathological. A post-hoc
  * `filter(size(ds) <= cap)` bounds the OUTPUT but still materializes the
  * full list in one aggregation task first; a salted join bounds task
  * input but still computes the full Σ|bucket|² pair output. Capping
  * inside the aggregate bounds memory, shuffle bytes AND output in one
  * pass, and drops exactly the degenerate buckets — the same
  * exactness/cost trade as `jaccardPairs(maxDf)`, which it generalizes.
  *
  * Skipped-null semantics match `collect_list` (null inputs are not
  * counted and not collected). */
case class CappedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectList.Buffer] with UnaryLike[Expression] {
  require(cap > 0, "cap must be positive")

  import CappedCollectList.Buffer

  override def prettyName: String = "capped_collect_list"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Buffer = new Buffer(0L, mutable.ArrayBuffer.empty)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      b.n += 1
      if (b.n <= cap) b.items += InternalRow.copyValue(v)
      else if (b.items.nonEmpty) b.items.clear()
    }
    b
  }

  override def merge(b: Buffer, o: Buffer): Buffer = {
    b.n += o.n
    if (b.n <= cap) b.items ++= o.items
    else if (b.items.nonEmpty) b.items.clear()
    b
  }

  override def eval(b: Buffer): Any =
    if (b.n > cap) null else new GenericArrayData(b.items.toArray)

  // buffer wire format: one UnsafeRow (n BIGINT, items ARRAY<childType>)
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](LongType, dataType))

  override def serialize(b: Buffer): Array[Byte] =
    bufProjection(InternalRow(b.n, new GenericArrayData(b.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(1)
    val items = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      items += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    new Buffer(row.getLong(0), items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)
}

object CappedCollectList {
  /** Mutable per-group state: running count + at most `cap` collected items. */
  final class Buffer(var n: Long, val items: mutable.ArrayBuffer[Any])

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def capped_collect_list(c: Column, cap: Int): Column =
    column(CappedCollectList(expression(c), cap).toAggregateExpression())
}
