package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.CountMinSketch

/** Re-aggregatable count-min frequency sketches — the frequency twin of
  * the HLL distinct family (`q_hll_union`): build one small sketch per
  * partition-unit (e.g. per day) with Spark's built-in
  * `count_min_sketch` aggregate, then union sketches across any rollup
  * instead of re-scanning rows. At 100 TB this is the
  * store-sketches-not-rows pattern: a day's 8-KB sketch answers
  * frequency queries for any enclosing window.
  *
  * Sketch bytes are the exact wire format Spark's built-in aggregate
  * emits (`CountMinSketch.writeTo`), so union composes with sketches
  * produced by plain SQL, and `mergeInPlace` requires (and checks) that
  * depth/width/seed agree.
  */
object CmsSketch {
  private def read(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))

  private def write(s: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }

  /** Union of serialized CountMinSketch binaries (null-skipping; null on
    * empty input). Deserialize + `mergeInPlace` + reserialize per merge —
    * the buffer count is bounded by partitions, never rows. */
  private class UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = null
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = merge(b, a)
    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      if (x == null) y
      else if (y == null) x
      else {
        val s = read(x)
        s.mergeInPlace(read(y))
        write(s)
      }
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate column: union of count-min sketch binaries. */
  def cms_union(c: Column): Column = udaf(new UnionAgg).apply(c)

  /** Point frequency estimate for a LONG item (guaranteed >= true count;
    * <= true + eps*N with the sketch's confidence). The per-row
    * deserialize is fine here by contract: probes run on the handful of
    * candidate heavy hitters, never on the corpus. */
  def cms_estimate_long(sk: Column, item: Column): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (b: Array[Byte], v: java.lang.Long) =>
        if (b == null || v == null) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(read(b).estimateCount(v)))
    f(sk, item)
  }
}
