package graft.functions

/** The deterministic random-hyperplane LSH family shared by the batch
  * queries (`q_knn_lsh`, `q_dedup_embedding_lsh`, `q_dedup_semantic`)
  * and the streaming embedding near-dup operator: an 8×64 sign matrix
  * derived from md5 bits at BUILD time and embedded as literals
  * everywhere it is used — the same buckets on every engine (Spark
  * expression, DuckDB oracle, streaming closure) by construction, with
  * no runtime hashing of dimension indices to drift.
  */
object LshPlanes {
  /** planes(j)(d) ∈ {+1, −1}. */
  val planes: IndexedSeq[IndexedSeq[Int]] =
    IndexedSeq.tabulate(8, 64) { (j, d) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-lsh:$j:$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1 else -1
    }

  /** The 8-bit sign bucket of a vector, scalar form — bit j set iff the
    * index-order dot with plane j is ≥ 0, exactly the codegen'd
    * `vec_dot`-based column the batch queries fold (same summation
    * order, so the same double, so the same bucket). Dimensions beyond
    * 64 are ignored; shorter vectors use the common prefix (zip
    * semantics, matching `vec_dot`). */
  def bucketOf(v: Seq[Double]): Long = {
    var bucket = 0L
    var j = 0
    while (j < 8) {
      val p = planes(j)
      val n = math.min(v.length, 64)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += v(d) * p(d); d += 1 }
      if (acc >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}
