package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Library-level contracts of the dedup API beyond what the oracle-checked
  * queries cover: the maxDf scale knob and parameter plumbing. */
class TextDedupSpec extends SparkSpec {

  private def canon = TextDedup.canonicalize(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id", "text")

  test("maxDf never invents pairs and only drops overlap evidence") {
    val exact = TextDedup.jaccardPairs(canon, "doc_id", "text", threshold = 0.0)
      .select("doc_a", "doc_b", "n_inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val capped = TextDedup.jaccardPairs(canon, "doc_id", "text", threshold = 0.0, maxDf = 2)
      .select("doc_a", "doc_b", "n_inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.keySet.subsetOf(exact.keySet), "cap must not invent pairs")
    assert(capped.forall { case (k, n) => n <= exact(k) },
      "cap can only reduce a pair's shared-shingle count")
    assert(capped.nonEmpty, "fixture must still produce capped pairs")
  }

  test("minhash band/k parameters are validated") {
    assertThrows[IllegalArgumentException](
      TextDedup.minhashPairs(canon, "doc_id", "text", 0.2, k = 32, bands = 7))
  }

  test("simhash band rule follows maxHamming (pigeonhole)") {
    // maxHamming 1 -> 2 bands of 30 bits: identical docs still pair up
    val pairs = TextDedup.simhashPairs(
      spark.createDataFrame(Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),
        (3L, "a completely different document about parquet files"))).toDF("doc_id", "text"),
      "doc_id", "text", maxHamming = 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
