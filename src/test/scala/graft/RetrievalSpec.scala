package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {

  test("rrfFuse: consensus beats a single-arm #1; non-retrieved docs " +
    "contribute zero; nano-units are exact") {
    import spark.implicits._
    // Arm 1 ranks: d100 #1, d200 #3. Arm 2 ranks: d200 #3 only (d100
    // missing). RRF(d200) = round(1e9/63)*2 = 31_746_032, RRF(d100) =
    // round(1e9/61) = 16_393_443: the doc BOTH arms agree on (even at a
    // modest rank) must outrank the doc only one arm loved — the
    // consensus property that makes RRF a hybrid combiner rather than a
    // max over arms.
    val arm1 = Seq((1L, 100L, 1), (1L, 200L, 3)).toDF("q_id", "doc_id", "rk")
    val arm2 = Seq((1L, 200L, 3)).toDF("q_id", "doc_id", "rk")
    val got = Retrieval.rrfFuse(Seq(arm1, arm2), kRrf = 60, topK = 10)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (200L, 31746032L, 2L, 1),
      (100L, 16393443L, 1L, 2)),
      s"expected consensus doc first with exact nano sums: ${got.toSeq}")
  }

  test("bm25MoreLikeThis: query doc excluded, only its terms score, " +
    "higher-overlap doc ranks first") {
    import spark.implicits._
    // nd = 5: beta (df 2) gets idf ln(3.5/2.5) > 0, so doc 1's extra
    // shared term separates it STRICTLY from doc 2 (alpha alone scores
    // identically for both — same tf, same length)
    val docs = Seq(
      (0L, "alpha beta gamma"), // query doc
      (1L, "alpha beta delta"), // shares 2 query terms
      (2L, "alpha zeta zeta"), // shares 1
      (3L, "omega psi chi"), // shares 0 -> absent from the ranking
      (4L, "omega omega psi")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25MoreLikeThis(docs, col("doc_id") === 0, topK = 10)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L),
      s"doc 1 (2 shared terms) before doc 2 (1), doc 0 (self) and doc 3 " +
        s"(no overlap) absent: ${got.toSeq}")
    assert(got.map(_._2).toSeq == Seq(1, 2))
  }
}
