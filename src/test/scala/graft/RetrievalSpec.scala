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

  test("mmrRerank: diversifies where plain top-k returns near-duplicates; " +
    "internal checkpoints released") {
    import spark.implicits._
    // Query q = (1, 0). Candidates: a pair of near-identical vectors
    // hugging q (ids 1, 2) and one still-relevant but off-axis vector
    // (id 3). Plain top-2 by cosine = {1, 2} (the near-dup failure
    // mode); at λ=0.5 MMR's second pick must skip 2 — sim(1,2) ≈ 1
    // wipes its margin (mmr4 ≈ −74) — and take 3, whose relevance
    // (7071) exceeds its similarity to the picked vector (6247),
    // mmr4 = +824.
    val e = Seq(
      (0L, Seq(1.0, 0.0)),    // query
      (1L, Seq(0.9, 0.1)),    // best match
      (2L, Seq(0.9, 0.11)),   // near-copy of 1
      (3L, Seq(0.5, -0.5))    // relevant AND diverse
    ).toDF("vec_id", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Retrieval.mmrRerank(e, col("vec_id") === 0, topN = 3, k = 2)
    val picks = got.orderBy("step").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(picks.toSeq == Seq((1, 1L), (2, 3L)),
      s"step 1 takes the best match, step 2 must take the DIVERSE vector " +
        s"(plain top-2 would return the near-copy): ${picks.toSeq}")
    // lifecycle: only the returned (checkpointed) frame may stay persisted
    val live = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(live.size <= 1,
      s"mmrRerank leaked internal checkpoints: ${live.size} persisted RDDs")
    graft.plans.Checkpoints.release(got)
  }

  test("crossEncoderRerank: joint text evidence overturns the dense order; " +
    "rank movement is recorded; empty-token pairs don't divide by zero") {
    import spark.implicits._
    // Query 0 = (1,0) "x y z". Candidate 1 hugs the query vector but
    // shares NO tokens; candidate 2 is further in embedding space but
    // textually identical. Dense order: 1 then 2. The joint scorer must
    // flip it: cand 2 earns the full 1e6 Jaccard term (3/3) on top of
    // cos ~0.832, cand 1 only its cos ~0.973 — the bi-encoder's classic
    // false positive (semantically-near vector, unrelated text) demoted
    // by evidence only a joint reader sees.
    val e = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.95, 0.1)),
      (2L, Seq(0.6, 0.4))
    ).toDF("vec_id", "v")
    val docs = Seq(
      (0L, "x y z"), (1L, "p q r"), (2L, "x y z")).toDF("doc_id", "text")
    val got = graft.operators.Retrieval.crossEncoderRerank(
      e, docs, col("vec_id") === 0, topN = 2, k = 2)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getInt(6), r.getInt(7), r.getInt(8)))
    assert(got.toSeq == Seq(
      // (doc_id, n_inter, n_union, rk_dense, rk, moved)
      (2L, 3L, 3L, 2, 1, 1),
      (1L, 0L, 6L, 1, 2, -1)),
      s"textually-identical candidate must be promoted to #1: ${got.toSeq}")

    // both texts tokenless -> n_union = 0 -> Jaccard term is 0, not an
    // error; ranking falls back to the cosine term alone
    val docs2 = Seq((0L, ""), (1L, ""), (2L, "x y z")).toDF("doc_id", "text")
    val got2 = graft.operators.Retrieval.crossEncoderRerank(
      e, docs2, col("vec_id") === 0, topN = 2, k = 2)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getLong(5)))
    assert(got2.head._1 == 1L,
      s"with no token evidence anywhere the dense order must hold: ${got2.toSeq}")
  }

  test("crossJaccardPairs: bipartite jaccard matches the hand value and " +
    "never pairs within one side") {
    import spark.implicits._
    // archive doc 1 and batch doc 10 share 2 of (3 + 3 - 2) distinct
    // 3-gram shingles -> jaccard 0.5; batch doc 12 shares nothing.
    // Archive docs 1 and 2 are near-identical but must NOT pair (same
    // side); short batch doc 14 (< 3 tokens) emits no shingles at all.
    val archive = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d x"),
      (12L, "p q r s t"),
      (14L, "a b")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextDedup.crossJaccardPairs(
      archive, batch, "doc_id", "text", threshold = 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // shingles of "a b c d e": {abc, bcd, cde}; of "a b c d x": {abc, bcd, cdx}
    // inter = 2, union = 3 + 3 - 2 = 4 -> 0.5
    assert(got == Map((1L, 10L) -> 0.5, (2L, 10L) -> 0.5),
      s"exactly the two archive->batch matches at jaccard 0.5: $got")
  }
}
