package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: the sparse (lexical) arm, and the rank-level fusion
  * that combines it with the dense (embedding) arm — the retrieval stack
  * behind search-based corpus curation (find documents about a topic to
  * up/down-weight, mine eval sets, build contrastive pairs). Sparse and
  * dense retrieval fail differently (vocabulary mismatch vs semantic
  * drift); reciprocal-rank fusion combines them WITHOUT score
  * calibration, which is what makes it the default hybrid combiner — the
  * two arms' scores (BM25 sums vs cosines) are never comparable, their
  * RANKS always are.
  *
  * Determinism contract (both operators): every ranking orders by an
  * exact integer score with `doc_id` as the tiebreaker, so cross-engine
  * replay is bit-for-bit (the q_tfidf micro-rounding convention: both
  * engines evaluate the identical double expression tree, round ONCE to
  * integer units, and all downstream arithmetic is exact BIGINT).
  */
object Retrieval {

  /** BM25 "more-like-this": for each query document (rows matching
    * `queryPred`), rank the rest of the corpus by BM25 where the query's
    * TERM SET is the document's distinct whitespace tokens (Robertson-
    * Spärck Jones, k1 = 1.2, b = 0.75 — the q_bm25 scorer generalized
    * from one literal term list to per-query-doc term frames).
    *
    * Plan shape: the corpus tokenizes ONCE (one scan feeds tf, lens and
    * df); the tiny (q_id, term) frame broadcasts into the postings join,
    * so only query-term postings ever aggregate. Per-(q, doc, term)
    * scores round to micro-units before the exact integer sum. At 100 TB
    * df/idf and doc lengths come from a precomputed term-statistics
    * table maintained at ingest (they are corpus properties, not query
    * properties); the per-query work is only the postings of its terms.
    *
    * Returns (q_id, doc_id, bm25_micro, rk) with rk <= topK, ranked by
    * (bm25_micro DESC, doc_id); the query document itself is excluded.
    */
  def bm25MoreLikeThis(docs: DataFrame, queryPred: Column, topK: Int): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val lens = words.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = lens.agg(count(lit(1)).as("nd"),
      sum(col("len")).as("tl"))
    val qterms = words.filter(queryPred)
      .select(col("doc_id").as("q_id"), col("w")).distinct()
    // ONE broadcast semi-join prunes the token stream to query-term
    // postings; document frequency and per-query tf both derive from it
    // (df distinct-drops the q_id multiplicity, so it equals the former
    // separate w-keyed semi-join) — the former two independent joins
    // tokenized the corpus twice and built the query-term broadcast twice
    val matched = words.join(broadcast(qterms), Seq("w"))
    val dfq = matched
      .select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val tfq = matched
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val avgLen = col("tl").cast("double") / col("nd")
    val idf = log(((col("nd") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val denom = col("tf").cast("double") +
      lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * (col("len").cast("double") / avgLen))
    val term = idf * ((col("tf").cast("double") * lit(2.2)) / denom)
    val scored = tfq.join(broadcast(dfq), Seq("w"))
      .join(lens, Seq("doc_id")).crossJoin(broadcast(stats))
      .withColumn("term_micro", round(term * lit(1000000.0), 0).cast("bigint"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("term_micro")).as("bm25_micro"))
    val w = Window.partitionBy("q_id").orderBy(col("bm25_micro").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select(col("q_id"), col("doc_id"), col("bm25_micro"), col("rk"))
  }

  /** MAXIMAL MARGINAL RELEVANCE re-rank (Carbonell & Goldstein 1998) —
    * the diversity stage between retrieval and consumption: from each
    * query's `topN` cosine candidates, greedily select `k` where every
    * pick maximizes relevance MINUS similarity to what's already picked
    * (λ = 0.5, so the reported `mmr4` is the doubled score
    * rel4 − maxsim4 in exact 1e-4 integer units). Kills the
    * near-duplicate-results failure mode of plain top-k — the retrieval
    * counterpart of SemDeDup on the corpus side.
    *
    * Scale shape: candidate generation is [[Similarity.knn]] (swap in
    * the IVF tiers at corpus scale — the MMR stage doesn't care); after
    * that EVERYTHING is bounded by queries × topN: the pairwise-sim
    * frame is a per-query self-join of a topN-row frame (queries ×
    * topN² rows), and the whole k-step greedy runs LOCALLY per query
    * group after one queries-sized shuffle — no driver-side loop, no
    * per-step cluster barrier (round 18; the former per-step
    * checkpointed rounds cost 50 jobs at k=5).
    *
    * Determinism: cosines round to 4 decimals then scale to exact
    * BIGINT 1e-4 units (round-then-cast, never truncate), every argmax
    * breaks ties by the neighbor id — the oracle replays all k steps.
    * Returns (q_id, step, nb, rel4, maxsim4, mmr4), one row per pick. */
  def mmrRerank(e: DataFrame, queryPred: Column, topN: Int, k: Int): DataFrame = {
    require(topN >= k && k >= 1)
    import graft.functions.VecDot.vec_dot
    // ONE-PASS greedy (round 18, guide §1.2 "the distributed algorithm
    // first"): MMR's greedy selection is INDEPENDENT PER QUERY, so after
    // candidate generation the whole k-step loop is local to one
    // (q_id, candidates, pairwise-sims) group — at most topN + topN² rows
    // of small integers per query, bounded by construction. The former
    // implementation ran the loop as k driver-synchronized Spark rounds
    // (an eager unionByName checkpoint per step: 50 jobs at k=5 in the
    // JobProbe trace); now the candidate frame shuffles ONCE by q_id and
    // a per-group loop replays the identical integer arithmetic —
    // rel4/sim4 still come from the SAME Spark expressions (collected
    // per group), so every picked row is bit-for-bit the old one, just
    // without k cluster barriers. At 100 TB this is the difference
    // between k full-cluster synchronizations per rerank and one
    // queries-sized shuffle.
    val cand = Similarity.knn(e, queryPred, topN)
      .select(col("q_id"), col("neighbor").as("nb"),
        round(col("cos") * 10000, 0).cast("bigint").as("rel4"))
      .localCheckpoint(eager = false) // pinned: feeds cands agg AND the pair self-join
    val nv = e.select(col("vec_id").as("nb"), col("v"))
      .withColumn("nrm", sqrt(vec_dot(col("v"), col("v"))))
    val cv = cand.join(nv, "nb").select(col("q_id"), col("nb"), col("v"), col("nrm"))
    val ps = cv.as("x").join(cv.as("y"), "q_id")
      .filter(col("x.nb") =!= col("y.nb"))
      .select(col("q_id"), col("x.nb").as("a"), col("y.nb").as("b"),
        round(round(vec_dot(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm")), 4) * 10000, 0).cast("bigint").as("sim4"))
    val cs = cand.groupBy("q_id")
      .agg(collect_list(struct(col("nb"), col("rel4"))).as("cands"))
    val pss = ps.groupBy("q_id")
      .agg(collect_list(struct(col("a"), col("b"), col("sim4"))).as("sims"))
    // the greedy itself: step 1 takes max rel4 (ties: lowest nb); step i
    // takes max (rel4 − max sim4 to any picked) among candidates that
    // HAVE a pair row to a picked id (every remaining candidate does —
    // ps spans all within-candidate pairs — matching the old inner-join
    // semantics exactly), ties: lowest nb. Bounded driver-free work:
    // O(k·topN) per query inside one projection.
    val greedy = udf((cands: Seq[org.apache.spark.sql.Row],
                      sims: Seq[org.apache.spark.sql.Row]) => {
      val rel = cands.map(r => (r.getLong(0), r.getLong(1)))
      val sim = new scala.collection.mutable.HashMap[(Long, Long), Long]
      if (sims != null) sims.foreach(r => sim((r.getLong(0), r.getLong(1))) = r.getLong(2))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
      val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
      var remaining = rel
      if (remaining.nonEmpty) {
        val first = remaining.minBy { case (nb, r4) => (-r4, nb) }
        out += ((1, first._1, first._2, 0L, first._2))
        picked += first._1
        remaining = remaining.filterNot(_._1 == first._1)
        var step = 2
        while (step <= k && remaining.nonEmpty) {
          val scored = remaining.flatMap { case (nb, r4) =>
            val ss = picked.flatMap(b => sim.get((nb, b)))
            if (ss.isEmpty) None // no pair row to any pick: not selectable (old join semantics)
            else Some((nb, r4, ss.max))
          }
          if (scored.isEmpty) { step = k + 1 } // nothing selectable: loop ends
          else {
            val best = scored.minBy { case (nb, r4, ms) => (-(r4 - ms), nb) }
            out += ((step, best._1, best._2, best._3, best._2 - best._3))
            picked += best._1
            remaining = remaining.filterNot(_._1 == best._1)
            step += 1
          }
        }
      }
      out.toSeq
    })
    val sel = cs.join(pss, Seq("q_id"), "left")
      .select(col("q_id"), explode(greedy(col("cands"), col("sims"))).as("p"))
      .select(col("q_id"), col("p._1").as("step"), col("p._2").as("nb"),
        col("p._3").as("rel4"), col("p._4").as("maxsim4"), col("p._5").as("mmr4"))
      .localCheckpoint(true)
    graft.plans.Checkpoints.release(cand)
    sel
  }

  /** Cross-encoder-style RERANK replay: stage 1 retrieves each query's
    * dense cosine top-`topN` (the bi-encoder pass — texts scored through
    * their independent embeddings); stage 2 re-scores every surviving
    * (query, candidate) pair with a scorer that reads BOTH texts jointly
    * — the defining property of a cross-encoder, which no pair of
    * independent vectors can express. The joint scorer here is
    * deterministic and model-free (this container carries no model):
    * distinct-token overlap Jaccard between the two texts, blended with
    * the stage-1 cosine in exact 1e-6 integer units
    * (`cross_micro = round(cos·1e6) + (1e6·|A∩B|) div |A∪B|` — the
    * second term is non-negative integer division, where truncating and
    * flooring agree, so cross-engine replay is bit-for-bit). A real
    * ONNX/DJL scorer slots into the same seam with the same bounded
    * input frame: queries × topN text pairs, never corpus × corpus.
    *
    * Output keeps both ranks plus `moved = rk_dense - rk`, making rank
    * MOVEMENT — the rerank's whole point — a first-class column.
    *
    * Scale shape: stage 2 is bounded by queries·topN rows; candidate
    * texts arrive by broadcasting the bounded pair frame into one
    * corpus-token scan (tokenization is per-doc, map-side, no shuffle
    * before the bounded joins). At 100 TB the expensive part stays
    * stage 1 — exactly the ANN ladder's problem, already tiered. */
  def crossEncoderRerank(
      vectors: DataFrame,
      docs: DataFrame,
      queryPred: Column,
      topN: Int,
      k: Int): DataFrame = {
    require(topN >= k && k >= 1)
    val stage1 = Similarity.knn(vectors, queryPred, topN)
      .select(col("q_id"), col("neighbor").as("doc_id"), col("cos"),
        col("rk").as("rk_dense"))
    val toks = docs.select(col("doc_id"), array_distinct(filter(
      split(coalesce(col("text"), lit("")), "\\s+"),
      w => w =!= lit(""))).as("toks"))
    // both joins broadcast the BOUNDED side (queries, then queries×topN
    // pairs) into the corpus-token scan — the corpus never shuffles.
    // Query ids come straight from the predicate rows, NOT from stage1:
    // deriving them from stage1 re-evaluates the whole knn subtree a
    // second time (seen in the physical plan); a predicate id that
    // retrieved nothing drops out in the inner join below anyway.
    val qt = toks.join(broadcast(
      vectors.filter(queryPred).select(col("vec_id").as("q_id"))),
      col("doc_id") === col("q_id"))
      .select(col("q_id"), col("toks").as("qtoks"))
    val pairs = toks.join(broadcast(stage1), Seq("doc_id"))
      .join(broadcast(qt), Seq("q_id"))
      .withColumn("n_inter",
        size(array_intersect(col("qtoks"), col("toks"))).cast("bigint"))
      .withColumn("n_union",
        (size(col("qtoks")) + size(col("toks"))).cast("bigint") - col("n_inter"))
    val scored = pairs.withColumn("cross_micro",
      round(col("cos") * 1000000, 0).cast("bigint") +
        when(col("n_union") > 0,
          expr("1000000 * n_inter DIV n_union")).otherwise(lit(0L)))
    val w = Window.partitionBy("q_id").orderBy(col("cross_micro").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("doc_id"), col("cos"), col("n_inter"),
        col("n_union"), col("cross_micro"), col("rk_dense"), col("rk"),
        (col("rk_dense") - col("rk")).as("moved"))
  }

  /** Reciprocal-rank fusion of per-query ranked lists: each arm
    * contributes round(1e9 / (`kRrf` + rank)) "nano-units" per (q, doc)
    * it ranked (zero when the doc is outside that arm's list — the
    * standard RRF treatment of non-retrieved documents); arms fuse by
    * exact BIGINT addition, re-rank by (fused DESC, doc_id), keep
    * `topK`. kRrf = 60 is the constant from the original RRF evaluation;
    * larger values flatten the rank discount.
    *
    * Each input must carry (q_id, doc_id, rk). The fusion itself is a
    * union + one groupBy on (q_id, doc_id) + a per-query window — the
    * frames are already top-K-per-query sized (bounded by queries·K
    * rows), so this stage is never corpus-sized regardless of corpus
    * scale; all the heavy lifting stays in the arms. */
  def rrfFuse(arms: Seq[DataFrame], kRrf: Int, topK: Int): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one ranked arm")
    val contrib = arms.map(_.select(col("q_id"), col("doc_id"),
      round(lit(1.0e9) / (lit(kRrf).cast("double") + col("rk").cast("double")), 0)
        .cast("bigint").as("nano")))
    val fused = contrib.reduce(_ unionByName _)
      .groupBy("q_id", "doc_id")
      .agg(sum(col("nano")).as("rrf_nano"), count(lit(1)).as("n_arms"))
    val w = Window.partitionBy("q_id").orderBy(col("rrf_nano").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select(col("q_id"), col("doc_id"), col("rrf_nano"), col("n_arms"), col("rk"))
  }
}
