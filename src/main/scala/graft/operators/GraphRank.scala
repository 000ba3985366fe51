package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over candidate-pair graphs (the near-dup graph, a
  * citation/link graph) — the signal that upgrades duplicate-cluster
  * handling from "keep lowest id" to "keep the most central member", and
  * the classic iterative-join workload of a distributed engine.
  *
  * PageRank here is FIXED-ITERATION and FIXED-POINT-ARITHMETIC so the
  * result is deterministic run-to-run AND engine-to-engine (the DuckDB
  * oracle replays every iteration bit-for-bit):
  *   - ranks live as BIGINT nano-units (1e9 = probability 1), never
  *     doubles — double summation order varies across partitions;
  *   - every division is integral (`div`): contribution = pr div deg,
  *     damping = (dampingPct * sum) div 100 — exact in both engines for
  *     the all-positive values here;
  *   - the iteration count is a parameter, not a convergence test, so
  *     both engines run the identical number of rounds.
  * The quantization error is bounded by deg truncations of < 1 nano-unit
  * per round — irrelevant at ranking granularity and, crucially,
  * IDENTICAL in both engines.
  */
object GraphRank {

  /** PageRank over an undirected pair graph: nodes are the ids appearing
    * in `pairs`, each undirected pair contributes both directed edges,
    * teleport mass spreads uniformly over the graph's nodes (isolated
    * documents never enter — rank is relative centrality among the
    * connected). Returns (member, deg, pr_nano).
    *
    * Plan: the edge list materializes ONCE (localCheckpoint — pairs are
    * usually a whole dedup pipeline; leaving them lazy re-runs that
    * pipeline every round, the [[TextDedup.propagateCore]] lesson); each
    * round is ONE equi-join on src + ONE groupBy(dst) — partial sums
    * combine map-side, only (node, sum) rows shuffle. Superseded rank
    * frames release their blocks immediately. At 100 TB pre-partition
    * edges and ranks on the node key so every round's join is
    * zero-exchange on the rank side; rounds stay O(|E|/cluster) with no
    * driver-side state beyond the loop counter. */
  def pagerank(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      iters: Int = 5,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // ADJACENCY layout (guide §2.4, remove shuffles outright): the edge
    // list groups ONCE into (node, out-neighbor list) and checkpoints
    // hash-partitioned on the node key. Each round's contribution join
    // then meets the rank frame on that same key (rank frames come out
    // of the previous round's groupBy(node), so both sides are already
    // node-partitioned — zero exchange), neighbor lists explode map-side
    // into (dst, contribution), and the ONLY per-round exchange left is
    // the partial-aggregated contribution sum. The flat-edge form
    // re-shuffled the whole edge list per round (join on src over an
    // edge frame checkpointed (src,dst)-partitioned — 3 exchanges per
    // round; measured 2.48 s -> ~1.6 s on q_pagerank at sf0.1). Degree
    // falls out of the list size instead of a separate aggregate.
    // SCALE CONTRACT (advisor round 17): per-node lists are bounded
    // ONLY when the caller's pair generator caps degree (maxDf /
    // maxBucket — true for the near-dup graphs). q_textrank feeds an
    // UNCAPPED skipgram co-occurrence graph, so a high-frequency word's
    // neighbor list is a single-row skew hazard at corpus scale; a
    // 100 TB textrank caller must prune degree first (a maxDf-style
    // filter before the pair distinct) or use the flat-edge form
    // [[pagerankTrace]] uses, which never collects a neighborhood.
    // lazy: the eager rank-init checkpoint below is the materializing
    // action, so building the adjacency costs no dedicated blocking job
    // (round 18, guide §1.2 job count); every round then reads the
    // persisted blocks exactly as before
    val adj = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .groupBy(col("src").as("node")).agg(collect_list(col("dst")).as("nbrs"))
      .localCheckpoint(eager = false)
    val nRow = adj.agg(count(lit(1)).as("n"))
    var pr = adj.select(col("node"), size(col("nbrs")).cast("bigint").as("deg"))
      .crossJoin(broadcast(nRow))
      .select(col("node"), col("deg"),
        expr(s"CAST(${100 - dampingPct} * 10000000 AS BIGINT) div n").as("tele"),
        expr("CAST(1000000000 AS BIGINT) div n").as("pr_nano"))
      .localCheckpoint(true)
    // Materialize every OTHER round: a lazy odd round references the
    // previous checkpoint ~4× in the next round's plan (the rank frame
    // appears twice per round), which rescans cheap cached blocks —
    // cheaper than paying a full eager-checkpoint job per round. The
    // final round always checkpoints so callers get the same
    // truncated-lineage frame as before. `lastCp` tracks the only
    // persisted ancestor a lazy frame still depends on; it is released
    // only after the next checkpoint truncates lineage past it.
    var lastCp = pr
    for (i <- 1 to iters) {
      val contrib = adj
        .join(pr.select(col("node"), expr("pr_nano div deg").as("c")), "node")
        .select(explode(col("nbrs")).as("node"), col("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val updated = pr.join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("tele"),
          (col("tele") +
            expr(s"($dampingPct * coalesce(s, CAST(0 AS BIGINT))) div 100"))
            .as("pr_nano"))
      // cadence 2, not 3 (round-18 A/B with job counts: every-3rd saves 3
      // AQE stage-jobs but the 3-deep lazy span re-reads the rank blocks
      // ~8x per checkpoint — 20x probe wall 3.45 s -> 3.83 s, sf0.1
      // consistently worse; round 17 measured the same direction)
      if (i % 2 == 0 || i == iters) {
        val cp = updated.localCheckpoint(true)
        graft.plans.Checkpoints.release(lastCp)
        lastCp = cp
        pr = cp
      } else {
        pr = updated
      }
    }
    graft.plans.Checkpoints.release(adj)
    pr.select(col("node").as("member"), col("deg"), col("pr_nano"))
  }

  /** CONVERGENCE AUDIT for the fixed `iters` choice: per iteration, the
    * total and max rank-mass movement Σ|pr_i − pr_{i−1}| in nano-units —
    * the evidence that a fixed iteration count has converged for this
    * graph, rather than a convention ([[pagerank]] deliberately runs a
    * FIXED count so both engines execute identical rounds; this audit is
    * how that count gets justified). Same per-round join/agg shape as
    * [[pagerank]]; the movement aggregate is ONE row per round (a
    * bounded `iters`-row collect, the BPE-trace pattern), so the audit
    * costs one extra 2-column aggregate per iteration and nothing
    * corpus-sized ever reaches the driver. Returns
    * (iter, moved_nano, max_move_nano). */
  def pagerankTrace(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      iters: Int = 5,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // flat-edge rounds, NOT [[pagerank]]'s adjacency form (round-17 A/B:
    // adjacency here measured 1.36 s -> 1.67 s at sf0.1 — the trace's
    // per-round eager checkpoint + movement join never amortizes the
    // collect_list build the way pagerank's fused lazy rounds do)
    // lazy, materialized by the eager rank-init checkpoint below (the
    // pagerank job-count fusion, round 18)
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nRow = deg.agg(count(lit(1)).as("n"))
    var pr = deg.select(col("src").as("node"), col("deg"))
      .crossJoin(broadcast(nRow))
      .select(col("node"), col("deg"),
        expr(s"CAST(${100 - dampingPct} * 10000000 AS BIGINT) div n").as("tele"),
        expr("CAST(1000000000 AS BIGINT) div n").as("pr_nano"))
      .localCheckpoint(true)
    val moves = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (i <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("node").as("src"),
          expr("pr_nano div deg").as("c")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("s"))
      // every round checkpoints here (unlike pagerank's every-other):
      // the movement collect is an action per round anyway, and the
      // audit needs BOTH generations alive for exactly one join
      val updated = pr.join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("tele"),
          (col("tele") +
            expr(s"($dampingPct * coalesce(s, CAST(0 AS BIGINT))) div 100"))
            .as("pr_nano"))
        .localCheckpoint(true)
      val mv = updated.select(col("node"), col("pr_nano").as("new_pr"))
        .join(pr.select(col("node"), col("pr_nano").as("old_pr")), "node")
        .agg(sum(abs(col("new_pr") - col("old_pr"))).as("moved"),
          max(abs(col("new_pr") - col("old_pr"))).as("mx"))
        .head()
      moves += ((i, mv.getLong(0), mv.getLong(1)))
      graft.plans.Checkpoints.release(pr)
      pr = updated
    }
    graft.plans.Checkpoints.release(pr)
    graft.plans.Checkpoints.release(edges)
    val spark = pairs.sparkSession
    import spark.implicits._
    moves.toSeq.toDF("iter", "moved_nano", "max_move_nano")
  }

  /** Triangle census over an undirected pair graph (`doc_a < doc_b` rows):
    * per node — degree, triangle count, and the local clustering
    * coefficient in fixed-point ppm (2·T·10⁶ div d(d−1), integral — the
    * pagerank nano-unit discipline, so the number is bit-identical on any
    * engine). Triangle-dense neighborhoods are true duplicate CLIQUES
    * (keep-one-per-component is safe); triangle-free hubs are
    * threshold-transitivity chains where keep-one overdeletes.
    *
    * Plan: DEGREE-ORIENTED wedge enumeration (the standard distributed
    * triangle count). Each undirected edge is directed from its lower
    * (degree, id) endpoint; wedges are then two out-edges of one corner,
    * closed by a lookup against the undirected edge list. Orientation
    * gives every node out-degree O(√m) regardless of its real degree, so
    * a hub with degree d contributes O(m) wedge work instead of O(d²) —
    * at 100 TB this is what makes the census hub-safe independent of the
    * pair generator's maxDf/maxBucket caps. Every triangle is enumerated
    * exactly once: its (degree, id)-minimal node owns both out-edges into
    * the other two. Costs one extra degree equi-join vs the naive
    * id-ordered corner.
    *
    * Input is normalized defensively (least/greatest + distinct, advisor
    * round 15): the doc_a < doc_b distinct-edge contract was previously
    * only stated in this doc — a duplicate or reversed row from a future
    * caller would have silently inflated degrees and multiplied triangle
    * counts. Self-loops are dropped.
    * Returns (doc_id, degree, n_triangles, clustering_ppm). */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val p = pairs.select(
        least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .where(col("doc_a") =!= col("doc_b")).distinct()
    val deg = p.select(col("doc_a").as("node"))
      .unionAll(p.select(col("doc_b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient: src = the (degree, id)-smaller endpoint of each edge
    val withDeg = p
      .join(deg.select(col("node").as("doc_a"), col("degree").as("da")), "doc_a")
      .join(deg.select(col("node").as("doc_b"), col("degree").as("db")), "doc_b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("doc_a") < col("doc_b"))
    val oriented = withDeg.select(
      when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("src"),
      when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("dst"))
    // wedges at each corner: unordered out-neighbor pairs (v < w by id)
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"))
    val e2 = oriented.select(col("src").as("u"), col("dst").as("w"))
    val wedges = e1.join(e2, "u").where(col("v") < col("w"))
    // close against the undirected id-ordered edge list
    val tri = wedges.join(
      p.select(col("doc_a").as("v"), col("doc_b").as("w")), Seq("v", "w"))
    val triPerNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("nt"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node").as("doc_id"), col("degree"),
        coalesce(col("nt"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_ppm",
        when(col("degree") > 1,
          expr("(2000000 * n_triangles) div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
  }
}
