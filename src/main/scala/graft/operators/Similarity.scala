package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecDot.{vec_dot, vec_norm}

/** Library API for similarity search over an embedding column
  * (SURVEY.md §2d). Inputs carry (`vec_id`, `v: ARRAY<DOUBLE>`); the
  * cosine inner loop is the codegen'd fused multiply-add `vec_dot`.
  *
  * Scale shape: the query set is broadcast and the corpus scanned once —
  * embarrassingly parallel; a bucket expression (orthant sketch, random
  * hyperplanes, trained IVF centroids) turns the scan into an equi-join
  * on bucket, trading recall for a bounded candidate set. */
object Similarity {

  /** Top-k cosine neighbors per query: (q_id, neighbor, cos, rk).
    * `bucket`: optional candidate-pruning expression over `v` — None
    * scans everything (exact); Some(b) compares only within equal
    * buckets (approximate). `queryPred` selects the query rows. */
  def knn(
      vectors: DataFrame,
      queryPred: Column,
      k: Int,
      bucket: Option[Column] = None): DataFrame = {
    val b = vectors.withColumn("bucket", bucket.getOrElse(lit(0L)))
    val n = b.withColumn("nrm", vec_norm(col("v")))
    val q = broadcast(n.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket").as("qb")))
    val scored = n.join(q, col("bucket") === col("qb") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(vec_dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor"), col("cos"), col("rk"))
  }

  /** Deterministic Lloyd k-means for IVF coarse quantization:
    * (cid, cen) after `iters` iterations.
    *
    * Everything is fixed so training is reproducible run-to-run AND
    * engine-to-engine (the DuckDB oracle replays it bit-for-bit):
    *   - seeds: the `k` vectors with the lowest `vec_id`, labeled by that
    *     id (no RNG);
    *   - assignment: argmin of the left-to-right fold of squared dim
    *     diffs, ties broken by cid;
    *   - update: per-dimension means with DECIMAL-accumulated sums —
    *     double summation order varies across partitions, decimal
    *     addition is exact and order-free — then one double division.
    *
    * Scale shape: each iteration is one broadcast of k centroids, one
    * corpus scan for assignment (k·dim multiply-adds per row) and one
    * (cid, dim)-keyed partial+final aggregate; nothing global. The loop
    * builds one lazy plan, so at high iteration counts analysis time and
    * failure-recovery cost grow linearly with the unbroken lineage —
    * `persistEvery = n` materializes the k-row centroid frame every n
    * iterations via an eager `localCheckpoint`, truncating the lineage at
    * a cost of k tiny rows per cut. (localCheckpoint stores blocks on
    * executors: fast, but recomputed work is lost if an executor dies
    * mid-train — for long multi-hour trainings on a lossy cluster prefer
    * a reliable `checkpoint` directory outside this helper.) Centroids
    * are bit-identical with the knob on or off: the checkpoint stores the
    * exact rows the deterministic pipeline computed. Callers fanning the
    * returned k-row frame into MULTIPLE consumers (assignment + probing,
    * say) should `localCheckpoint(true)` it once — every lazy reference
    * otherwise replays the whole training. */
  def trainIvf(vectors: DataFrame, k: Int, iters: Int, persistEvery: Int = 0): DataFrame = {
    var cents = vectors.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cen"))
    // each lineage cut supersedes the previous one: once the new k-row
    // frame is eagerly materialized, the older checkpoint's blocks are
    // unreachable by any future computation — release them immediately
    // (blocks pinned for the session's life were round 4's bench killer).
    // The LAST cut stays alive: the returned frame's lineage hangs off it
    // until the caller is done (release via Checkpoints.release, or
    // localCheckpoint the result and sweep).
    var prevCut: Option[DataFrame] = None
    for (i <- 1 to iters) {
      cents = assignToCentroids(vectors, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cid", "d")
        .agg((sum(col("x").cast("decimal(30,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(expr("transform(sort_array(collect_list(struct(d, m))), p -> p.m)").as("cen"))
      if (persistEvery > 0 && i % persistEvery == 0 && i < iters) {
        cents = cents.localCheckpoint(true)
        prevCut.foreach(graft.plans.Checkpoints.release)
        prevCut = Some(cents)
      }
    }
    cents
  }

  /** Trained-IVF ANN with multi-cell probing: top-k cosine neighbors per
    * query, searching the `nprobe` cells whose centroids are nearest each
    * query — the standard IVF recall knob (nprobe = 1 is [[knn]] with the
    * assignment column as bucket; nprobe = number of cells is exact).
    *
    * Scale shape: the probe list (queries × their nprobe nearest cells,
    * tiny) broadcasts; the assigned corpus is scanned ONCE and each row
    * compares only against queries probing its cell — candidate volume is
    * nprobe/cells of the corpus per query. Probe selection itself is a
    * query-set × k-centroid cross join (both broadcast-size). Ties in
    * centroid distance break by cid, in cosine by vec_id — deterministic
    * end to end, so the DuckDB oracle replays it exactly. */
  def knnIvfProbed(
      assigned: DataFrame,
      cents: DataFrame,
      queryPred: Column,
      k: Int,
      nprobe: Int): DataFrame = {
    val n = assigned.withColumn("nrm", vec_norm(col("v")))
    val q = n.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("cid"))
    val probes = broadcast(q.crossJoin(broadcast(cents))
      .withColumn("dist", graft.functions.VecSqDiff.vec_sqdiff(col("qv"), col("cen")))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("cid").as("qb")))
    val scored = n.join(probes, col("cid") === col("qb") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(vec_dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor"), col("cos"), col("rk"))
  }

  /** Nearest-centroid assignment: (vec_id, v, cid). Centroids broadcast;
    * distance is the codegen'd in-order squared-diff fold `vec_sqdiff`
    * (matches the oracle's list comprehension exactly); ties broken by
    * cid. */
  def assignToCentroids(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(cents))
      .withColumn("dist",
        graft.functions.VecSqDiff.vec_sqdiff(col("v"), col("cen")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** All pairs with cosine >= `threshold`: (vec_a, vec_b, cos).
    *
    * `bucket = None` is the exact form — a theta self-join
    * (BroadcastNestedLoop), fine at dimension-table scale only.
    * `bucket = Some(b)` compares only pairs whose bucket expression agrees
    * (an LSH sign sketch, orthant code, IVF centroid id): the corpus is
    * scanned ONCE, grouped on the bucket key, and pairs explode within
    * each bucket — work is Σ|bucket|² instead of |corpus|², and the bucket
    * expression runs once per row, map-side. (The former bucket self-join
    * derived the scan+bucket subplan on BOTH sides — AQE's broadcast of
    * one side makes exchange reuse impossible — and its join-inferred
    * IsNotNull re-evaluated the bucket expression inside a Filter.)
    * The bucket expression should be non-nullable: grouping puts null
    * bucket keys in one bucket rather than dropping them as a join would.
    * `maxBucket > 0` drops buckets holding more than that many vectors,
    * with collection memory bounded at the cap (`capped_collect_list`) —
    * the skew guard for a degenerate sketch bucket. */
  def cosinePairs(
      vectors: DataFrame,
      threshold: Double,
      bucket: Option[Column] = None,
      maxBucket: Int = 0): DataFrame = {
    val scored = bucket match {
      case Some(b) =>
        val n = vectors.select(col("vec_id"), col("v"),
          vec_dot(col("v"), col("v")).as("n2"), b.as("bkt"))
        val collected =
          if (maxBucket > 0)
            graft.functions.CappedCollectList.capped_collect_list(
              struct(col("vec_id"), col("v"), col("n2")), maxBucket)
          else collect_list(struct(col("vec_id"), col("v"), col("n2")))
        n.groupBy(col("bkt")).agg(collected.as("ds"))
          .filter(size(col("ds")) > 1)
          .select(explode(col("ds")).as("x"), col("ds"))
          .select(col("x"), explode(col("ds")).as("y"))
          .filter(col("y.vec_id") > col("x.vec_id"))
      case None =>
        val n = vectors.select(col("vec_id"), col("v"),
          vec_dot(col("v"), col("v")).as("n2"))
        n.select(struct(col("vec_id"), col("v"), col("n2")).as("x"))
          .join(n.select(struct(col("vec_id"), col("v"), col("n2")).as("y")),
            col("y.vec_id") > col("x.vec_id"))
    }
    scored
      .withColumn("cos", round(
        vec_dot(col("x.v"), col("y.v")) / (sqrt(col("x.n2")) * sqrt(col("y.n2"))), 4))
      .filter(col("cos") >= threshold)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"), col("cos"))
  }
}
