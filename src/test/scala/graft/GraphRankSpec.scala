package graft

import graft.operators.GraphRank

class GraphRankSpec extends SparkSpec {

  test("pagerank: path graph hand-replay — center dominates, nano " +
    "values exact after 5 fixed-point iterations") {
    import spark.implicits._
    // Path 1-2-3. n = 3: tele = 150000000 div 3 = 50000000, pr0 =
    // 333333333. Hand-unrolled (contribution = pr div deg, damp =
    // (85*s) div 100, all integral):
    //   it1: leaves 191666666, center 616666666
    //   it2: 312083333 / 375833332
    //   it3: 209729166 / 580541666
    //   it4: 296730208 / 406539582
    //   it5: 222779322 / 554441353
    // The leaves stay EXACTLY symmetric (same integer path), and the
    // center holds the most mass — the centrality signal the keeper
    // rule consumes.
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = GraphRank.pagerank(pairs, iters = 5)
      .orderBy("member").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 222779322L),
      (2L, 2L, 554441353L),
      (3L, 1L, 222779322L)),
      s"fixed-point replay must be exact: ${got.toSeq}")
  }

  test("pagerank: regular graphs are fixed points of the rank shape — " +
    "a triangle stays uniform every iteration") {
    import spark.implicits._
    // In a d-regular graph every node sends pr/d to d peers, so uniform
    // mass reproduces itself (up to the integral-division floor): any
    // asymmetry would expose order-dependence in the implementation.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = GraphRank.pagerank(tri, iters = 3)
      .select("pr_nano").distinct().collect()
    assert(got.length == 1,
      s"triangle ranks must be identical across nodes: ${got.toSeq}")
  }

  test("pagerank releases every superseded checkpoint: only the result " +
    "frame stays persisted (the every-other-round bookkeeping cannot leak)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pr = GraphRank.pagerank(pairs, iters = 5)
    pr.count()
    val live = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(live.size <= 1,
      s"pagerank leaked checkpoint blocks: ${live.size} persistent RDDs " +
        "(edges and all superseded iterates must be released)")
  }

  test("centrality keeper: a star's center wins its cluster even with " +
    "the highest id (where min-id and longest-member rules both miss)") {
    import spark.implicits._
    // Star centered on id 9 with leaves 1, 2, 3: the cluster label is
    // min id (1), but the member every variant links to is 9 — the
    // canonical original a partial-copy family points at.
    val pairs = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("doc_a", "doc_b")
    val comps = graft.operators.TextDedup.duplicateClusters(pairs)
    val pr = GraphRank.pagerank(pairs, iters = 5)
      .select(org.apache.spark.sql.functions.col("member").as("pid"),
        org.apache.spark.sql.functions.col("pr_nano"))
    val got = graft.operators.TextDedup.keepers(comps, pr, "pid", "pr_nano")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 9L, 4L)),
      s"cluster_rep 1 must keep central member 9 of 4: ${got.toSeq}")
  }

  test("pagerankTrace: one row per iteration, movement shrinks as the " +
    "ranks converge, and nothing stays persisted") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tr = GraphRank.pagerankTrace(pairs, iters = 5)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(tr.map(_._1).toSeq == (1 to 5),
      s"one trace row per iteration: ${tr.toSeq}")
    assert(tr.forall(t => t._2 >= t._3),
      "total movement can never be below the max single-node movement")
    // damped fixed-point iteration: late movement is far below round-1's
    // initial redistribution (the convergence evidence the audit exists
    // to provide)
    assert(tr.last._2 < tr.head._2,
      s"movement must shrink toward the fixpoint: ${tr.toSeq}")
    val live = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(live.isEmpty,
      s"pagerankTrace returns only a local frame — leaked: ${live.size}")
  }

  test("triangleCensus: triangle is a clique (ppm 1e6), chain and star " +
    "are triangle-free, each triangle counted once per corner") {
    import spark.implicits._
    // triangle 1-2-3 ∪ chain 4-5-6 ∪ star 7-(8,9,10), disjoint
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (5L, 6L),
      (7L, 8L), (7L, 9L), (7L, 10L)
    ).toDF("doc_a", "doc_b")
    val r = GraphRank.triangleCensus(pairs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    // triangle corners: degree 2, ONE triangle each, clustering 1.0
    for (n <- Seq(1L, 2L, 3L))
      assert(r(n) == ((2L, 1L, 1000000L)), s"corner $n: ${r(n)}")
    // chain: middle degree 2 with no closing edge -> clustering 0
    assert(r(5L) == ((2L, 0L, 0L)) && r(4L) == ((1L, 0L, 0L)), s"$r")
    // star: hub degree 3, no leaf-leaf edges -> 0 of d(d-1)/2=3 wedges
    // close; leaves degree 1 (coefficient defined as 0)
    assert(r(7L) == ((3L, 0L, 0L)) && r(8L) == ((1L, 0L, 0L)), s"$r")
    // global: exactly one triangle, counted once per corner
    assert(r.values.map(_._2).sum == 3L, s"triangle corner sum: $r")
  }

  test("triangleCensus: two triangles sharing an edge — shared nodes " +
    "count both, ppm is the exact integral ratio") {
    import spark.implicits._
    // K4 minus one edge: triangles (1,2,3) and (1,2,4); edge 3-4 absent
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("doc_a", "doc_b")
    val r = GraphRank.triangleCensus(pairs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    // nodes 1,2: degree 3, in BOTH triangles, cc = 2*2e6/(3*2) = 666666
    assert(r(1L) == ((3L, 2L, 666666L)) && r(2L) == ((3L, 2L, 666666L)), s"$r")
    // nodes 3,4: degree 2, one triangle, clique-local -> 1e6
    assert(r(3L) == ((2L, 1L, 1000000L)) && r(4L) == ((2L, 1L, 1000000L)), s"$r")
  }

  test("triangleCensus: reversed, duplicated, and self-loop edges are " +
    "normalized away — census identical to the canonical input") {
    // advisor round 15: the doc_a < doc_b distinct-edge contract was only
    // stated in the scaladoc; a careless caller would have silently
    // inflated degrees and multiplied triangle counts
    import spark.implicits._
    val canonical = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("doc_a", "doc_b")
    val messy = Seq(
      (2L, 1L),          // reversed
      (1L, 3L), (3L, 1L), // duplicate, once reversed
      (1L, 4L), (1L, 4L), // exact duplicate
      (3L, 2L),          // reversed
      (2L, 4L),
      (5L, 5L)           // self-loop: dropped entirely
    ).toDF("doc_a", "doc_b")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    val want = asMap(GraphRank.triangleCensus(canonical))
    val got = asMap(GraphRank.triangleCensus(messy))
    assert(got == want, s"messy input must normalize to the canonical " +
      s"census; got $got want $want")
    assert(!got.contains(5L), "a self-loop-only node is not part of the graph")
  }
}
