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

  test("maxDf retains every pair sharing a sub-cap shingle, drops ubiquitous-only pairs") {
    // all four docs share the shingle "x y z" (df = 4); only d1/d2 also
    // share "p q r" (df = 2). Capping at maxDf = 3 drops the ubiquitous
    // shingle's postings entirely: pairs whose whole overlap was "x y z"
    // vanish, while (d1, d2) survives on the rare-shingle evidence with
    // n_inter reduced by exactly the dropped shingle.
    val docs = spark.createDataFrame(Seq(
      (1L, "x y z a p q r"),
      (2L, "x y z b p q r"),
      (3L, "x y z c m n o"),
      (4L, "x y z d u v w"))).toDF("doc_id", "text")
    def pairs(maxDf: Int) =
      TextDedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.0, maxDf = maxDf)
        .select("doc_a", "doc_b", "n_inter").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = pairs(0)
    assert(exact.keySet.size == 6 && exact((1L, 2L)) == 2,
      s"uncapped postings must pair all docs: $exact")
    val capped = pairs(3)
    assert(capped == Map((1L, 2L) -> 1L),
      s"cap=3 must keep exactly the rare-shingle pair with its sub-cap count: $capped")
  }

  test("containmentPairs flags a partial copy that symmetric Jaccard misses") {
    // doc 2 is a verbatim 12-token prefix of the 60-token doc 1: every one
    // of its 10 shingles is contained, so containment = 1.0 while
    // jaccard = 10/58 ≈ 0.17 — the asymmetric metric's whole point
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val sub = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = spark.createDataFrame(Seq(
      (1L, big), (2L, sub),
      (3L, "a completely unrelated document about row groups"))).toDF("doc_id", "text")
    val cont = TextDedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_a", "doc_b", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(cont == Seq((1L, 2L, 1.0)), s"got $cont")
    val jac = TextDedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.9).count()
    assert(jac == 0, "jaccard at the same threshold must miss the partial copy")
  }

  test("fingerprintPairs: shared minimal window pairs, cap drops degenerate buckets") {
    // identical texts share the min-window hash exactly; a disjoint text
    // cannot (hash equality over different bytes is a 2^-64 event)
    val same = "a long enough shared document body so windows exist here"
    val docs = spark.createDataFrame(Seq(
      (1L, same), (2L, same),
      (3L, "entirely different content with entirely different bytes inside"))).toDF("doc_id", "text")
    val pairs = TextDedup.fingerprintPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // 50 copies in one fingerprint bucket: cap 10 drops the bucket whole
    val boiler = spark.createDataFrame(
      (1L to 50L).map(i => (i, same))).toDF("doc_id", "text")
    assert(TextDedup.fingerprintPairs(boiler, "doc_id", "text", maxBucket = 10).count() == 0,
      "over-cap fingerprint bucket must be dropped whole")
    assert(TextDedup.fingerprintPairs(boiler, "doc_id", "text").count() == 50L * 49 / 2,
      "uncapped bucket must emit all pairs")
  }

  test("crossOverlapPairs flags only corpus docs overlapping the benchmark") {
    val corpus = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "totally unrelated words here"))).toDF("doc_id", "text")
    val bench = spark.createDataFrame(Seq(
      (100L, "alpha beta gamma epsilon"))).toDF("doc_id", "text")
    val pairs = TextDedup.crossOverlapPairs(corpus, bench, "doc_id", "text", minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 shares exactly the "alpha beta gamma" shingle; doc 2 shares none
    assert(pairs == Seq((1L, 100L, 1L)), s"got $pairs")
  }

  test("crossOverlapPairs maxDf drops ubiquitous-shingle evidence, never invents pairs") {
    // "common common common" appears in every corpus doc (df 3 > cap 2):
    // its evidence is dropped, so doc 3 (ubiquitous shingle only) falls
    // below minOverlap while docs 1-2 keep their distinctive shingles;
    // with no cap doc 3 pairs too. n_shared is a lower bound under the cap.
    val corpus = spark.createDataFrame(Seq(
      (1L, "common common common alpha beta gamma"),
      (2L, "common common common delta epsilon zeta"),
      (3L, "common common common unrelated tail words"))).toDF("doc_id", "text")
    val bench = spark.createDataFrame(Seq(
      (100L, "common common common alpha beta gamma delta epsilon zeta")))
      .toDF("doc_id", "text")
    def run(cap: Int) = TextDedup.crossOverlapPairs(
        corpus, bench, "doc_id", "text", minOverlap = 1, maxDf = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(0)
    val capped = run(2)
    assert(uncapped == Set((1L, 100L), (2L, 100L), (3L, 100L)), s"got $uncapped")
    assert(capped == Set((1L, 100L), (2L, 100L)),
      s"cap must drop only the ubiquitous-evidence pair: $capped")
  }

  test("maxBucket drops degenerate LSH buckets whole, with bounded collection") {
    // a boilerplate-heavy corpus: 3000 distinct-id copies of one short text
    // put 3000 docs into EVERY (band, bkey) bucket — uncapped that is
    // ~4.5M candidate pairs per band; capped, the degenerate buckets are
    // dropped in the aggregate itself (capped_collect_list keeps at most
    // `cap` elements per bucket, so the collecting task is memory-bounded
    // no matter how large the bucket) — while pairs living in healthy
    // buckets survive untouched.
    import spark.implicits._
    val boiler = (1L to 3000L).map(i => (i, "the same boilerplate header text repeated"))
    // identical healthy texts (distinct ids): identical signatures agree on
    // every band deterministically — no LSH collision luck in the assert
    val healthy = Seq(
      (9001L, "a rare document about parquet file layouts and row groups"),
      (9002L, "a rare document about parquet file layouts and row groups"))
    val docs = (boiler ++ healthy).toDF("doc_id", "text")
    val capped = TextDedup.minhashPairs(docs, "doc_id", "text", threshold = 0.2,
        maxBucket = 100)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((9001L, 9002L)),
      s"cap must drop only the degenerate bucket's pairs: ${capped.take(5)}")
    // simhash: same contract through the shared bucket machinery
    val simCapped = TextDedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
        maxBucket = 100)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simCapped == Set((9001L, 9002L)), s"got ${simCapped.take(5)}")
  }

  test("capped_collect_list: exact under the cap, null over it, across merges") {
    import graft.functions.CappedCollectList.capped_collect_list
    import org.apache.spark.sql.functions._
    // group 0: 50 rows (over cap 40 -> null); group 1: 30 rows (exact list);
    // 8 input partitions force partial-buffer serialization and merges
    val df = spark.range(0, 80, 1, 8)
      .select((col("id") < 50).cast("int").as("g"),
        when(col("id") < 50, lit(0L)).otherwise(lit(1L)).as("grp"), col("id"))
    val out = df.groupBy("grp").agg(capped_collect_list(col("id"), 40).as("xs"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(0L).isEmpty, "over-cap group must evaluate to null")
    assert(out(1L).map(_.sorted) == Some((50L until 80L).toSeq),
      "under-cap group must collect every row exactly once")
  }

  test("duplicateClusters equals union-find on random pair graphs") {
    import spark.implicits._
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val got = TextDedup.duplicateClusters(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find with component-minimum representatives
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = touched.groupBy(v => find(v.toInt)).values
        .flatMap { vs => val m = vs.min; vs.map(_ -> m) }.toMap
      assert(got == expect, s"seed $seed: components diverge from union-find")
    }
  }

  test("duplicateClustersStar: identical components, fewer rounds on chains") {
    import spark.implicits._
    // long chain 0-1-2-...-29: min-label propagation moves the minimum one
    // hop per round (O(diameter)); alternating large-star/small-star
    // collapses it in O(log n) rounds with the identical unique fixpoint
    val n = 30
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (propDf, propRounds) = TextDedup.propagateMinLabels(chain, "doc_a", "doc_b", 50)
    val (starDf, starRounds) = TextDedup.starClusters(chain, "doc_a", "doc_b", 50)
    val prop = propDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = starDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop, "star components must equal propagation's")
    assert(prop == (0L until n.toLong).map(_ -> 0L).toMap)
    assert(propRounds >= n - 2, s"chain should cost propagation O(n) rounds, got $propRounds")
    assert(starRounds * 2 < propRounds,
      s"star must converge in far fewer rounds: $starRounds vs $propRounds")

    // and on random graphs (mixed component shapes) the outputs agree too
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(50)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2).distinct.toDF("doc_a", "doc_b")
      val a = TextDedup.duplicateClusters(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = TextDedup.duplicateClustersStar(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b, s"seed $seed: star and propagation components diverge")
    }
  }

  test("auto path choice: chains exhaust the budget and fall back to star; star-like and DISCONNECTED graphs stay on propagation") {
    import spark.implicits._
    // a long chain needs ~diameter propagation rounds, far past the
    // ~2 log2(2E) budget — star fallback. A hub converges in a couple of
    // rounds — propagation. Many tiny DISJOINT components are the
    // commonest dedup shape and the one any global degree/vertex
    // statistic misclassifies (they look like one enormous path to a
    // Moore-style bound): each converges in ~1 round, so the attempt
    // must stay on propagation.
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val hub = (1L to 20L).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val disjointPairs = (0L until 100L).map(i => (2 * i, 2 * i + 1)).toDF("doc_a", "doc_b")
    def pathOf(df: org.apache.spark.sql.DataFrame): String = {
      val (out, path) = TextDedup.autoClusters(df, "doc_a", "doc_b", 100)
      out.count() // consume before release
      graft.plans.Checkpoints.release(out)
      path
    }
    assert(pathOf(chain) == "star", "a long chain must exhaust the budget and use star")
    assert(pathOf(hub) == "propagation", "a hub converges within the budget")
    assert(pathOf(disjointPairs) == "propagation",
      "disjoint tiny components must NOT be mistaken for a chain")
  }

  test("duplicateClustersAuto matches both variants' fixpoint on either shape") {
    import spark.implicits._
    // chain (auto falls back to star) and hub-and-spokes plus random
    // mixed graphs (auto stays on propagation): the output must equal
    // duplicateClusters' in every case — the attempt/fallback may only
    // affect cost, never the labels.
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val hub = (1L to 20L).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val rnd = new scala.util.Random(5)
    val mixed = Seq.fill(50)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct.toDF("doc_a", "doc_b")
    for ((name, edges) <- Seq(("chain", chain), ("hub", hub), ("mixed", mixed))) {
      def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val auto = labels(TextDedup.duplicateClustersAuto(edges))
      val prop = labels(TextDedup.duplicateClusters(edges))
      assert(auto == prop, s"$name: auto labels diverge from propagation's")
    }
  }

  test("duplicateClustersAuto releases every internal block like its siblings") {
    import spark.implicits._
    graft.plans.Checkpoints.releaseAll(spark)
    val edges = ((0L until 39L).map(i => (i, i + 1)) ++ Seq((50L, 51L)))
      .toDF("doc_a", "doc_b")
    val out = TextDedup.duplicateClustersAuto(edges)
    out.count()
    assert(spark.sparkContext.getPersistentRDDs.size <= 1,
      "auto leaked internal blocks (degree probe or edge frame)")
    graft.plans.Checkpoints.release(out)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("clustering releases every internal block; only the result stays persisted") {
    // the library persist-lifecycle contract (round-4 lesson: zero
    // unpersist calls leaked checkpointed blocks for the JVM's life and
    // slowed every query that ran later in the same session): after an
    // operator returns, the ONLY persisted RDDs are the ones backing its
    // returned frame, and Checkpoints.release(result) drops those too.
    import spark.implicits._
    graft.plans.Checkpoints.releaseAll(spark)
    for (variant <- Seq("propagate", "star")) {
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
      val out = variant match {
        case "propagate" => TextDedup.duplicateClusters(edges)
        case _           => TextDedup.duplicateClustersStar(edges)
      }
      out.count() // consume
      val live = spark.sparkContext.getPersistentRDDs
      assert(live.size <= 1,
        s"$variant leaked internal blocks: ${live.size} persistent RDDs")
      graft.plans.Checkpoints.release(out)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$variant: releasing the result must leave zero persistent RDDs")
    }
  }

  test("minhash band/k parameters are validated") {
    assertThrows[IllegalArgumentException](
      TextDedup.minhashPairs(canon, "doc_id", "text", 0.2, k = 32, bands = 7))
  }

  test("incrementalNew: bloom-prefiltered result equals the plain anti-join") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val archive = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val viaBloom = TextDedup.incrementalNew(archive, batch, "h")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = batch.join(archive.select("h"), Seq("h"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact,
      s"bloom path diverged: extra=${viaBloom -- exact} missing=${exact -- viaBloom}")
  }

  test("incrementalNew: empty archive admits the whole batch") {
    val batch = spark.createDataFrame(Seq((1L, "aa"), (2L, "bb"))).toDF("doc_id", "h")
    val out = TextDedup.incrementalNew(batch.filter(lit(false)), batch, "h")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("incrementalNew: a known duplicate key is removed, fresh keys kept") {
    val archive = spark.createDataFrame(Seq((10L, "k1"), (11L, "k2"))).toDF("doc_id", "h")
    val batch = spark.createDataFrame(Seq((20L, "k2"), (21L, "k3"))).toDF("doc_id", "h")
    val out = TextDedup.incrementalNew(archive, batch, "h")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(21L))
  }

  test("dedupSegments: global first occurrence wins, docs rebuild in order") {
    // d1 owns both lines; d2 repeats d1's header line but keeps its own
    // body; d3 is nothing but already-seen lines and rebuilds to "".
    val docs = spark.createDataFrame(Seq(
      (1L, "SITE HEADER\nunique first body"),
      (2L, "SITE HEADER\nsecond doc body"),
      (3L, "SITE HEADER\nunique first body")))
      .toDF("doc_id", "text")
      .withColumn("segs", split(col("text"), "\n"))
    val out = TextDedup.dedupSegments(docs, "doc_id", "segs", sep = "\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "SITE HEADER\nunique first body")))
    assert(out(2L) == ((2L, 1L, "second doc body")))
    assert(out(3L) == ((2L, 0L, "")), s"fully-boilerplate doc: ${out(3L)}")
  }

  test("dedupSegments: within one document a repeated line keeps its first slot") {
    val docs = spark.createDataFrame(Seq((7L, "a\nb\na\nc")))
      .toDF("doc_id", "text")
      .withColumn("segs", split(col("text"), "\n"))
    val out = TextDedup.dedupSegments(docs, "doc_id", "segs", sep = "\n")
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getString(3)) == ((4L, 3L, "a\nb\nc")))
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

  test("keepers picks the max-score member (ties min id); min-score when ascending") {
    import spark.implicits._
    val comps = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L), (21L, 2L))
      .toDF("member", "cluster_rep")
    val scores = Seq((10L, 5L), (11L, 9L), (12L, 9L), (20L, 3L), (21L, 3L))
      .toDF("doc_id", "s")
    val best = TextDedup.keepers(comps, scores, "doc_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(best == Set((1L, 11L, 9L, 3L), (2L, 20L, 3L, 2L)), s"got $best")
    val worst = TextDedup.keepers(comps, scores, "doc_id", "s", ascending = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(worst == Set((1L, 10L), (2L, 20L)), s"got $worst")
  }

  test("keepers property: one row per cluster, keeper is in-cluster argmax with min-id ties") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // random component labelings (member -> cluster) + random scores
    val genCase = for {
      n <- Gen.choose(1, 30)
      clusters <- Gen.listOfN(n, Gen.choose(0L, 5L))
      scores <- Gen.listOfN(n, Gen.choose(0L, 4L)) // narrow range forces ties
    } yield (clusters.zipWithIndex.map { case (c, i) => (i.toLong, c) }, scores)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(genCase) { case (comps, scoreVals) =>
        val scoreOf = comps.map(_._1).zip(scoreVals).toMap
        val got = TextDedup.keepers(
            comps.toDF("member", "cluster_rep"),
            scoreOf.toSeq.toDF("doc_id", "s"), "doc_id", "s")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val expected = comps.groupBy(_._2).map { case (c, ms) =>
          val members = ms.map(_._1)
          val best = members.map(m => (-scoreOf(m), m)).min._2
          c -> ((best, scoreOf(best), members.size.toLong))
        }
        got == expected
      })
    assert(res.passed, res.status.toString)
  }

  test("blockedEditPairs: same-opening docs verified by edit distance, cap drops big blocks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta eps one two three"),
      (2L, "alpha beta gamma delta eps one two FOUR"),   // same block, lev small
      (3L, "alpha beta gamma delta eps " + ("x " * 40).trim), // same block, lev large
      (4L, "different opening words entirely here")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.blockedEditPairs(docs, "doc_id", "text",
        blockWords = 5, maxEdit = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // only (1,2) survives the verifier: (1,3)/(2,3) exceed maxEdit, 4 is
    // in its own block
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)), s"got $pairs")
    assert(pairs.head._3 == 5, s"lev('three' -> 'FOUR') is 5 edits in context: $pairs")
    // cap 2: the 3-doc block is dropped whole
    val capped = TextDedup.blockedEditPairs(docs, "doc_id", "text",
      blockWords = 5, maxEdit = 100, maxBucket = 2).count()
    assert(capped == 0, "over-cap block must be dropped whole")
  }

  test("substringDups: keep-first, span merge, and exact union token count") {
    import spark.implicits._
    // doc 1 is the keeper (lowest id): a 10-token run "c1..c10" that doc 2
    // copies verbatim in the middle of unique filler, plus doc 3 copies
    // "c1..c8" (exactly one window) at its start. With minLen = 4:
    //  - doc 1 contributes only keeper instances -> absent from output;
    //  - doc 2 has 7 dup windows (starts 5..11 of its 20 tokens) merging
    //    into ONE span whose union is 10 tokens (the whole copied run);
    //  - doc 3 has 5 dup windows (starts 0..4) -> one span, 8 tokens.
    val run10 = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, "k1 k2 " + run10 + " k3 k4"),
      (2L, "u1 u2 u3 u4 u5 " + run10 + " u6 u7 u8 u9 u10"),
      (3L, (1 to 8).map(i => s"c$i").mkString(" ") + " z1 z2 z3 z4")
    ).toDF("doc_id", "text")
    val got = TextDedup.substringDups(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(!got.contains(1L), s"keeper doc must not be reported: $got")
    assert(got(2L) == ((7L, 1L, 10L, 0.5)), s"doc 2: $got")
    assert(got(3L) == ((5L, 1L, 8L, round8(8.0 / 12))), s"doc 3: $got")
  }

  test("substringDups: disjoint duplicated regions stay separate spans") {
    import spark.implicits._
    // doc 2 copies two NON-adjacent 4-token runs from doc 1, separated by
    // >= minLen unique tokens -> two spans of 4 tokens each, union 8.
    val docs = Seq(
      (1L, "a1 a2 a3 a4 x1 x2 x3 x4 x5 b1 b2 b3 b4"),
      (2L, "a1 a2 a3 a4 y1 y2 y3 y4 y5 b1 b2 b3 b4")
    ).toDF("doc_id", "text")
    val got = TextDedup.substringDups(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(2L -> ((2L, 2L, 8L))), s"got $got")
  }

  test("propagationTrace: a 5-chain converges in 4 rounds with trailing " +
    "zeros, and nothing stays persisted") {
    import spark.implicits._
    // Path 1-2-3-4-5, labels start at own id, update = min over the
    // neighborhood. Hand-replay: r1 moves every non-min node to its
    // neighborhood min (4 changed; labels 1,1,2,3,4), then label 1
    // advances one hop per round down the chain — changed counts
    // 4, 3, 2, 1, then converged zeros.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tr = TextDedup.propagationTrace(pairs, rounds = 6)
      .orderBy("round").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(tr.map(_._1).toSeq == (1 to 6), s"one row per round: ${tr.toSeq}")
    assert(tr.map(_._2).toSeq == Seq(4L, 3L, 2L, 1L, 0L, 0L),
      s"chain propagation trace must replay exactly: ${tr.toSeq}")
    val live = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(live.isEmpty,
      s"propagationTrace returns only a local frame — leaked: ${live.size}")
  }

  test("containedOverlay: kept losers demote, non-kept pair sides attribute " +
    "nothing, ties drop the larger id") {
    import spark.implicits._
    // the sf0.01 corpus never fires tier 3 (no containment pairs survive
    // tiers 1-2), so the oracle gate checks 'contained' only vacuously —
    // every branch is pinned here on a hand ledger instead.
    val ledger = Seq(
      (1L, "kept", 1L), (2L, "kept", 2L), (3L, "kept", 3L),
      (4L, "kept", 4L), (5L, "exact_dup", 1L), (6L, "near_dup", 1L),
      (7L, "kept", 7L)).toDF("doc_id", "status", "keeper_id")
    val pairs = Seq(
      (1L, 2L), // both kept, sizes 100 vs 40: 2 loses
      (3L, 4L), // both kept, equal sizes: larger id (4) loses
      (1L, 6L), // 6 already fell to tier 2: pair ignored entirely
      (5L, 7L)  // 5 already fell to tier 1: 7 must STAY kept
    ).toDF("doc_a", "doc_b")
    val sizes = Seq((1L, 100L), (2L, 40L), (3L, 50L), (4L, 50L),
      (5L, 10L), (6L, 10L), (7L, 5L)).toDF("doc_id", "n_chars")
    val out = TextDedup.containedOverlay(ledger, pairs, sizes, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "kept", 2L -> "contained", 3L -> "kept", 4L -> "contained",
      5L -> "exact_dup", 6L -> "near_dup", 7L -> "kept"), out)
    // keeper_id column passes through untouched
    val cols = TextDedup.containedOverlay(ledger, pairs, sizes, "doc_id", "n_chars").columns
    assert(cols.contains("keeper_id"), cols.mkString(","))
  }

  private def round8(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
