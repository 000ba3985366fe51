package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BandGenerators.{minhash_bands, shingle_posts, simhash_bands}
import graft.functions.CappedCollectList.capped_collect_list

/** Library API for the deduplication family (SURVEY.md §2d) — the query
  * catalog (`graft.queries.Ext`) calls these with fixed parameters; users
  * tune them. All operators take a DataFrame with (`idCol`, `textCol`).
  *
  * Hash sources: `portable = true` uses the md5-derived families the
  * DuckDB oracle replicates bit-for-bit; `false` uses xxhash64 (cheaper,
  * production default).
  *
  * Scale shapes (the design contract at 100 TB):
  *   - canonicalization first — d exact copies would inflate pairwise
  *     candidate generation d²-fold — and keyed on the 16-byte content
  *     hash, not the full text (hash-partitioning, key comparison and any
  *     sort-based aggregation fallback then work over 32-char keys instead
  *     of whole documents; the reference's archive is content-hash
  *     addressed the same way, `Identifier.java:63-77`);
  *   - signatures are computed ONCE per canonical document, inside a
  *     custom generator (`minhash_bands` / `simhash_bands` /
  *     `shingle_posts`) that emits the band/posting rows directly — no
  *     `explode(sig_expr)`, so no optimizer rule can clone the signature
  *     into a Filter condition or a second join branch (the round-3 plans
  *     showed both: `InferFiltersFromGenerate` + join-inferred IsNotNull
  *     re-evaluated signatures per RAW doc, and the banded self-join
  *     derived the whole canonicalize+signature subplan twice);
  *   - candidate pairs come from ONE `groupBy(bucket)` + within-bucket
  *     pair explode — a single corpus scan and a single shuffle of
  *     |docs|·bands rows, never a self-join (which cannot reuse its
  *     exchange once AQE broadcasts a side: 2× scans + 2× signature cost);
  *   - `maxDf` / `maxBucket` drop degenerate buckets: a shingle or LSH
  *     bucket shared by k documents emits k(k-1)/2 pairs, so one
  *     boilerplate header shared by a million docs would otherwise emit
  *     5·10^11 pairs. The cap bounds per-bucket work at cap²/2 — and with
  *     `capped_collect_list` the aggregation buffer itself is bounded at
  *     `cap` elements, so a degenerate bucket cannot OOM the collecting
  *     task either. Pairs whose every shared bucket is degenerate are the
  *     only loss (the standard exactness/cost trade).
  */
object TextDedup {

  /** Incremental (archive-vs-batch) dedup: the rows of `batch` whose
    * `keyCol` does NOT occur in `archive` — the daily-ingest shape, where
    * a new crawl is admitted against a standing corpus without ever
    * re-shuffling the corpus itself.
    *
    * Scale shape (100 TB archive, comparatively small batch): a plain
    * `left_anti` join would shuffle BOTH sides on the key. Instead the
    * archive is folded once into a Bloom filter via Spark's own
    * runtime-filter machinery (`BloomFilterAggregate` over `xxhash64(key)`
    * — partial aggregation merges per-partition filters, so the build is
    * one corpus scan with no shuffle and the driver receives a single
    * `numBits/8`-byte blob, the only collect here and bounded by
    * construction). Batch rows whose key the filter rules out are
    * definitely new and bypass the join entirely; only the `mightContain`
    * survivors — true duplicates plus an `fpp` fraction of false
    * positives — reach the exact anti-join that removes the false
    * positives. Results are therefore EXACT (oracle: `NOT IN` over the
    * archive keys); the filter only shrinks the join's left side, and the
    * anti-join's archive side can additionally be partition-pruned to the
    * candidate keys' buckets when the archive is stored bucketed.
    *
    * `expectedItems`/`fpp` size the filter (1M keys at 1% ≈ 1.2 MB; a
    * 10^9-key archive at 1% ≈ 1.2 GB — at that scale raise `fpp` or
    * partition the archive and build per-partition filters). */
  def incrementalNew(
      archive: DataFrame,
      batch: DataFrame,
      keyCol: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    import org.apache.spark.util.sketch.BloomFilter

    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val hashed = expression(xxhash64(col(keyCol)))
    val buildAgg = new BloomFilterAggregate(new XxHash64(Seq(hashed)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val blob = archive.select(column(buildAgg).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (blob == null) batch // empty archive: everything is new
    else {
      val might = column(BloomFilterMightContain(
        Literal(blob, BinaryType), new XxHash64(Seq(hashed))))
      batch.filter(!might).unionByName(
        batch.filter(might)
          .join(archive.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti"))
    }
  }

  /** Exact duplicate groups: one row per distinct content hash. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** One representative (min id) per distinct text, grouped on
    * (content hash, text) with the 16-byte hash FIRST. The hash is
    * redundant as a key (it determines the text up to md5 collisions) but
    * leading with it means every key comparison — hash-table probes and
    * any sort-based aggregation fallback — decides on 32 hex chars
    * instead of whole documents. Both columns stay grouping KEYS: carrying
    * the text as a `min()` value would put a var-length buffer in the
    * aggregate, which HashAggregateExec cannot hold — the whole
    * canonicalization would silently fall to SortAggregate (measured in
    * the round-4 plan audit). */
  def canonicalize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("__h"), col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(textCol), col(idCol))

  /** Within-bucket candidate pairs: group `rows` by `keys`, collect the
    * `payload` structs, and explode all (x, y) ordered pairs per bucket.
    * `maxBucket > 0` switches to `capped_collect_list`: buckets over the
    * cap are dropped whole, with collection memory bounded at the cap.
    * Callers order pairs with their own id predicate. */
  private def bucketPairs(
      rows: DataFrame, keys: Seq[Column], payload: Column, maxBucket: Int): DataFrame = {
    val collected =
      if (maxBucket > 0) capped_collect_list(payload, maxBucket)
      else collect_list(payload)
    rows.groupBy(keys: _*).agg(collected.as("ds"))
      .filter(size(col("ds")) > 1)
      // pair generation as two codegen'd explodes + an inequality filter —
      // the equivalent nested-`transform` index lambda runs INTERPRETED
      // (Spark higher-order functions have no codegen) and was ~40% of the
      // query's time at 1M+ candidate pairs
      .select(explode(col("ds")).as("x"), col("ds"))
      .select(col("x"), explode(col("ds")).as("y"))
  }

  /** Blocking + verify near-dup (the record-linkage contract): candidate
    * pairs come from a cheap deterministic BLOCK key — md5 of the first
    * `blockWords` words, i.e. shared document openings — and are then
    * VERIFIED by exact Levenshtein edit distance ≤ `maxEdit`. The O(len²)
    * verifier runs on within-block pairs only, never the corpus cross
    * product; `maxBucket` caps degenerate blocks (boilerplate openings)
    * with collection memory bounded at the cap, the same knob as the LSH
    * families. One corpus scan: the block groupBy collects (id, text)
    * per bucket and pairs explode in place (each document carries exactly
    * one block key, so a pair can appear in at most one bucket). */
  def blockedEditPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockWords: Int = 5,
      maxEdit: Int = 50,
      maxBucket: Int = 0): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => w =!= lit(""))
    val keyed = docs.select(
      md5(array_join(slice(words, 1, blockWords), " ")).as("bkey"),
      col(idCol).as("doc_id"), col(textCol).as("text"))
    bucketPairs(keyed, Seq(col("bkey")), struct(col("doc_id"), col("text")), maxBucket)
      .filter(col("y.doc_id") > col("x.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        levenshtein(col("x.text"), col("y.text")).as("lev"))
      .filter(col("lev") <= maxEdit)
  }

  /** Exact n-gram Jaccard similar pairs over canonicalized docs:
    * (doc_a, doc_b, n_inter, jaccard) for jaccard >= `threshold`.
    * `maxDf`: drop shingles appearing in more than this many documents
    * (0 = exact, no cap).
    *
    * Each document's shingle count rides THROUGH the posting rows (the
    * `shingle_posts` generator emits (n, s) per distinct shingle), so |A|
    * and |B| fall out of the pair aggregate itself — the corpus is scanned
    * once and the only full-text exchange is the caller's
    * canonicalization. A document emits each distinct shingle exactly once
    * (the generator dedups), so plain `collect_list` postings carry no
    * duplicates. */
  def jaccardPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      portable: Boolean = false,
      maxDf: Int = 0): DataFrame = {
    val sh = canon.select(col(idCol).as("doc_id"), shingle_posts(col(textCol), portable))
    bucketPairs(sh, Seq(col("s")), struct(col("doc_id"), col("n")), maxDf)
      .filter(col("y.doc_id") > col("x.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"), max(col("x.n")).as("na"), max(col("y.n")).as("nb"))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** Containment similar pairs over canonicalized docs:
    * (doc_a, doc_b, n_inter, containment) for
    * containment = |A∩B| / min(|A|, |B|) >= `threshold` — the ASYMMETRIC
    * overlap metric that catches partial copies (a quoted paragraph, a
    * doc embedded in a larger one), which symmetric Jaccard dilutes
    * toward zero as the containing document grows. Identical plan shape
    * to [[jaccardPairs]]: shingle posting generator, one groupBy, counts
    * riding the postings; `maxDf` caps degenerate shingles. */
  def containmentPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      portable: Boolean = false,
      maxDf: Int = 0): DataFrame = {
    val sh = canon.select(col(idCol).as("doc_id"), shingle_posts(col(textCol), portable))
    bucketPairs(sh, Seq(col("s")), struct(col("doc_id"), col("n")), maxDf)
      .filter(col("y.doc_id") > col("x.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"), max(col("x.n")).as("na"), max(col("y.n")).as("nb"))
      .withColumn("containment", round(col("n_inter").cast("double") /
        least(col("na"), col("nb")), 6))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "containment")
  }

  /** Winnowing-fingerprint candidate pairs over canonicalized docs:
    * (doc_a, doc_b) for documents sharing their minimal 32-byte-window
    * rolling hash (the MOSS/winnowing selection rule: the minimum over
    * all window hashes is always among any winnowed sketch, so two docs
    * sharing a long run of bytes that contains both their global minima
    * collide). The cheapest near-dup family: ONE 8-byte fingerprint per
    * document — grouping, shuffle, and state are all constant-size per
    * doc, no signature arrays, no banding — at the recall floor (exact
    * copies and copies-with-suffix/prefix-edits collide; interior edits
    * near the minimum break it). `maxBucket` as in [[minhashPairs]]. */
  def fingerprintPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 32,
      maxBucket: Int = 0): DataFrame = {
    val fp = canon.select(col(idCol).as("doc_id"),
      graft.functions.RollingHash.min_window_hash(col(textCol), window).as("fp"))
    // no .distinct(): each doc carries exactly ONE fingerprint, so a pair
    // can only arise in one bucket, once — unlike the banded families
    bucketPairs(fp, Seq(col("fp")), col("doc_id"), maxBucket)
      .filter(col("y") > col("x"))
      .select(col("x").as("doc_a"), col("y").as("doc_b"))
  }

  /** Train/eval contamination detection: shingle-overlap pairs BETWEEN
    * two corpora — (doc_id, bench_id, n_shared) for every corpus/benchmark
    * document pair sharing at least `minOverlap` n-gram shingles. The
    * bipartite inverted-index join: candidates only from shared shingles
    * (never corpus × benchmark), one `shingle_posts` generator pass per
    * document, one equi-join on the 64-bit shingle key. The benchmark side
    * is typically tiny (an eval set) — Spark broadcasts it when it fits.
    *
    * `maxDf > 0` drops shingles appearing in more than that many CORPUS
    * documents before the join — the family's degenerate-key guard
    * ([[jaccardPairs]]' maxDf): join output is Σ_s corpus_df(s)·bench_df(s),
    * so one boilerplate shingle (a license header, navigation chrome) in
    * millions of documents multiplies against every benchmark doc
    * containing it — df² blowup no partition strategy absorbs. The cap
    * costs one extra postings aggregate (collection memory bounded at the
    * cap) and makes `n_shared` a LOWER bound: pairs whose only shared
    * shingles are ubiquitous fall below `minOverlap` and are consciously
    * forgone, exactly the jaccard contract. With maxDf = 0 the plan is
    * unchanged (no corpus-side shuffle at all). Independent of the cap, a
    * heavily EXACT-DUPLICATED corpus multiplies output legitimately
    * (every copy of a contaminated doc is contaminated) — run the sweep
    * on the canonicalized corpus (as the q_prep_pipeline chain does)
    * when copies should count once. */
  def crossOverlapPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      minOverlap: Int,
      portable: Boolean = false,
      maxDf: Int = 0): DataFrame = {
    def postings(df: DataFrame, out: String) = df
      .select(col(idCol).as(out), shingle_posts(col(textCol), portable))
      .select(col(out), col("s"))
    val cp = postings(corpus, "doc_id")
    val capped =
      if (maxDf <= 0) cp
      else cp.groupBy(col("s"))
        .agg(graft.functions.CappedCollectList
          .capped_collect_list(col("doc_id"), maxDf).as("ds"))
        .filter(col("ds").isNotNull) // null = over the cap: drop the shingle whole
        .select(col("s"), explode(col("ds")).as("doc_id"))
    capped.join(postings(benchmark, "bench_id"), "s")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
  }

  /** Bipartite exact n-gram Jaccard — the NEAR-DUP analogue of
    * [[crossOverlapPairs]], for admission decisions that need the
    * calibrated jaccard value rather than a raw shared-shingle count
    * (the daily-ingest near-dup gate: batch vs standing archive). Each
    * side's shingle count rides through its postings exactly as in
    * [[jaccardPairs]], so the score needs no second text scan. Scale
    * shape: the archive postings shuffle once on the shingle key — at
    * corpus scale that side is a STANDING posting index computed once
    * and stored bucketed on `s`, so a daily batch joins it with zero
    * archive-side exchange; `maxDf` caps degenerate shingles as usual.
    * Returns (doc_id, bench_id, n_inter, jaccard) for
    * jaccard >= `threshold`. */
  def crossJaccardPairs(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      portable: Boolean = false,
      maxDf: Int = 0): DataFrame = {
    def postings(df: DataFrame, out: String, n: String) = df
      .select(col(idCol).as(out), shingle_posts(col(textCol), portable))
      .select(col(out), col("n").as(n), col("s"))
    val cp = postings(corpus, "doc_id", "na")
    val capped =
      if (maxDf <= 0) cp
      else cp.groupBy(col("s"))
        .agg(graft.functions.CappedCollectList
          .capped_collect_list(struct(col("doc_id"), col("na")), maxDf).as("ds"))
        .filter(col("ds").isNotNull)
        .select(col("s"), explode(col("ds")).as("d"))
        .select(col("d.doc_id").as("doc_id"), col("d.na").as("na"), col("s"))
    capped.join(postings(batch, "bench_id", "nb"), "s")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_inter"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_id", "bench_id", "n_inter", "jaccard")
  }

  /** MinHash/LSH candidate pairs over canonicalized docs:
    * (doc_a, doc_b, n_match, est_jaccard) for est >= `threshold`.
    * `maxBucket`: drop (band, bkey) buckets holding more than this many
    * documents (0 = no cap) — the LSH analogue of `maxDf`; a pair is lost
    * only if EVERY band it agrees on is degenerate. */
  def minhashPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 32,
      bands: Int = 8,
      portable: Boolean = false,
      maxBucket: Int = 0): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val banded = canon.select(col(idCol).as("doc_id"),
      minhash_bands(col(textCol), k, bands, portable))
    bucketPairs(banded, Seq(col("band"), col("bkey")),
        struct(col("doc_id"), col("sig")), maxBucket)
      .filter(col("y.doc_id") > col("x.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        // codegen'd signature-agreement count (zip_with/filter lambdas
        // would run interpreted per candidate pair)
        graft.functions.ArrEqCount.arr_eq_count(col("x.sig"), col("y.sig")).as("n_match"))
      .distinct()
      .withColumn("est_jaccard", round(col("n_match").cast("double") / k, 6))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_match", "est_jaccard")
  }

  /** Duplicate clusters from candidate pairs: connected components over
    * the pair graph, as (member, cluster_rep = component-minimum id) —
    * the step that turns pairwise near-dup evidence into "keep one per
    * group". Only documents appearing in at least one pair are emitted
    * (singletons are their own trivial cluster).
    *
    * Algorithm: min-label propagation to fixpoint. Each round every
    * vertex takes the minimum label among itself and its neighbors — one
    * equi-join + one groupBy per round, `O(component diameter)` rounds
    * (near-dup clusters are small and star-like, so a handful; the
    * fixpoint is unique, hence deterministic). For chain-heavy graphs —
    * where diameter, not cluster count, dominates — use
    * [[duplicateClustersStar]]: same output, `O(log n)` rounds.
    *
    * Round cost is ONE Spark job: each round's labels localCheckpoint
    * LAZILY and the convergence count doubles as the materializing
    * action (an eager checkpoint plus a separate count probe was two
    * blocking round-trips per round — 25% of the round-4 bench headline
    * in this one operator). Blocks are released as soon as they are
    * superseded: the previous round's labels right after the new round
    * materializes, the edge list on exit. The RETURNED frame is itself
    * checkpointed (it must be — its lineage is gone); callers release it
    * via `graft.plans.Checkpoints.release` once consumed. */
  def duplicateClusters(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxRounds: Int = 50): DataFrame =
    propagateMinLabels(pairs, aCol, bCol, maxRounds)._1

  /** [[duplicateClusters]] plus the round count (spec instrumentation). */
  private[graft] def propagateMinLabels(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int): (DataFrame, Int) = {
    val (res, rounds) = propagateCore(pairs, aCol, bCol, maxRounds, strict = true)
    (res.get, rounds)
  }

  /** Propagation bounded by `budget` rounds: `Some(labels)` on
    * convergence, `None` (with every internal frame released) when the
    * budget runs out — [[autoClusters]]' attempt phase. */
  private[graft] def propagateWithin(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      budget: Int): Option[DataFrame] =
    propagateCore(pairs, aCol, bCol, budget, strict = false)._1

  private def propagateCore(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int,
      strict: Boolean): (Option[DataFrame], Int) = {
    // materialize the edge list ONCE: every propagation round joins it,
    // and candidate pairs are usually the output of a whole dedup
    // pipeline — leaving them UNPINNED re-executes that pipeline per
    // round (measured 5.6s -> 3.1s on the jaccard graph at sf0.1).
    // LAZY checkpoints (round 18): round 1's convergence count is the
    // materializing action for the whole init chain — edges and the
    // fused init labels persist inside that one job instead of paying
    // two dedicated blocking jobs per clustering call (guide §1.2 job
    // count; consumers here are strictly sequential driver actions).
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    // round 1 FUSED into the label init (round-17): the first round's
    // result is just min(id ∪ N(id)), computable by the same groupBy that
    // would otherwise build the trivial id-labels — one fewer round and
    // one fewer init job on every clustering query; the fixpoint is
    // unique, so the result is unchanged (q_cc_convergence's
    // per-round-audit sibling propagationTrace keeps the literal rounds).
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), col("src")).as("lbl"))
      .localCheckpoint(eager = false)
    var round = 1
    var converged = false
    while (!converged) {
      if (round >= maxRounds) {
        require(!strict, s"label propagation did not converge in $maxRounds rounds")
        // budget exhausted (auto's attempt phase): release everything and
        // let the caller fall back to star
        graft.plans.Checkpoints.release(labels)
        graft.plans.Checkpoints.release(edges)
        return (None, round)
      }
      val nbr = edges.join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nlbl")).as("nmin"))
      val updated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), col("nmin")).as("lbl"),
          (col("nmin") < col("lbl")).as("chg"))
        .localCheckpoint(eager = false)
      // the ONE action of the round: counting changed rows scans every
      // partition of `updated`, so it materializes the lazy checkpoint
      // as a side effect — convergence probe and checkpoint job fused
      // (round-17 also tried running rounds in lazily-chained PAIRS per
      // count job — measured flat at sf0.1, reverted to the simpler form)
      converged = updated.filter(col("chg")).count() == 0
      graft.plans.Checkpoints.release(labels) // superseded; updated is materialized
      labels = updated.select(col("id"), col("lbl"))
      round += 1
    }
    graft.plans.Checkpoints.release(edges)
    (Some(labels.select(col("id").as("member"), col("lbl").as("cluster_rep"))), round)
  }

  /** CONVERGENCE AUDIT for min-label propagation: run exactly `rounds`
    * rounds and report labels-changed per round — trailing zeros are the
    * EVIDENCE that the graph converges within the budget (the analogue of
    * [[graft.operators.GraphRank.pagerankTrace]] for the component
    * family; [[duplicateClustersAuto]]'s propagation budget is otherwise
    * justified only by the Moore-bound argument in its doc). Fixed round
    * count so both engines execute identical rounds; one bounded 1-row
    * collect per round, nothing corpus-sized reaches the driver.
    * Returns (round, n_changed). */
  def propagationTrace(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      rounds: Int = 6): DataFrame = {
    require(rounds >= 1)
    // lazy init, materialized by round 1's movement count (round 18 —
    // the propagateCore job-count fusion; the trace's OUTPUT is the
    // per-round movement numbers, which laziness cannot change)
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(eager = false)
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    for (r <- 1 to rounds) {
      val nbr = edges.join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nlbl")).as("nmin"))
      val updated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), col("nmin")).as("lbl"),
          (col("nmin") < col("lbl")).as("chg"))
        .localCheckpoint(eager = false)
      // the round's one action: materializes the lazy checkpoint AND
      // counts the movement (the propagateCore fused-action shape)
      trace += ((r, updated.filter(col("chg")).count()))
      graft.plans.Checkpoints.release(labels)
      labels = updated.select(col("id"), col("lbl"))
    }
    graft.plans.Checkpoints.release(labels)
    graft.plans.Checkpoints.release(edges)
    val spark = pairs.sparkSession
    import spark.implicits._
    trace.toSeq.toDF("round", "n_changed")
  }

  /** [[duplicateClusters]] by alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * identical output — (member, cluster_rep = component minimum), same
    * unique fixpoint — but `O(log n)` rounds instead of `O(diameter)`,
    * the right choice when components may be long CHAINS (transitive
    * near-dup evidence: A~B~C~... without A~C pairs) rather than the
    * star-like clusters plain propagation handles in a handful of rounds.
    *
    * Each phase rewrites the edge set toward a forest of stars rooted at
    * component minima: large-star points every neighbor LARGER than a
    * node at that node's neighborhood minimum (including itself);
    * small-star does the same for the smaller-or-equal neighbors. Both
    * are one groupBy (neighborhood min) + one broadcast-size join back —
    * the same per-round plan family as propagation, over an edge frame
    * that only ever shrinks toward one edge per non-root vertex.
    * Convergence: the edge set is a fixpoint of both phases — set
    * equality probed by ONE 1-row aggregate per round (count plus
    * left-join membership diff in the same job, which also materializes
    * the round's lazy checkpoints — the same fused-action shape as
    * propagation). The per-round lifecycle matches [[duplicateClusters]]:
    * lazy checkpoint materialized by the convergence action, superseded
    * frames released immediately, the returned frame checkpointed
    * (callers release it via `graft.plans.Checkpoints.release`). */
  def duplicateClustersStar(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxRounds: Int = 50): DataFrame =
    starClusters(pairs, aCol, bCol, maxRounds)._1

  /** [[duplicateClustersStar]] plus the round count (spec instrumentation). */
  private[graft] def starClusters(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int): (DataFrame, Int) = {
    // undirected edges, no self-loops; (u, v) kept one-per-pair — each
    // phase re-derives the bidirectional view it needs
    // lazy checkpoint + count: the count is the materializing action, so
    // the init costs one job, not two (round 18, guide §1.2 job count)
    var edges = pairs
      .select(least(col(aCol), col(bCol)).as("u"), greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = false)
    var nEdges = edges.count()

    // one star phase: for each node x, m(x) = min(N(x) ∪ {x}); re-point
    // the selected side of every edge at m. `largeSide` picks which
    // neighbors move: the larger one (large-star) or the smaller-or-equal
    // one plus the node itself (small-star). Candidates come back WITH
    // duplicates; the caller closes the phase with its own aggregate.
    // NOTE the large phase's closing distinct() is load-bearing for
    // THROUGHPUT, not just set semantics: an experiment skipping it
    // (duplicates are harmless to small-star's min and to the round's
    // final distinct) measured 3.8s -> 6.0s on the 100k probe —
    // duplicate inflation through small-star's two shuffles and join
    // costs more than the dedup shuffle it saves.
    def phaseCand(bi: DataFrame, large: Boolean): DataFrame = {
      val m = bi.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("m"))
      val joined = bi.join(m, "src")
      val out =
        if (large) joined.filter(col("dst") > col("src"))
          .select(col("dst").as("x"), col("m"))
        else joined.filter(col("dst") < col("src"))
          .select(col("dst").as("x"), col("m"))
          .union(m.select(col("src").as("x"), col("m")))
      out.filter(col("x") =!= col("m"))
        .select(least(col("x"), col("m")).as("u"), greatest(col("x"), col("m")).as("v"))
    }
    def bidir(e: DataFrame): DataFrame =
      e.select(col("u").as("src"), col("v").as("dst"))
        .union(e.select(col("v").as("src"), col("u").as("dst")))

    // the convergence probe FUSED into small-star's closing distinct
    // (round-18, guide §2.4 "two operations keyed the same way share one
    // exchange"): the old shape closed the phase with distinct() over
    // (u, v) and then LEFT-JOINED the old edge set back for the
    // membership diff — a second (u, v)-keyed exchange plus a join per
    // round. Now the old edges ride the SAME groupBy(u, v) exchange as
    // the candidates, flagged; one aggregate yields next's edges AND the
    // exact two-sided set diff (fresh = in next only, stale = in old
    // only; both zero ⟺ set equality, the same convergence criterion).
    // `edges` between rounds is a narrow filter over the round's
    // checkpointed grouped frame; `cp` tracks the persisted backing.
    var cp = edges
    var round = 0
    var converged = false
    while (!converged) {
      require(round < maxRounds, s"star rounds did not converge in $maxRounds rounds")
      // the large-star intermediate feeds the small-star phase TWICE (its
      // neighborhood-min aggregate and the join back) — a lazy checkpoint
      // pins it to ONE RDD, so the round's single job computes the phase
      // once and the second consumer reads persisted blocks; without it,
      // AQE broadcasting one join side defeats exchange reuse and the
      // whole large-star subplan derives twice (the round-3 LSH lesson)
      val large = phaseCand(bidir(edges), large = true).distinct()
        .localCheckpoint(eager = false)
      val grouped = phaseCand(bidir(large), large = false)
        .select(col("u"), col("v"), lit(1).as("__cand"))
        .union(edges.select(col("u"), col("v"), lit(0).as("__cand")))
        .groupBy(col("u"), col("v"))
        .agg(max(col("__cand")).as("in_next"), min(col("__cand")).as("all_next"))
        .localCheckpoint(eager = false)
      // the ONE action of the round: the probe aggregate scans every
      // partition of `grouped`, materializing both lazy checkpoints AND
      // deciding convergence in the same job. Old edges are distinct, so
      // a group is: next-only (in_next=1, all_next=1 → fresh), old-only
      // (in_next=0 → stale), or shared (in_next=1, all_next=0).
      // coalesce: SUM over an empty frame is NULL (an empty pair graph
      // must read as converged-with-zero-edges, not NPE)
      val probe = grouped.agg(
        coalesce(sum(col("in_next")), lit(0L)).as("n"),
        coalesce(sum(col("all_next")), lit(0L)).as("fresh"),
        coalesce(sum(lit(1) - col("in_next")), lit(0L)).as("stale")
      ).head()
      val nNext = probe.getLong(0)
      converged = probe.getLong(1) == 0L && probe.getLong(2) == 0L
      graft.plans.Checkpoints.release(large) // intra-round scratch
      graft.plans.Checkpoints.release(cp)
      cp = grouped
      edges = grouped.filter(col("in_next") === 1).select(col("u"), col("v"))
      nEdges = nNext
      round += 1
    }
    // fixpoint = forest of stars: every edge is (root=u, member=v) with
    // u the component minimum; roots are members of their own cluster
    val labels = edges.select(col("v").as("member"), col("u").as("cluster_rep"))
      .union(edges.select(col("u").as("member"), col("u").as("cluster_rep")))
      .distinct()
      .localCheckpoint(true)
    graft.plans.Checkpoints.release(cp) // edges is a view over cp's blocks
    (labels, round)
  }

  /** [[duplicateClusters]] / [[duplicateClustersStar]] with the variant
    * chosen automatically, by ATTEMPT rather than by a graph statistic.
    * Propagation costs ~1 job per round for ~diameter rounds; star costs
    * ~2 jobs per round for ~log n rounds — so propagation wins on the
    * star-like clusters dedup evidence usually forms (diameter a
    * handful, including the commonest shape of MANY tiny disconnected
    * components) and loses badly on chain-shaped transitive evidence
    * (A~B~C~… without A~C). No cheap one-pass statistic separates the
    * two: any global degree/vertex bound (Moore-style) is only valid for
    * a CONNECTED graph, and a million disjoint duplicate pairs look
    * exactly like one enormous path to it. So auto RUNS propagation with
    * a round budget of ~2·log₂(2·|edges|)+2 — star's own worst-case
    * round bill — and falls back to star from the original edges if the
    * budget is exhausted. Star-like graphs converge within the budget
    * and pay nothing extra; chain-heavy graphs waste at most the budget
    * (a logarithmic number of cheap rounds, each one job) before the
    * O(log n) variant takes over — never the O(diameter) blowup, and
    * never a wrong answer: both variants reach the identical unique
    * fixpoint, and the returned (checkpointed) frame is
    * release-contracted the same way. */
  def duplicateClustersAuto(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxRounds: Int = 50): DataFrame = autoClusters(pairs, aCol, bCol, maxRounds)._1

  /** [[duplicateClustersAuto]] plus which path produced the result
    * ("propagation" | "star") — spec instrumentation. */
  private[graft] def autoClusters(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int): (DataFrame, String) = {
    // normalized edge list, materialized ONCE: the attempt and the
    // fallback both consume it (each re-derives its own working frame
    // from persisted blocks, not from the pair pipeline)
    // lazy checkpoint + count: the budget count doubles as the
    // materializing action (round 18 — one job, not two; the attempt and
    // the fallback then both read the persisted blocks)
    val edges = pairs
      .select(least(col(aCol), col(bCol)).as("u"), greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = false)
    val nEdges = edges.count()
    // a component on E edges has at most 2E vertices, so star needs at
    // most ~log2(2E) rounds; give propagation twice that (its rounds
    // cost half as much) plus slack. NOTE the budget counts
    // propagateCore's POST-FUSION rounds (round 17 fused literal round 1
    // into the label init, so `budget` buys 1 fused round + budget-1
    // probed rounds — one literal round MORE than pre-fusion units);
    // a future tightening must not reason in pre-fusion round units.
    val budget = math.min(maxRounds,
      2 * (64 - java.lang.Long.numberOfLeadingZeros(math.max(2 * nEdges, 2L))) + 2)
    val result = propagateWithin(edges, "u", "v", budget) match {
      case Some(labels) => (labels, "propagation")
      case None => (duplicateClustersStar(edges, "u", "v", maxRounds), "star")
    }
    graft.plans.Checkpoints.release(edges)
    result
  }

  /** Keeper selection over duplicate components: one row per cluster —
    * (cluster_rep, keep_id, keep_score, n_members) — keeping the member
    * with the best score (max by default, min when `ascending`), ties by
    * lowest member id. `comps` is [[duplicateClusters]]-shaped
    * (member, cluster_rep); `scores` carries (`idCol`, `scoreCol`) —
    * typically a 2-column pruned metadata scan, never a second text
    * scan. The rank window partitions by cluster_rep (components are
    * small by construction), so there is no global window and no serial
    * exchange — the only shuffle is the hash partition on cluster_rep. */
  def keepers(
      comps: DataFrame,
      scores: DataFrame,
      idCol: String,
      scoreCol: String,
      ascending: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_rep")
    val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    comps.join(scores, comps("member") === scores(idCol))
      .select(col("cluster_rep"), col("member"), col(scoreCol))
      .withColumn("rn", row_number().over(w.orderBy(ord, col("member"))))
      .withColumn("n_members", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_rep"), col("member").as("keep_id"),
        col(scoreCol).as("keep_score"), col("n_members"))
  }

  /** SimHash candidate pairs over canonicalized docs:
    * (doc_a, doc_b, hamming) for hamming <= `maxHamming`. Band count and
    * width follow the pigeonhole rule: maxHamming+1 bands guarantee two
    * signatures within the distance share an exact band. `maxBucket` as in
    * [[minhashPairs]] — here a dropped band bucket can break the
    * pigeonhole guarantee for pairs confined to it, the documented recall
    * trade of capping. */
  def simhashPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      portable: Boolean = false,
      maxBucket: Int = 0): DataFrame = {
    val bands = maxHamming + 1
    val width = 60 / bands
    val banded = canon.select(col(idCol).as("doc_id"),
      simhash_bands(col(textCol), bands, width, portable))
    bucketPairs(banded, Seq(col("band"), col("bkey")),
        struct(col("doc_id"), col("simhash")), maxBucket)
      .filter(col("y.doc_id") > col("x.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Segment-level (line/paragraph) exact dedup across the CORPUS — the
    * CCNet shape: every document is split into segments by the caller
    * (`segsCol`: `ARRAY<STRING>`, e.g. lines, paragraphs, or fixed token
    * windows when the corpus has no line structure), and only the GLOBAL
    * first occurrence of each distinct segment survives; documents are
    * rebuilt from their kept segments in original order. This removes
    * cross-document boilerplate (headers, navigation, license blocks)
    * that document-level dedup cannot see.
    *
    * "First occurrence" is the minimal (`idCol`, position) pair per
    * segment hash — a total deterministic order, so the result is
    * reproducible regardless of partitioning.
    *
    * Scale shape (100 TB): ONE corpus scan — posexplode (no shuffle), then
    * first-occurrence selection as `row_number() over (partition by hash
    * order by id, pos)`: one exchange keyed on the 16-byte segment hash
    * (hashes shuffle, never segment text) with a within-partition sort,
    * and a per-document rebuild grouped on `idCol`. The groupBy+join-back
    * formulation of the same semantics derived the scan+segmentation
    * subplan on BOTH join sides (2 corpus scans, and the join-inferred
    * IsNotNull re-ran the segmentation lambdas per row) and its
    * `min(struct(id, pos))` fell to SortAggregate — the window form is
    * strictly fewer exchanges and keeps the lineage single. The rebuild's
    * `collect_list` buffer is bounded by the caller's segmentation (one
    * document's own segments), not by corpus size.
    * Returns (`idCol`, n_segs, n_kept, text_deduped). */
  def dedupSegments(docs: DataFrame, idCol: String, segsCol: String,
      sep: String = " "): DataFrame = {
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col(idCol), col("pos"))
    docs
      .select(col(idCol), posexplode(col(segsCol)).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
      .withColumn("keep", row_number().over(byHash) === 1)
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN struct(pos, seg) END)), p -> p.seg)"),
          sep).as("text_deduped"))
  }

  /** EXACT duplicated-substring detection with keep-first-occurrence
    * semantics (the suffix-array dedup rule from the training-data
    * literature, re-expressed as a distributed inverted index): a
    * duplicated substring of >= `minLen` tokens necessarily contains a
    * duplicated `minLen`-token window, so the union of the NON-KEEPER
    * duplicated window instances is exactly the token set a keep-first
    * substring dedup removes. Keeper per window hash = the globally first
    * instance, min (id, position) — computed as `row_number() > 1` over a
    * hash-partitioned window, the same shape `dedupSegments` settled on:
    * rn > 1 already implies the hash is duplicated, so ONE exchange+sort
    * on the 60-bit key replaces the groupBy+join-back form (whose
    * min(struct) buffer falls to SortAggregate and which scans the
    * posting stream twice). Merged maximal spans and the exact
    * removed-token union length come from the sorted-starts lag trick
    * (first start contributes `minLen`; each subsequent start
    * min(minLen, gap)); windows there are partitioned by document, never
    * corpus-wide. Adjacent/overlapping windows merge into one span.
    * Linear in corpus size; at extreme scale prune ubiquitous window
    * hashes first, exactly as `jaccardPairs` does with `maxDf`.
    * Returns (`idCol`, n_dup_windows, n_spans, n_dup_tokens, dup_ratio)
    * for documents with at least one removed window. */
  def substringDups(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 8): DataFrame = {
    import graft.functions.GramHashes.gram_hashes
    import graft.functions.SplitWords.split_words
    val base = docs.select(col(idCol), col(textCol).as("__text"))
    val grams = base.select(col(idCol),
      posexplode(gram_hashes(col("__text"), minLen)).as(Seq("p", "g")))
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col(idCol), col("p"))
    val dup = grams
      .withColumn("rn", row_number().over(byHash))
      .filter(col("rn") > 1)
      .select(col(idCol), col("p"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("p")
    val perDoc = dup.withColumn("prev", lag(col("p"), 1).over(byDoc))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_dup_windows"),
        sum(when(col("prev").isNull || col("p") - col("prev") > minLen, 1L)
          .otherwise(0L)).as("n_spans"),
        sum(when(col("prev").isNull, lit(minLen))
          .otherwise(least(lit(minLen), col("p") - col("prev"))).cast("long"))
          .as("n_dup_tokens"))
    val nTok = base.select(col(idCol),
      size(split_words(col("__text"))).as("__n_tokens"))
    perDoc.join(nTok, Seq(idCol))
      .withColumn("dup_ratio",
        round(col("n_dup_tokens").cast("double") / col("__n_tokens"), 6))
      .drop("__n_tokens")
  }

  /** Tier-3 status overlay for the dedup waterfall (q_dedup_waterfall):
    * given a curation ledger (`idCol`, `status`, ...) and an
    * asymmetric-containment pair frame (`doc_a` < `doc_b`, e.g.
    * [[containmentPairs]] output), demote surviving (`'kept'`) docs
    * that lose a containment pair to `'contained'`. Pairs with a
    * non-surviving side are ignored — that doc already fell to an
    * earlier tier, so the pair attributes nothing to tier 3.
    *
    * The removal rule is pairwise-greedy and ORDER-FREE: in every
    * surviving pair the smaller-`sizeCol` side loses (ties drop the
    * larger id), and a doc that loses ANY pair is demoted. No iterative
    * re-matching: a winner is never re-examined after its counterpart
    * drops, which makes attribution a pure join chain (ledger +
    * pair-sized joins + distinct over losers) instead of a sequential
    * fixpoint — the property that keeps the tier shuffle-bounded by the
    * pair graph, not the corpus. */
  def containedOverlay(ledger: DataFrame, pairs: DataFrame, sizes: DataFrame,
      idCol: String, sizeCol: String): DataFrame = {
    val kept = ledger.filter(col("status") === "kept").select(col(idCol))
    val surv = pairs
      .join(kept.select(col(idCol).as("doc_a")), "doc_a")
      .join(kept.select(col(idCol).as("doc_b")), "doc_b")
    val losers = surv
      .join(sizes.select(col(idCol).as("doc_a"), col(sizeCol).as("__ca")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col(sizeCol).as("__cb")), "doc_b")
      .select(when(col("__ca") < col("__cb"), col("doc_a"))
        .when(col("__cb") < col("__ca"), col("doc_b"))
        .otherwise(greatest(col("doc_a"), col("doc_b"))).as(idCol))
      .distinct()
    ledger.join(losers.withColumn("__l", lit(true)), Seq(idCol), "left")
      .withColumn("status",
        when(col("status") === "kept" && col("__l").isNotNull, lit("contained"))
          .otherwise(col("status")))
      .drop("__l")
  }
}
