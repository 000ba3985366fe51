package graft

/** Physical-plan property checks: the 100-TB design contract, asserted.
  * These catch regressions like a lost pushdown, a dropped broadcast, or a
  * new shuffle in the annotation chain — things correctness tests can't see. */
class PlanCheckSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("scan: filter and projection reach the parquet reader") {
    val p = plan("q_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double>"), "column pruning lost")
  }

  test("date filter is pushed down to the scan") {
    val p = plan("q_filter_date")
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p.take(800))
  }

  test("partitioned-write read-back prunes partitions at the scan") {
    val p = plan("q_partitioned_write")
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"lang filter must prune partition directories:\n${p.take(800)}")
  }

  test("runtime-derived dimension set becomes a dynamicpruning PartitionFilter") {
    val p = plan("q_join_dpp")
    assert(p.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition pruning subquery:\n${p.take(1200)}")
  }

  test("z-ordered staging read-back pushes BOTH box predicates to the scan") {
    val p = plan("q_zorder_layout")
    assert(p.contains("PushedFilters") && p.contains("l_partkey") &&
      p.contains("l_suppkey"),
      s"both box dimensions must reach the parquet scan:\n${p.take(800)}")
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("q_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p.take(800))
    assert(!p.contains("SortMergeJoin"), "dim join must not sort-merge")
  }

  test("aggregation is partial (map-side combine) + final") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
    // one hash shuffle for the groupBy; the rangepartitioning exchange is
    // the oracle-only presentation sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "q1 needs exactly one computation shuffle")
  }

  test("per-group top-k uses WindowGroupLimit pushdown (partial rank filter)") {
    val p = plan("q_topk_pergroup")
    assert(p.contains("WindowGroupLimit"), "rank-limit pushdown missing")
  }

  test("per-language capped sampling pre-prunes the exchange with WindowGroupLimit") {
    // the selection side must shuffle langs x cap x partitions rows, not
    // the corpus: partial WindowGroupLimit before the lang exchange
    val p = plan("q_mix_lang_capped")
    assert(p.contains("WindowGroupLimit"), "capped-sample rank prune missing")
  }

  test("runtime bloom filter prunes the fact side before the join shuffle") {
    // q_join_bloom builds on a child session with the production plan
    // shape pinned: the selective dimension side must yield a
    // bloom_filter_agg and the fact scan must carry might_contain
    val p = plan("q_join_bloom")
    assert(p.toLowerCase.contains("bloom_filter_agg"),
      s"bloom filter creation missing:\n${p.take(1200)}")
    assert(p.toLowerCase.contains("might_contain"),
      s"bloom probe missing on the application side:\n${p.take(1200)}")
  }

  test("big-big equi join falls back to sort-merge when broadcast is off") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_join_inner")
      assert(p.contains("SortMergeJoin"), p.take(600))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("bucketed fact-fact join pays zero join-side exchanges (ingest-time shuffle)") {
    // broadcast off so the join cannot degenerate into BHJ at test SF;
    // the only hash exchange left must be the final aggregate's
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_join_bucketed")
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"bucketed join must not shuffle either side:\n${p.take(1200)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("ingest dedup is a hash aggregate over the text, not a sort aggregate over maps") {
    val ds = graft.sources.Sources.fromTextColumn(
      spark.read.parquet(s"$dir/documents.parquet"), "text")
    val p = ds.queryExecution.executedPlan.toString
    assert(!p.contains("SortAggregate"), s"map-column dedup fell back to sort agg:\n${p.take(600)}")
  }

  test("no query serializes the corpus through a single-partition exchange") {
    // Allowlist, each with a reason the serial point is bounded:
    //  - q_sample: global orderBy(rand).limit(k) — the single partition
    //    sees only the per-partition top-k candidates, k = 25;
    //  - q_window_rank: the size-adaptive global-ntile serial fast path
    //    (inputs under ScalableWindows.SerialThresholdBytes; above it the
    //    distributed quantile-bucket form takes over — ScalableWindowsSpec);
    //  - q_sql_scalar_subquery: the scalar AVG finalizes on one task, but
    //    only per-partition partial aggregates cross the exchange;
    //  - q_window_rank_global: forces the distributed rank path; the only
    //    serial exchanges are the offsets windows over <= `partitions`
    //    per-bucket count rows (the corpus side hash-partitions on the
    //    quantile bucket — asserted in ScalableWindowsSpec).
    //  - q_pack_sequences / q_pack_bpe: force the distributed running
    //    sum; like the global-rank queries, the only serial exchanges are
    //    the offsets windows over <= `partitions` per-bucket summary rows
    //    (q_pack_bpe's corpus side — the per-doc BPE token counts —
    //    hash-partitions on the quantile bucket exactly like
    //    q_pack_sequences; asserted in ScalableWindowsSpec);
    //  - q_tfidf: the broadcast corpus-size scalar (count(*) over
    //    documents) finalizes on one task, but only per-partition partial
    //    counts cross the exchange — the q_sql_scalar_subquery shape;
    //  - q_compact_store: a single-row GLOBAL aggregate over the
    //    compacted store — only per-partition partials (counts, sums,
    //    min/max, distinct file names) cross the exchange, never rows.
    //  - q_lm_buckets / q_shuffle_train_order: force the distributed
    //    ntile / row_number path; the only serial exchanges are the
    //    offsets windows over <= `partitions` per-bucket summary rows
    //    (same contract as q_window_rank_global / q_pack_sequences).
    //  - q_token_budget_epochs: the 1-row sqrt-sum normalizer finalizes
    //    on one task, but only per-partition partial sums cross the
    //    exchange — the q_sql_scalar_subquery shape.
    //  - q_profile: single global aggregate BY DESIGN (the ANALYZE
    //    shape); only per-partition partials (counts, HLL/expand
    //    distinct partials, packed min/max) cross the exchange.
    //  - q_cms_union / q_join_bloom: the sketch finalize — per-day CMS
    //    sketches / per-partition bloom buffers union on one task;
    //    rows crossing the exchange are bounded by days/partitions,
    //    never the corpus.
    //  - q_bm25 / q_rrf_fusion: the 1-row corpus-stats frame (doc count
    //    + total len, inside the BM25 scorer both queries share)
    //    finalizes on one task from per-partition partial sums, then
    //    broadcasts — the q_sql_scalar_subquery shape again.
    //  - q_vocab_coverage: the global frequency rank routes through
    //    ScalableWindows (serial only under the 4 MB gate — the
    //    q_window_rank shape) and the 1-row total-token frame finalizes
    //    from per-partition partial sums (the q_tfidf shape); both
    //    serial points see bounded rows, never the corpus stream.
    //  - q_embed_pca: the mean frame and each power iterate are 1-row
    //    global aggregates (64 decimal buffers) finalizing from
    //    per-partition partials, then broadcast — the q_tfidf shape,
    //    once per iterate by construction of power iteration.
    val allow = Set("q_sample", "q_window_rank", "q_sql_scalar_subquery",
      "q_window_rank_global", "q_window_pct_global", "q_pack_sequences",
      "q_pack_bpe", "q_tfidf", "q_compact_store",
      "q_lm_buckets", "q_shuffle_train_order", "q_token_budget_epochs",
      "q_profile", "q_cms_union", "q_join_bloom", "q_bm25", "q_rrf_fusion",
      "q_vocab_coverage", "q_embed_pca",
      // q_pps_sample: forced-distributed running sum (offsets windows
      // over <= `partitions` per-bucket rows, the q_pack_sequences
      // contract) + the 1-row total-weight frame (the q_tfidf shape).
      "q_pps_sample",
      // q_drift_chi2: the 1-row corpus-total frame finalizes from
      // per-bin partial sums over the (vocab-scale) bin margin — the
      // q_tfidf shape; the corpus stream itself hash-partitions on
      // (source, bin).
      "q_drift_chi2",
      // q_lm_logprob: the 1-row vocabulary-size frame (the add-1
      // smoothing denominator) finalizes from per-partition partial
      // counts over the vocab-scale unigram frame, then broadcasts —
      // the q_tfidf shape; the token-scale LM join itself
      // hash-partitions on the gram key.
      "q_lm_logprob",
      // q_lm_backoff: the same shape as q_lm_logprob — the 1-row (T, V)
      // unigram-total/vocab-size frame (the add-1 floor denominator)
      // finalizes from per-partition partials over the vocab-scale
      // unigram aggregate, then broadcasts; the held-out gram stream
      // hash-partitions on the gram keys.
      "q_lm_backoff",
      // q_mix_temperature: the 1-row corpus-total and 1-row normalizer-Z
      // frames finalize from per-SOURCE partials (the frame entering the
      // serial exchange is already sources-sized — the corpus itself is
      // reduced by the per-source hash aggregate first), then broadcast —
      // the q_tfidf shape twice.
      "q_mix_temperature",
      // q_lsh_recall / q_simhash_recall: 1-row audits by definition —
      // their three counters finalize from per-partition partials over
      // PAIR-GRAPH-sized frames (the corpus reduces through the banded
      // generators first), the q_compact_store shape.
      "q_lsh_recall", "q_simhash_recall",
      // q_ivf_balance: a 1-row skew summary by definition — the frame
      // entering the serial exchange is the k-row (k=8) per-cell count
      // aggregate (the corpus reduces through the hash-partitioned
      // groupBy(cid) first), the q_compact_store shape.
      "q_ivf_balance",
      // q_skew_report: the same 1-row-summary shape over the join-key
      // frequency frame — the corpus reduces through groupBy(key)
      // first, so the serial finalize sees key-cardinality rows (and
      // the percentile buffers hold that frame, not the corpus).
      "q_skew_report",
      // q_ann_recall_curve: three 1-row per-nprobe aggregates over
      // |queries|·k recall-join frames (the corpus reduces through the
      // existing one-scan knn operators first), unioned into the 3-row
      // curve — the q_lsh_recall shape, three times.
      "q_ann_recall_curve",
      // q_pack_efficiency: the q_pack_sequences running-sum lineage plus
      // a 1-row utilization summary finalizing from per-partition
      // partials over the pack-id aggregate — the q_tfidf shape on top
      // of the already-allowed pack chain.
      "q_pack_efficiency",
      // q_dedup_threshold_sweep: the serial exchange is the 1-row canon
      // doc-count (matched_frac's denominator) finalizing from
      // per-partition count partials — the q_compact_store shape; the
      // per-threshold aggregates themselves hash-exchange on t.
      "q_dedup_threshold_sweep",
      // q_heavy_hitters: the serial exchange is the Misra–Gries summary
      // finalizing from per-partition sketch partials (each <= k = 2048
      // counters BY CONSTRUCTION — the bounded-shuffle design itself);
      // the exact verify groupBy hash-partitions on the <= k candidate
      // segments, never the raw keyspace.
      "q_heavy_hitters",
      // q_dedup_waterfall: the serial exchange is the 1-row share
      // denominator finalizing from the statuses-sized (<= 4 row)
      // rollup partials — the q_compact_store shape; the ledger and
      // containment chains hash-partition on their own keys.
      "q_dedup_waterfall")
    val offending = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      if (p.contains("Exchange SinglePartition") && !allow(n)) Some(n) else None
    }
    assert(offending.isEmpty,
      s"queries with an unexpected serial exchange: $offending")
  }

  test("LSH dedup queries scan the corpus exactly once (no self-join double-derivation)") {
    // The round-3 banded SELF-joins derived the whole canonicalize+signature
    // subplan twice (AQE broadcasts one side, so exchange reuse can never
    // fire): 2x corpus scans + 2x full-text shuffles + 2x signature cost at
    // scale. The bucket-collect form groups banded rows once — candidate
    // pairs explode within each bucket, so a single scan suffices.
    // Formatted-plan "Scan parquet" appears twice per physical scan (tree +
    // node detail), hence the == 2.
    for (q <- Seq("q_dedup_ngram_jaccard", "q_dedup_minhash", "q_dedup_simhash",
        "q_dedup_embedding_lsh")) {
      val p = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert("Scan parquet".r.findAllIn(p).size == 2,
        s"$q must scan its input exactly once:\n${p.take(1200)}")
    }
  }

  test("no per-document signature expression leaks into a Filter condition") {
    // Round-3 lesson, now guarded catalog-wide: join-inferred IsNotNull and
    // InferFiltersFromGenerate push the full signature expression (the
    // dominant per-doc cost) into per-raw-document Filter conditions, so
    // each document pays it 2-4x. The band generators + cheap gates keep
    // signatures out of every Condition; this asserts none regresses.
    // (vec_dot appears legitimately in ONE condition shape: the cosine
    // pair-threshold filter `round(vec_dot(x.v, y.v)/..) >= t`, which is
    // the operator's own per-candidate scoring — evaluated once per pair,
    // at the only point it can be. An `isnotnull(vec_dot(...))` would be
    // the pathological inferred form, so that exact shape is banned.)
    // word_scan is deliberately NOT banned: the quality gate's
    // `reason === "ok"` filter IS that operator's selection — word_scan in
    // its condition is the gate's own per-doc work (one Filter, CSE'd),
    // not an optimizer-inferred duplicate.
    // q_decontaminate_bloom's one allowed shape is the same kind of
    // exception: `UDF(shingle_hashes(text))` in its train-side Filter IS
    // the operator — the broadcast-Bloom membership prefilter, evaluated
    // once per document at the only point it can be. Any OTHER signature
    // leak in that query (a second Filter, an inferred isnotnull) still
    // fails.
    val sig = "minhash_sig|simhash_text|simhash64|shingle_hashes|minhash_bands|simhash_bands|shingle_posts|rolling_hash".r
    val ownWork: Map[String, String => Boolean] = Map(
      "q_decontaminate_bloom" -> (l => l.contains("UDF(shingle_hashes")))
    val offending = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      val p = fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val allowed = ownWork.getOrElse(n, (_: String) => false)
      val bad = p.linesIterator.filter(l => l.contains("Condition :") &&
        (sig.findFirstIn(l).isDefined || l.contains("isnotnull(vec_dot")) &&
        !allowed(l)).toSeq
      if (bad.nonEmpty) Some(n -> bad.head.take(160)) else None
    }
    assert(offending.isEmpty, s"signature expressions inside Filter conditions: $offending")
  }

  test("dedup canonicalization stays HashAggregate; trained-IVF scans stay bounded") {
    // round-4 audit regressions, locked in: (1) a var-length VALUE buffer
    // (min over a string) silently downgrades the corpus-scale
    // canonicalization to SortAggregate — all var-length columns belong in
    // the grouping key; (2) every lazy reference to the trained centroid
    // frame replays the whole Lloyd training unless it is materialized at
    // the fan-out point (was 8-11 corpus scans).
    // round 5: the guard went catalog-wide. q_prep_pipeline's min(lang)
    // was the last var-length aggregation buffer (now a fixed-width
    // order-isomorphic BIGINT pack) — with it gone, NO catalog query
    // sort-aggregates: every aggregation is HashAggregate or
    // ObjectHashAggregate (collect/percentile buffers), both hash-routed.
    // A SortAggregate means some aggregate's buffer stopped fitting the
    // fixed-width/object paths — at 100 TB that is a silent full sort.
    val sortAgg = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      if (fn(spark, dir).queryExecution.executedPlan.toString
          .contains("SortAggregate")) Some(n) else None
    }
    assert(sortAgg.isEmpty, s"queries fell out of hash aggregation: $sortAgg")
    for (q <- Seq("q_knn_ivf_trained", "q_knn_ivf_probed")) {
      val scans = "Scan parquet".r.findAllIn(plan(q)).size
      assert(scans <= 2, s"$q re-derives the training subplan: $scans scans")
    }
  }

  test("contamination benchmark side broadcasts, even 10x-duplicated (bench mode)") {
    // the eval-set side of the bipartite contamination join must stay the
    // broadcast side as it grows — benchMode's 10x-duplicated slice is the
    // load test; a SortMergeJoin here would mean the corpus side reshuffles
    // on the shingle key against a side that fits in memory
    System.setProperty("graft.bench.noSort", "true")
    try {
      val p = SparkEntry.queries("q_contamination")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"benchmark postings must broadcast:\n${p.take(900)}")
      assert(!p.contains("SortMergeJoin"), "contamination join fell to sort-merge")
    } finally System.clearProperty("graft.bench.noSort")
  }

  test("whole-stage codegen covers the custom fingerprint expressions") {
    // AQE reports 0 codegen subtrees before execution — inspect the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q_fingerprint")(spark, dir)
      val code = df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
      assert(code.contains("WholeStageCodegen"), "fingerprint fell out of codegen")
      assert(code.contains("1000003L"), "rolling-hash doGenCode not inlined")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
