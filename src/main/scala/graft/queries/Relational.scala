package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2c).
  *
  * Each entry is a declared operator: a Spark DataFrame query plus (in
  * [[oracles]]) an equivalent SQL text the driver runs in DuckDB on the same
  * parquet tables. Conventions that make hash-comparison deterministic:
  *
  *   - every query ends with a total order over all output columns
  *     (`ORDER BY ALL NULLS FIRST` on the oracle side);
  *   - floating-point aggregates route through DECIMAL(18,4) so the sum is
  *     exact and engine-order-independent, then cast back to DOUBLE;
  *   - window orderings always include a unique tiebreaker key;
  *   - functions whose result type differs between engines (length, floor,
  *     year, ...) are cast to a common type on both sides.
  *
  * Scale notes (100 TB design intent, cf. SURVEY.md §4.2): all queries are
  * pure DataFrame plans — Catalyst pushes filters/projections into the
  * parquet scan, aggregations are partial (map-side) + final, and small
  * dimension tables (region/nation/customer at typical SF) are explicitly
  * `broadcast()` so the big fact side never shuffles for those joins.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  import graft.Tables.{t, ord, dsum, stagingDir, stageOnce}

  val all: Map[String, Q] = Map(
    // ---- scans / projection / filter (D1, D8; pushdown-compatible) ----
    "q_scan_project" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
    }),
    "q_filter_date" -> ((s, dir) => {
      ord(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp") &&
          col("o_orderstatus") === "O")
        .select("o_orderkey", "o_custkey", "o_totalprice"))
    }),

    // ---- aggregation ----
    "q1_agg" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")))
    }),
    "q_agg_minmax" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n")))
    }),
    "q_agg_rollup" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty")))
    }),
    "q_agg_cube" -> ((s, dir) => {
      ord(t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price")))
    }),
    "q_agg_groupingsets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      ord(s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin))
    }),
    "q_agg_collect" -> ((s, dir) => {
      ord(t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          array_join(sort_array(collect_list(col("source"))), ",").as("sources"),
          array_join(sort_array(collect_set(col("source"))), ",").as("distinct_sources"),
          count(lit(1)).as("n")))
    }),
    // Skew-safe exact distinct: two-phase aggregation (dedupe on the
    // composite key first, then count) — the shuffle key space is
    // (group, value), so one hot group spreads over the cluster instead of
    // landing on one reducer. Same result as COUNT(DISTINCT ...), different
    // scaling on skewed keys; 5 event types over 10k events is exactly that
    // shape at 100 TB.
    "q_agg_distinct_twophase" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users")))
    }),
    // HLL sketch, oracle-checked via its error bound: the estimate (rsd
    // 0.02) must land within 5% (2.5 sigma) of the exact distinct count;
    // the DuckDB side recomputes the exact count and asserts `true`.
    "q_agg_approx_distinct" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx") - col("exact_parts")) <=
            col("exact_parts") * lit(0.05)).as("within_5pct")))
    }),

    // re-aggregatable sketches: daily HLL user sketches UNIONED into a
    // weekly distinct estimate — the pattern that replaces count-distinct
    // re-scans at 100 TB (store tiny sketches per grain, merge across any
    // rollup without touching raw data). Oracle contract mirrors
    // q_agg_approx_distinct: the merged estimate must land within 5% of
    // the exact weekly distinct (lgConfigK=12 → rsd ≈ 1.6%, ~3σ), and the
    // DuckDB side recomputes the exact count and asserts `true`.
    "q_hll_union" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev
        .groupBy(weekofyear(col("ts")).as("wk"), to_date(col("ts")).as("day"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val exact = ev.groupBy(weekofyear(col("ts")).as("wk"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      ord(daily.groupBy("wk")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        .join(exact, Seq("wk"))
        .select(col("wk"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <= col("exact_users") * 0.05)
            .as("within_5pct")))
    }),

    // count-min heavy hitters with re-aggregatable union — the frequency
    // twin of q_hll_union: one sketch per day (Spark's built-in
    // count_min_sketch aggregate), CmsSketch.cms_union folds the daily
    // sketches into the week, and the top-20 exact heavy hitters probe
    // the merged sketch. CMS guarantees est >= exact unconditionally and
    // est <= exact + eps*N with probability 1-delta PER PROBE; 20
    // probed keys make a single-tail miss plausible on another dataset,
    // so the asserted bound is the looser 2*eps*N (a valid sketch
    // essentially never misses it; a broken union still trips it by
    // orders of magnitude). Both asserted per key (the same bound-check
    // oracle contract as q_hll_union). At 100 TB the rollup reads
    // |days| 8-KB sketches, not rows.
    "q_cms_union" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev.groupBy(to_date(col("ts")).as("day"))
        .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      val merged = daily.agg(
        graft.functions.CmsSketch.cms_union(col("sk")).as("sk"))
      val tot = ev.agg(count(lit(1)).as("n_total"))
      val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("user_id")).limit(20)
      val est = graft.functions.CmsSketch
        .cms_estimate_long(col("sk"), col("user_id"))
      ord(top.crossJoin(merged).crossJoin(tot)
        .withColumn("est", est)
        .select(col("user_id"), col("exact_cnt"),
          (col("est") >= col("exact_cnt")).as("never_under"),
          (col("est") <= col("exact_cnt") +
            ceil(col("n_total") * lit(0.002)).cast("long")).as("within_bound")))
    }),

    // RE-AGGREGATABLE HISTOGRAM QUANTILES — the third mergeable sketch
    // (after HLL distincts and CMS heavy hitters): fixed 32-bin integer
    // histograms of document length per source, UNIONED by plain vector
    // addition into the corpus row ('__all__' — the same daily→weekly
    // rollup shape), p50/p90 estimated by linear interpolation inside
    // the covering bin. Counts are exact integers and the interpolation
    // is one rounded division, so the estimates are bit-identical
    // cross-engine (no approx_percentile non-determinism). Plan: ONE
    // map-side-combined groupBy(source, bin) touches the corpus;
    // everything after runs at ≤32-bins-per-group scale (windows
    // partition by source — at 100 TB the rollup reads 32-int
    // histograms, not rows).
    "q_hist_quantiles" -> ((s, dir) => {
      import s.implicits._
      val bins = t(s, dir, "documents")
        .select(col("source"),
          least(expr("n_chars div 32"), lit(31L)).cast("int").as("bin"))
        .groupBy("source", "bin").agg(count(lit(1)).as("cnt"))
      val all = bins.groupBy("bin").agg(sum(col("cnt")).as("cnt"))
        .select(lit("__all__").as("source"), col("bin"), col("cnt"))
      val h = bins.select(col("source"), col("bin"), col("cnt")).unionAll(all)
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("bin")
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("source")
      val cum = h.withColumn("cum", sum(col("cnt")).over(wOrd))
        .withColumn("n_docs", sum(col("cnt")).over(wAll))
      val qs = Seq(50, 90).toDF("q_pct")
      val hit = cum.crossJoin(broadcast(qs))
        .withColumn("t", expr("(q_pct * n_docs + 99) div 100"))
        .filter(col("cum") >= col("t"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy("source", "q_pct").orderBy("bin")
      ord(hit.withColumn("rn", row_number().over(wq)).filter(col("rn") === 1)
        .select(col("source"), col("q_pct"), col("n_docs"),
          round((col("bin") * lit(32)).cast("double") +
            lit(32.0) * (col("t") - col("cum") + col("cnt")).cast("double") /
              col("cnt"), 6).as("q_est")))
    }),

    // INCREMENTAL AGGREGATE MAINTENANCE (delta refresh): yesterday's
    // per-source stats plus today's batch merge into the updated stats
    // WITHOUT rescanning the base — the materialized-view maintenance
    // pattern that turns a 100 TB nightly recompute into a delta-sized
    // one. The engine computes base partials and delta partials
    // separately (two pruned scans here, standing for "stored partials +
    // new data") and merges them with the aggregates' own merge
    // functions (sum of counts/sums, min of mins, max of maxes); the
    // ORACLE aggregates the full table directly, so a pass proves the
    // merge is lossless — the invariant that makes incremental refresh
    // safe to trust.
    "q_incr_agg" -> ((s, dir) => {
      def partial(df: DataFrame) = df.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      val docs = t(s, dir, "documents")
      val base = partial(docs.filter(expr("doc_id % 10 != 0")))
      val delta = partial(docs.filter(expr("doc_id % 10 = 0")))
      ord(base.unionAll(delta).groupBy("source")
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_chars")).as("sum_chars"),
          min(col("min_chars")).as("min_chars"), max(col("max_chars")).as("max_chars")))
    }),

    // DISTRIBUTION DRIFT DETECTION: chi-square homogeneity test of each
    // source's length histogram against the corpus marginal — the
    // monitoring gate that catches a feed whose documents silently
    // changed shape before it pollutes a training mix. Zero cells
    // matter (a source missing a populated bin IS evidence), so the
    // dense (source × bin) grid materializes by crossing the two
    // VOCAB-scale margin frames and left-joining the observed counts —
    // the corpus is touched once by the same groupBy(source, bin) as
    // q_hist_quantiles. Per-term doubles use one fixed expression tree
    // and round to 9 before the DECIMAL sum, so the statistic is
    // bit-identical cross-engine; the flag is the 95% chi-square cut at
    // 31 dof.
    "q_drift_chi2" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(col("source"),
          least(expr("n_chars div 32"), lit(31L)).cast("int").as("bin"))
        .groupBy("source", "bin").agg(count(lit(1)).as("cnt"))
      val bt = g.groupBy("bin").agg(sum(col("cnt")).as("bin_tot"))
      val ns = g.groupBy("source").agg(sum(col("cnt")).as("n_src"))
      val tot = bt.agg(sum(col("bin_tot")).as("n_total"))
      val dense = ns.crossJoin(bt).crossJoin(broadcast(tot))
        .join(g, Seq("source", "bin"), "left")
        .withColumn("obs", coalesce(col("cnt"), lit(0L)))
        .withColumn("exp",
          col("n_src").cast("double") * col("bin_tot") / col("n_total"))
        .withColumn("term",
          round((col("obs") - col("exp")) * (col("obs") - col("exp")) /
            col("exp"), 9))
      ord(dense.groupBy("source")
        .agg(max(col("n_src")).as("n_src"),
          round(sum(col("term").cast("decimal(28,9)")).cast("double"), 6)
            .as("chi2"))
        .withColumn("drift", col("chi2") > 44.985))
    }),

    // pivot: long-to-wide over a low-cardinality column (explicit value
    // list, so the plan is a single pass — no distinct-values pre-query)
    "q_pivot" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity"))))
    }),
    // unpivot/melt: wide-to-long (the inverse shape; variable/value form)
    "q_unpivot" -> ((s, dir) => {
      ord(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey").cast("double").as("c_nationkey"))
        .unpivot(Array(col("c_custkey")), Array(col("c_acctbal"), col("c_nationkey")),
          "metric", "value"))
    }),
    // exact interpolated percentiles (both engines: linear interpolation)
    "q_percentile" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("price_p90")))
    }),

    // sketch percentile, oracle-checked via its error bound: GK-sketch
    // median must land within 2% of the exact interpolated median (the
    // sketch returns an actual data value, the exact form interpolates,
    // so exact equality is not the contract — the bound is)
    "q_approx_percentile" -> ((s, dir) => {
      ord(t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
          expr("percentile(l_extendedprice, 0.5)").as("exact"))
        .select(col("l_returnflag"),
          round(col("exact"), 6).as("exact_median"),
          (abs(col("approx") - col("exact")) <= col("exact") * 0.02).as("within_2pct")))
    }),

    // ---- joins ----
    "q_join_inner" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      ord(li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("o_totalprice") > 400000)
        .select("l_orderkey", "l_linenumber", "o_orderdate", "l_quantity", "o_totalprice"))
    }),
    // SMALL-FILES COMPACTION of the record store (§2c sinks / archive
    // maintenance): long-lived archives accumulate one file per
    // micro-batch/upsert until read cost is file-open overhead, not
    // bytes. Staged once per session: the documents corpus ingested as
    // content-addressed Records deliberately shattered into 64 shards,
    // then `Sources.compactRecords` (crash-safe swapInPlace rewrite)
    // compacts to ONE file. The output counts distinct
    // input_file_name()s, so the artifact of compaction itself — the
    // file count — is part of the oracle-checked value, alongside the
    // record count and length stats the oracle recomputes from the
    // original table (distinct non-empty texts, matching ingest dedup).
    "q_compact_store" -> ((s, dir) => {
      val base = stagingDir(s, dir, "documents", "graft_compact")
      val done = new java.io.File(base + ".done")
      stageOnce(base)(done.isFile) {
        graft.sources.Sources.writeRecords(
          graft.sources.Sources.fromTextColumn(
            t(s, dir, "documents"), "text").repartition(64), base)
        graft.sources.Sources.compactRecords(s, base, targetBytes = 1L << 40)
        done.createNewFile()
      }
      ord(graft.sources.Sources.readRecords(s, base).toDF()
        // input_file_name is non-deterministic to the analyzer: project
        // it to a column before it enters the aggregate
        .select(col("rawText"), input_file_name().as("f"))
        .agg(count(lit(1)).as("n_records"),
          sum(length(col("rawText"))).as("sum_chars"),
          min(length(col("rawText"))).cast("int").as("min_len"),
          max(length(col("rawText"))).cast("int").as("max_len"),
          count_distinct(col("f")).as("n_files")))
    }),
    // CSV interchange round-trip (the flat-data exchange format): the
    // same staging pattern, read back SCHEMA-FIRST (explicit DDL +
    // FAILFAST — header inference at 100 TB means a full extra pass and
    // silently-wrong types; a malformed shard must fail loudly, not
    // row-drop). Flat numeric/date columns only — CSV with embedded
    // newlines forces multiLine=true, which makes shards unsplittable;
    // free-text interchange belongs to JSONL (q_jsonl_ingest).
    "q_csv_roundtrip" -> ((s, dir) => {
      val base = stagingDir(s, dir, "orders", "graft_csv")
      stageOnce(base)(new java.io.File(base, "_SUCCESS").isFile) {
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
          .write.mode("overwrite").option("header", "true").csv(base)
      }
      ord(s.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, o_orderdate DATE"))
        .option("header", "true").option("mode", "FAILFAST")
        .csv(base)
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          count_distinct(col("o_custkey")).as("n_custs")))
    }),
    // ORC interchange round-trip (§2c sources/sinks beyond parquet):
    // orders staged once per session as ORC (Spark's second bundled
    // columnar format — same pushdown/pruning machinery), read back
    // with a predicate that must reach the ORC reader, and aggregated;
    // the oracle recomputes from the ORIGINAL parquet, so any value or
    // type drift through the ORC writer/reader pair diverges.
    "q_orc_roundtrip" -> ((s, dir) => {
      val base = stagingDir(s, dir, "orders", "graft_orc")
      stageOnce(base)(new java.io.File(base, "_SUCCESS").isFile) {
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
          .write.mode("overwrite").orc(base)
      }
      ord(s.read.orc(base)
        .filter(col("o_totalprice") > 200000)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderdate")).as("first_date")))
    }),
    // Z-ORDER LAYOUT (the Delta/Iceberg OPTIMIZE ZORDER BY shape):
    // lineitem staged once per session range-partitioned + sorted by
    // the codegen'd Morton key over (l_partkey, l_suppkey) buckets, so
    // BOTH dimensions cluster locally and parquet row-group min/max
    // stats can prune a 2-D box predicate — a single-column sort only
    // prunes its leading column. The layout is semantically invisible:
    // the oracle runs the same box query over the ORIGINAL table, so
    // any row lost/duplicated by the re-layout diverges. Both box
    // predicates reach the staged scan as PushedFilters (asserted in
    // PlanCheckSpec). ZOrderSpec quantifies the locality win on a grid.
    "q_zorder_layout" -> ((s, dir) => {
      val base = stagingDir(s, dir, "lineitem", "graft_zorder")
      stageOnce(base)(new java.io.File(base, "_SUCCESS").isFile) {
        val zk = graft.functions.ZOrderKey.zorder_key(
          expr("l_partkey div 16"), expr("l_suppkey div 4"))
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity")
          .withColumn("zk", zk)
          .repartitionByRange(8, col("zk"))
          .sortWithinPartitions("zk")
          .drop("zk")
          .write.mode("overwrite").parquet(base)
      }
      ord(s.read.parquet(base)
        .filter(col("l_partkey").between(50, 150) &&
          col("l_suppkey").between(2, 15))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity"))
    }),

    // PARTITIONED write sink + partition-PRUNED read-back (§2c sinks):
    // documents staged once per session under lang=<v> directories
    // (`partitionBy("lang")`), then read back with a lang filter that
    // must prune to the matching directories at planning time — the scan
    // carries a PartitionFilters entry and reads none of the other
    // languages' files (asserted in PlanCheckSpec). At 100 TB this is
    // the difference between scanning one language and scanning the
    // corpus. The oracle recomputes from the ORIGINAL table, so any row
    // lost, duplicated, or mis-partitioned by the write path diverges.
    "q_partitioned_write" -> ((s, dir) => {
      val base = stagingDir(s, dir, "documents", "graft_partitioned")
      stageOnce(base)(new java.io.File(base, "_SUCCESS").isFile) {
        t(s, dir, "documents").select("doc_id", "n_chars", "source", "lang")
          .write.mode("overwrite").partitionBy("lang").parquet(base)
      }
      ord(s.read.parquet(base)
        .filter(col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars")))
    }),
    // DYNAMIC PARTITION PRUNING (the partition-level complement to
    // q_join_bloom's row-level runtime filter): the fact side is the
    // lang-partitioned store (same staging as q_partitioned_write) and
    // the dimension side's lang set is derived AT RUNTIME (languages
    // with >= 75 docs — not constant-foldable), so Catalyst inserts a
    // dynamicpruning subquery into the scan's PartitionFilters and the
    // fact scan reads only the surviving languages' directories. At
    // 100 TB this is the difference between scanning the partitions the
    // dimension selects and scanning the store. Plan-asserted in
    // PlanCheckSpec; oracle recomputes from the original table.
    "q_join_dpp" -> ((s, dir) => {
      // shares q_partitioned_write's staging — stageOnce's per-path lock
      // is what lets two parallel Verify workers land on it safely
      val base = stagingDir(s, dir, "documents", "graft_partitioned")
      stageOnce(base)(new java.io.File(base, "_SUCCESS").isFile) {
        t(s, dir, "documents").select("doc_id", "n_chars", "source", "lang")
          .write.mode("overwrite").partitionBy("lang").parquet(base)
      }
      val dim = t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n_lang")).filter(col("n_lang") >= 75)
      ord(s.read.parquet(base).join(dim, Seq("lang"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          max(col("n_lang")).as("n_lang")))
    }),
    // CO-LOCATED (bucketed) fact-fact join — the §4.2 pay-the-shuffle-
    // once-at-ingest strategy in the checked catalog: lineitem and
    // orders staged ONCE per session as 8-bucket tables hash-partitioned
    // on their join keys (Bucketing.writeBucketed, per-bucket sorted),
    // then joined with NO exchange on either side — the only shuffle in
    // the plan is the final aggregate's (asserted in PlanCheckSpec). At
    // 100 TB this turns every repeated orderkey join from two corpus
    // shuffles into zero. The oracle recomputes from the ORIGINAL
    // tables, so any row lost or duplicated by the bucketed write path
    // diverges.
    "q_join_bucketed" -> ((s, dir) => {
      val base = stagingDir(s, dir, "lineitem", "graft_bucketed")
      val fp = base.substring(base.lastIndexOf('_') + 1)
      val liT = s"li_bkt_$fp"; val oT = s"o_bkt_$fp"
      stageOnce(base)(s.catalog.tableExists(liT) && s.catalog.tableExists(oT)) {
        graft.sources.Bucketing.writeBucketed(
          t(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
          liT, s"$base/li", 8, Seq("l_orderkey"))
        graft.sources.Bucketing.writeBucketed(
          t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          oT, s"$base/o", 8, Seq("o_orderkey"))
      }
      ord(s.table(liT)
        .join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty")))
    }),
    // RUNTIME BLOOM-FILTER pruned join (§4.2): Catalyst's
    // InjectRuntimeFilter builds a bloom filter from the SELECTIVE
    // dimension side (urgent orders) and pushes might_contain onto the
    // fact scan, so fact rows that cannot join are dropped BEFORE the
    // join's shuffle — at 100 TB that is the difference between
    // shuffling the whole lineitem table and shuffling the ~20% that
    // can match. Local test scale sits below the rule's production
    // thresholds (application side > 10 GB), so the query pins the
    // confs that force the same plan shape a large cluster would choose
    // — on a CHILD SparkSession, so nothing leaks into the shared
    // session (the returned frame plans lazily under the child's conf).
    // Broadcast is disabled the same way: at real scale the filtered
    // dimension overflows the broadcast threshold, and the bloom rule
    // only serves shuffle joins. Result is row-identical to the plain
    // join by construction — exactly what the oracle recomputes.
    // Plan shape (bloom_filter_agg + BloomFilterMightContain on the
    // fact scan) is asserted in PlanCheckSpec.
    "q_join_bloom" -> ((s, dir) => {
      val bs = s.newSession()
      bs.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      bs.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      bs.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      bs.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val o = t(bs, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val l = t(bs, dir, "lineitem").select("l_orderkey", "l_quantity")
      ord(l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty")))
    }),
    // SALTED skew join in the checked catalog (§4.2): the hot-key
    // mitigation — big side salted 8 ways, small side replicated per
    // salt, join key becomes (key, salt) — with the result row-identical
    // to the plain join BY CONSTRUCTION, which is exactly what the
    // oracle (the plain join, recomputed) verifies. Salting is the
    // explicit form that also covers hash joins and aggregations where
    // AQE's adaptive skew handling does not reach.
    "q_join_skew_salted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      ord(graft.functions.Skew.saltedJoin(li, sup, "l_suppkey", salts = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty")))
    }),
    // SALTED two-phase aggregation: a hot group key spreads over (key,
    // salt) partials before the tiny per-key combine. The value routes
    // through DECIMAL so both phases are exact and order-free — the
    // determinism contract the double-typed column cannot give across a
    // two-phase sum.
    "q_agg_skew_salted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity").cast("decimal(18,4)").as("q"))
      ord(graft.functions.Skew.saltedSumByKey(li, "l_suppkey", "q", salts = 8)
        .select(col("l_suppkey"), col("sum_q").cast("double").as("sum_qty")))
    }),
    "q_join_broadcast" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      ord(c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("c_custkey", "n_name", "r_name"))
    }),
    "q_join_left" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      ord(o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_quantity") > 45, "left")
        .select("o_orderkey", "l_linenumber", "l_quantity"))
    }),
    "q_join_right" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      ord(li.join(o, o("o_orderkey") === li("l_orderkey") && li("l_quantity") > 45, "right")
        .select("o_orderkey", "l_linenumber", "l_quantity"))
    }),
    "q_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      ord(c.join(o, c("c_custkey") === o("o_custkey") && o("o_totalprice") > 450000, "full")
        .select("c_custkey", "o_orderkey", "o_totalprice"))
    }),
    "q_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      ord(c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"))
    }),
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      ord(c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"))
    }),
    "q_join_cross" -> ((s, dir) => {
      ord(t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select("r_name", "n_name"))
    }),
    "q_join_theta" -> ((s, dir) => {
      val sp = t(s, dir, "supplier"); val c = t(s, dir, "customer")
      ord(sp.join(c, sp("s_nationkey") === c("c_nationkey") && c("c_acctbal") > sp("s_acctbal"))
        .groupBy("s_suppkey").agg(count(lit(1)).as("n_richer")))
    }),
    // Range (BETWEEN) join: 5 balance bands derived from region keys,
    // matched to customers by interval containment. No equi key -> Spark
    // picks BroadcastNestedLoopJoin with the tiny band table as build side,
    // which is exactly right: the fact side streams once, never shuffles.
    "q_join_range" -> ((s, dir) => {
      val bands = broadcast(t(s, dir, "region").select(
        col("r_regionkey").as("band"),
        (col("r_regionkey") * 2000.0).as("lo"),
        ((col("r_regionkey") + 1) * 2000.0).as("hi")))
      val c = t(s, dir, "customer")
      ord(c.join(bands, c("c_acctbal") >= bands("lo") && c("c_acctbal") < bands("hi"))
        .select("c_custkey", "band", "c_acctbal"))
    }),
    // As-of join: for each purchase, timestamp of the latest error by the
    // same user at-or-before it. One shuffle on user_id; O(n) window scan —
    // the scalable formulation (vs. a quadratic correlated subquery).
    "q_join_asof" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ord(e.withColumn("last_error_ts",
          last(when(col("event_type") === "error", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "last_error_ts"))
    }),

    // As-of join with TOLERANCE (pandas merge_asof(tolerance=...) / kdb
    // wj semantics): the matched error must also lie within 1 hour
    // before the purchase, else null. Same one-shuffle window
    // formulation as q_join_asof — the tolerance is a post-filter on
    // the matched timestamp (the latest error older than the bound
    // implies ALL errors are), so the scalable shape is unchanged.
    "q_join_asof_tol" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ord(e.withColumn("raw_ts",
          last(when(col("event_type") === "error", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("last_error_ts",
          when(col("raw_ts") >= col("ts") - expr("INTERVAL 1 HOUR"), col("raw_ts")))
        .select("event_id", "user_id", "ts", "last_error_ts"))
    }),
    // As-of join, NEAREST direction (pandas merge_asof(direction=
    // 'nearest') — the sensor-alignment form): each purchase matches the
    // error closest in time on EITHER side, ties to the earlier one.
    // Same one-shuffle interleaved-window shape as q_join_asof run both
    // ways (running last(ignoreNulls) ascending = nearest before,
    // descending = nearest after), then an exact integer µs comparison
    // picks the side — no second scan, no self-join; the oracle checks
    // it with independent correlated min/max subqueries.
    "q_join_asof_nearest" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val errTs = when(col("event_type") === "error", col("ts"))
      val wA = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wD = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ord(e
        .withColumn("prev_err", last(errTs, ignoreNulls = true).over(wA))
        .withColumn("next_err", last(errTs, ignoreNulls = true).over(wD))
        .filter(col("event_type") === "purchase")
        .withColumn("nearest_error_ts",
          when(col("prev_err").isNull, col("next_err"))
            .when(col("next_err").isNull, col("prev_err"))
            .when(unix_micros(col("ts")) - unix_micros(col("prev_err")) <=
              unix_micros(col("next_err")) - unix_micros(col("ts")),
              col("prev_err"))
            .otherwise(col("next_err")))
        .select("event_id", "user_id", "ts", "nearest_error_ts"))
    }),
    // INTERVAL-OVERLAP join (genomics/temporal overlap shape): all
    // (purchase-window, error-window) interval pairs that intersect,
    // across users — a genuine non-equi interval join. The naive form is
    // an O(|A|·|B|) nested loop; here each interval explodes to its
    // covered HOUR BUCKETS and the join runs as an equi join on the
    // bucket key + exact overlap predicate + distinct (any intersection
    // point lies in an hour bucket both intervals cover, so candidates
    // are complete). A pair sharing several buckets is emitted ONLY in
    // the bucket holding the overlap start — exact first-bucket dedup
    // as a map-side filter, so there is NO distinct shuffle over the
    // (quadratic-in-density) output. At 100 TB the only corpus shuffle
    // is on the 8-byte hour key — per-bucket products, never the full
    // cross product. Overlap length in exact integer microseconds.
    // (10×-events probe, where the denser span genuinely implies ~100×
    // output: the distinct() formulation paid 116 s re-shuffling ~150M
    // result rows; first-bucket emission runs the same probe in 14.1 s
    // — and sf0.1 drops 2.36 s → 0.81 s.)
    "q_join_interval" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("a_id"), col("ts").as("a_s"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("a_e"))
      val b = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("b_id"), col("ts").as("b_s"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("b_e"))
      def buckets(df: DataFrame, sc: String, ec: String): DataFrame =
        df.withColumn("h", explode(sequence(
          date_trunc("hour", col(sc)), date_trunc("hour", col(ec)),
          expr("INTERVAL 1 HOUR"))))
      ord(buckets(a, "a_s", "a_e").join(buckets(b, "b_s", "b_e"), Seq("h"))
        .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
          col("h") === date_trunc("hour", greatest(col("a_s"), col("b_s"))))
        .select(col("a_id"), col("b_id"),
          (unix_micros(least(col("a_e"), col("b_e"))) -
            unix_micros(greatest(col("a_s"), col("b_s")))).as("overlap_us")))
    }),

    // ---- window functions ----
    "q_window_rank" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val wUnique = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wTies = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
      val ranked = o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(wUnique).as("rn"),
        rank().over(wTies).as("rk"),
        dense_rank().over(wTies).as("drk"))
      // global quartile WITHOUT Window.orderBy's single-task exchange:
      // range-partitioned distributed row_number + the ntile bucket rule
      // (graft.operators.ScalableWindows) — same numbers, parallel plan
      ord(graft.operators.ScalableWindows.withGlobalNtile(
          ranked, 4, Seq(col("o_totalprice"), col("o_orderkey")), "quartile")
        .select("o_custkey", "o_orderkey", "rn", "rk", "drk", "quartile"))
    }),
    // global (UNPARTITIONED) rank + dense_rank without the single-task
    // exchange: quantile-bucketed per-bucket rank + broadcast offsets
    // (ScalableWindows.withGlobalRank/DenseRank). Ties cannot span bucket
    // boundaries (equal first keys share a bucket), so offsets of row /
    // distinct-tuple counts are exact. l_quantity has ~50 distinct values
    // over 60k rows — the heavy-ties case; `partitions` forces the
    // distributed path at test SF.
    "q_window_rank_global" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      ord(graft.operators.ScalableWindows.withGlobalRankAndDenseRank(
          li, Seq(col("l_quantity")), "rk", "drk", partitions = 8)
        .select("l_orderkey", "l_linenumber", "l_quantity", "rk", "drk"))
    }),
    // global percent_rank/cume_dist without the single-task exchange:
    // same quantile-bucket scheme — both reduce to integer counts
    // (rank, rows<=current, total) that distribute exactly
    "q_window_pct_global" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      ord(graft.operators.ScalableWindows.withGlobalPercentRankAndCumeDist(
          li, Seq(col("l_quantity")), "pr", "cd", partitions = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("pr"), 6).as("pct_rank"), round(col("cd"), 6).as("cdist")))
    }),
    "q_window_lag_lead" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ord(e.select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("first_value"),
        // whole-partition frame, NOT [current, unboundedFollowing): the
        // value of `last(...)` is the partition's final row either way
        // (the frame's upper bound is unbounded in both forms), but Spark
        // evaluates a frame whose LOWER bound moves with the current row
        // by re-scanning the partition remainder PER ROW — O(n²) per
        // partition, the q_interp_linear trap — while the fixed
        // [unboundedPreceding, unboundedFollowing] frame is computed once
        // per partition (UnboundedWindowFunctionFrame). Same window sort,
        // hash-identical output, linear cost at 100 TB partition sizes.
        last(col("value")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("last_value")))
    }),
    "q_window_running" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      // Decimal accumulation: window-sum association order differs between
      // engines, so double-sum is not bit-reproducible; decimal is exact.
      ord(o.select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").as("running_total"),
        count(lit(1)).over(w).as("running_n")))
    }),
    "q_window_range" -> ((s, dir) => {
      // Double-valued RANGE frame: DataFrame API only takes Long bounds, so
      // express the frame in SQL (still one Catalyst Window node).
      ord(t(s, dir, "orders").selectExpr(
        "o_custkey", "o_orderkey",
        """count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
          |RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000""".stripMargin))
    }),
    // time-INTERVAL range frame: trailing-hour moving aggregate per user
    // — the time-series smoothing shape (RANGE frames over timestamps
    // include ts-peers, so duplicate timestamps cannot make the result
    // order-dependent).
    "q_window_time_range" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events_tr")
      ord(s.sql(
        """SELECT user_id, event_id,
          |  count(*) OVER w AS n_last_hour,
          |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_last_hour
          |FROM events_tr
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin))
    }),
    "q_topk_pergroup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))
    }),

    "q_window_pct" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      ord(t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist")))
    }),
    "q_agg_stats" -> ((s, dir) => {
      ord(t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        count(lit(1)).as("n")))
    }),
    "q_bit_funcs" -> ((s, dir) => {
      ord(t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bxor"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("bor"),
        shiftleft(col("l_linenumber"), 2).as("shl"),
        shiftright(col("l_orderkey"), 1).as("shr")))
    }),
    "q_date_more" -> ((s, dir) => {
      ord(t(s, dir, "orders").select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        last_day(col("o_orderdate")).as("eom"),
        add_months(col("o_orderdate"), 1).as("next_month")))
    }),

    // ---- sort / limit ----
    "q_sort_limit" -> ((s, dir) => {
      ord(t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice"))
    }),

    // ---- set operations ----
    "q_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nk"), col("c_acctbal").as("bal"))
      val sp = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("nk"), col("s_acctbal").as("bal"))
      ord(c.union(sp))
    }),
    "q_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ord(c.union(sp).distinct())
    }),
    "q_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9990).select(col("c_nationkey").as("nk"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ord(c.intersect(sp))
    }),
    "q_except" -> ((s, dir) => {
      val n = t(s, dir, "nation").select(col("n_nationkey").as("nk"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ord(n.except(sp))
    }),
    "q_dropdup" -> ((s, dir) => {
      ord(t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").dropDuplicates())
    }),
    // PRE-FLIGHT SKEW REPORT — the diagnostic a 100 TB job runs on a
    // join/aggregation key BEFORE choosing a strategy (broadcast? salt?
    // how many salts? AQE skew thresholds?): per-key frequency
    // distribution collapsed to one row of shape facts — key count, row
    // count, min/max key population, p50/p99, and the integer skew
    // factor max·keys/rows (=1 for uniform) with the salt suggestion
    // Skew.saltedJoin would consume. The corpus reduces through the
    // hash-partitioned groupBy(key) first; the serial finalize sees a
    // key-cardinality frame only.
    "q_skew_report" -> ((s, dir) => {
      val freq = t(s, dir, "events")
        .groupBy(col("user_id").as("key")).agg(count(lit(1)).as("n"))
      ord(freq.agg(
          count(lit(1)).as("n_keys"),
          sum(col("n")).as("n_rows"),
          min(col("n")).as("min_key_rows"),
          max(col("n")).as("max_key_rows"),
          round(expr("percentile(n, 0.5)"), 6).as("p50"),
          round(expr("percentile(n, 0.99)"), 6).as("p99"))
        .withColumn("skew_factor",
          expr("(max_key_rows * n_keys) div n_rows"))
        .withColumn("suggested_salts",
          expr("least(32L, greatest(1L, (max_key_rows * n_keys) div n_rows))")))
    }),
    // BAG-semantics set ops (EXCEPT ALL / INTERSECT ALL): multiplicities
    // survive — with a (user, type) row appearing 5× in one half and 3×
    // in the other, INTERSECT ALL keeps 3 instances and EXCEPT ALL keeps
    // 2, which is the instance-accounting dedup ledgers need and the
    // DISTINCT forms (q_intersect/q_except) erase. Both compile to one
    // hash aggregate per side + count-replicating generate — one shuffle
    // each on the row key, no joins.
    "q_set_ops_all" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"))
      val a = e.filter(col("event_id") % 2 === 0).select("user_id", "event_type")
      val b = e.filter(col("event_id") % 2 === 1).select("user_id", "event_type")
      ord(a.exceptAll(b).withColumn("tag", lit("except_all"))
        .unionByName(a.intersectAll(b).withColumn("tag", lit("intersect_all"))))
    }),

    // ---- scalar functions: string ----
    "q_str_funcs" -> ((s, dir) => {
      ord(t(s, dir, "customer").select(
        col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cn"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 10, 9).as("cnum_str"),
        length(col("c_name")).as("name_len"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        format_string("%s|%d", col("c_mktsegment"), col("c_custkey")).as("fmt")))
    }),
    "q_regexp" -> ((s, dir) => {
      ord(t(s, dir, "customer").select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("bigint").as("cnum"),
        regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("repl")))
    }),
    "q_levenshtein" -> ((s, dir) => {
      ord(t(s, dir, "part").select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("dist")))
    }),
    "q_hash_md5" -> ((s, dir) => {
      ord(t(s, dir, "documents").select(col("doc_id"), md5(col("text")).as("h")))
    }),

    // ---- scalar functions: date/time ----
    "q_date_funcs" -> ((s, dir) => {
      ord(t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("mon"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_ago"),
        date_add(col("o_orderdate"), 30).as("due"),
        unix_timestamp(col("o_orderdate")).as("epoch_s")))
    }),

    // ---- scalar functions: math ----
    "q_math_funcs" -> ((s, dir) => {
      ord(t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("r1"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        (col("l_quantity") * col("l_quantity")).as("sq"),
        round(log(col("l_extendedprice")), 6).as("ln6"),
        pmod(col("l_orderkey"), lit(7)).as("pm")))
    }),

    // ---- scalar functions: conditional / null ----
    "q_cond_funcs" -> ((s, dir) => {
      ord(t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "finished")
          .otherwise("other").as("status_word"),
        coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")), lit("none")).as("prio"),
        col("o_totalprice").isNull.as("price_missing")))
    }),

    // ---- JSON ----
    "q_json" -> ((s, dir) => {
      ord(t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k")))
    }),
    "q_json_agg" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n")))
    }),

    // ---- arrays / higher-order ----
    "q_explode_tokens" -> ((s, dir) => {
      ord(t(s, dir, "documents")
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("n")))
    }),
    "q_array_funcs" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      ord(d.select(
        col("doc_id"),
        array_contains(col("toks"), "data").as("has_data"),
        size(col("toks")).as("n_toks"),
        element_at(col("toks"), 1).as("first_tok"),
        array_join(sort_array(array_intersect(col("toks"), array(lit("data"), lit("spark"), lit("table")))), ",").as("kw_hits")))
    }),
    "q_higher_order" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      ord(e.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("esum"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("norm2")))
    }),

    // ---- streaming shapes, batch-checkable (events) ----
    "q_window_tumbling" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value")))
    }),
    "q_window_sliding" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("wstart"), col("n")))
    }),
    "q_session_window" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .groupBy(session_window(col("ts"), "15 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("sstart"), col("user_id"), col("n")))
    }),
    "q_stream_dedup" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n")))
    }),
    // pins the events-time contract: `ts` is timezone-NAIVE in the parquet
    // (isAdjustedToUTC=false) and every engine compares under a UTC
    // session, so date_trunc / epoch / hour agree bit-for-bit across
    // Spark's normalized TimestampType and DuckDB's naive TIMESTAMP read
    "q_ts_convention" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .select(col("event_id"),
          date_trunc("day", col("ts")).as("day"),
          unix_timestamp(col("ts")).as("epoch_s"),
          hour(col("ts")).as("hh")))
    }),

    // extended map functions: transform_values / map_filter / map_concat
    "q_map_funcs" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, INT>")).as("m"))
        .select(col("event_id"),
          to_json(expr("transform_values(m, (k, v) -> v * 2)")).as("doubled"),
          to_json(expr("map_filter(m, (k, v) -> v > 50)")).as("big"),
          // '__extra__' cannot occur in the props fixture (json keys are
          // plain words): with a colliding key Spark's map_concat dedups
          // LAST_WIN while the oracle always adds 1 — silent divergence
          size(expr("map_concat(m, map('__extra__', 1))")).as("n_concat")))
    }),

    // ---- SQL-text surface: the spark.sql(...) entry point end-to-end
    // (TPC-H Q3 shape over temp views; every other query uses the
    // DataFrame API, this one proves the parser/analyzer path) ----
    "q_sql_tpch_q3" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      ord(s.sql(
        """SELECT l_orderkey,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |  o_orderdate, o_orderpriority
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1997-06-01'
          |  AND l_shipdate > TIMESTAMP '1997-06-01'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin))
    }),

    // TIME-WEIGHTED AVERAGE over irregular samples (the IoT/finance
    // integral: each observation holds until the next one, so the mean
    // weights each value by its holding duration, not its sample count).
    // One window shuffle computes holding intervals in exact integer
    // microseconds; products ride DECIMAL so the aggregation is
    // order-free exact, and the final division closes in double.
    "q_time_weighted_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
      ord(e.filter(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_segments"),
          sum(col("value").cast("decimal(18,4)") * col("dt")).as("wsum"),
          sum(col("dt")).as("dur_us"))
        .select(col("user_id"), col("n_segments"),
          round(col("wsum").cast("double") / col("dur_us"), 6).as("twa")))
    }),

    // POINT-IN-TIME join (feature-store correctness): each purchase
    // reads the user's event-type status AS OF its own timestamp — no
    // leakage from the future, no stale pre-history. Implemented as the
    // one-shuffle union+last(ignoreNulls) window over interleaved
    // status-change and fact rows (the scalable form); the oracle
    // recomputes via the independent correlated max-subquery. The
    // status history is exactly q_scd2's interval build, so this is the
    // dimension-lookup those intervals exist for.
    "q_join_pit" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ord(e
        .withColumn("status_asof",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("status_asof")))
    }),
    // CDC MERGE apply (insert + update + DELETE in one pass): a change
    // batch with an op column folds into the snapshot via one full
    // outer join — matched+D drops the row, matched+U takes the new
    // image, unmatched+I inserts, everything else keeps the snapshot
    // row. The change batch is derived deterministically from the
    // snapshot itself so the oracle can replay it; one shuffle per
    // side, the MERGE INTO semantics warehouses run at scale.
    "q_cdc_apply" -> ((s, dir) => {
      val snap = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val changes = t(s, dir, "orders").select(
        when(col("o_orderkey") % 10 === 0, lit("D"))
          .when(col("o_orderkey") % 10 === 1, lit("U"))
          .otherwise(lit(null)).as("op"),
        col("o_orderkey").as("c_orderkey"),
        col("o_orderstatus").as("c_status"),
        (col("o_totalprice") * 2).as("c_totalprice"))
        .filter(col("op").isNotNull)
        .unionByName(t(s, dir, "orders")
          .filter(col("o_orderkey") % 10 === 2)
          // insert keys NEGATED, not offset: orderkeys are positive at
          // every SF, so -k can never collide with a snapshot key (an
          // additive offset silently turns inserts into updates once
          // real keys pass it — at SF>=2 they exceed 10M)
          .select(lit("I").as("op"),
            (-col("o_orderkey")).as("c_orderkey"),
            lit("N").as("c_status"),
            col("o_totalprice").as("c_totalprice")))
      ord(snap.join(changes, col("o_orderkey") === col("c_orderkey"), "full_outer")
        .filter(coalesce(col("op"), lit("")) =!= "D")
        .select(
          coalesce(col("o_orderkey"), col("c_orderkey")).as("orderkey"),
          when(col("op") === "U" || col("op") === "I", col("c_status"))
            .otherwise(col("o_orderstatus")).as("status"),
          when(col("op") === "U" || col("op") === "I", col("c_totalprice"))
            .otherwise(col("o_totalprice")).as("totalprice")))
    }),

    // RUNNING DISTINCT COUNT per entity — COUNT(DISTINCT) OVER is
    // unsupported in Spark (and most engines) because the naive form
    // needs per-frame dedup state; the scalable rewrite is exact: flag
    // each value's FIRST occurrence (row_number over (entity, value)),
    // then running-sum the flags over time. Two windows, both on the
    // SAME entity shuffle. The oracle recomputes through an independent
    // correlated-subquery formulation.
    "q_window_distinct_running" -> ((s, dir) => {
      val byVal = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ord(t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("fs",
          when(row_number().over(byVal) === 1, 1L).otherwise(0L))
        .withColumn("n_distinct_types", sum(col("fs")).over(byTime))
        .drop("fs"))
    }),

    // ONE-PASS COLUMN PROFILER (the ANALYZE TABLE shape every warehouse
    // runs before planning): per column — row count, null count, exact
    // distinct count, min, max — in a single aggregate. Multiple exact
    // COUNT(DISTINCT)s in one agg compile to Catalyst's Expand plan
    // (one shuffle carrying cols× the rows, each tagged for its
    // distinct), which is the distributable form; results unpivot to
    // one row per column. min/max stringify for the uniform schema.
    // Bench mode profiles with approx_count_distinct (HLL) instead —
    // the form a 100-TB profiler actually runs (no Expand, one plain
    // pass; measured 4.4 s exact vs 0.5 s HLL at sf0.1) — same
    // contract as q_stats_agg's natural-double bench form.
    // String min/max ride the order-isomorphic fixed-width pack
    // (Ext.packLang) — a raw min(string) is a var-length aggregation
    // buffer, which silently downgrades the whole aggregate to
    // SortAggregate (the catalog-wide HashAggregate sweep caught
    // exactly that on this query's first form).
    "q_profile" -> ((s, dir) => {
      val cols = Seq("l_returnflag", "l_linestatus", "l_orderkey", "l_shipdate")
      val strCols = Set("l_returnflag", "l_linestatus")
      def dst(c: String) =
        if (graft.Tables.benchMode) approx_count_distinct(col(c))
        else countDistinct(col(c))
      def mn(c: String) =
        if (strCols(c)) graft.queries.Ext.unpackLang(min(graft.queries.Ext.packLang(col(c))))
        else min(col(c)).cast("string")
      def mx(c: String) =
        if (strCols(c)) graft.queries.Ext.unpackLang(max(graft.queries.Ext.packLang(col(c))))
        else max(col(c)).cast("string")
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"),
        dst(c).as(s"dst_$c"),
        mn(c).as(s"min_$c"),
        mx(c).as(s"max_$c")))
      val one = t(s, dir, "lineitem")
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
      val rows = cols.map(c => struct(lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_null"),
        col(s"dst_$c").as("n_distinct"),
        col(s"min_$c").as("min_val"), col(s"max_$c").as("max_val")))
      ord(one.select(explode(array(rows: _*)).as("r")).select("r.*"))
    }),
    // SCD TYPE-2 history build from a change log: consecutive repeats
    // collapse (lag filter), each surviving change opens a validity
    // interval closed by the next change's timestamp (lead), the open
    // interval marks the current row. Two windows over ONE shuffle on
    // user_id — the warehouse dimension-history shape, distributed by
    // entity.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ord(t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type").as("status"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current")))
    }),

    // TPC-H Q5 shape: the 6-table join Catalyst must ORDER well — the
    // region/nation dimensions broadcast up the chain, the c↔s nation
    // equality closes the cycle, and the one aggregate groups on the
    // 25-value nation name. The optimizer workout complement to Q3
    // (which is a 3-table chain): at 100 TB the plan that joins
    // lineitem↔orders first and broadcasts everything else is the only
    // survivable one, and that is exactly what the declarative form
    // gives Catalyst the freedom to pick.
    "q_sql_tpch_q5" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      ord(s.sql(
        """SELECT n_name,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |GROUP BY n_name""".stripMargin))
    }),
    // null-safe equi join (<=> / IS NOT DISTINCT FROM): null keys MATCH
    // each other — still hashable, so this stays a plain shuffle/equi
    // join plan, unlike an OR-of-IS-NULLs predicate which degenerates
    // to a nested loop
    "q_join_nullsafe" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderstatus") === "P", null).otherwise(col("o_orderstatus"))
          .as("k"))
      val d = t(s, dir, "orders").groupBy(
          when(col("o_orderstatus") === "P", null).otherwise(col("o_orderstatus"))
            .as("k"))
        .agg(count(lit(1)).as("n_status"))
      ord(o.join(d, o("k") <=> d("k"))
        .select(o("o_orderkey"), o("k").as("status"), d("n_status")))
    }),

    // correlated EXISTS subquery (decorrelated by Catalyst into a semi
    // join — the SQL surface of q_join_semi)
    "q_sql_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      ord(s.sql(
        """SELECT c_custkey, c_name FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin))
    }),
    // scalar subquery in a predicate (broadcast single-row subplan)
    "q_sql_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      ord(s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > 1.8 * (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) FROM orders)""".stripMargin))
    }),

    // correlated LATERAL subquery with ORDER BY + LIMIT (per-nation top-2
    // suppliers) — Catalyst decorrelates it into a window-limited join,
    // the SQL surface of q_topk_pergroup
    "q_sql_lateral" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      ord(s.sql(
        """SELECT n_name, s.s_name, s.s_acctbal
          |FROM nation, LATERAL (
          |  SELECT s_name, s_acctbal FROM supplier
          |  WHERE s_nationkey = n_nationkey
          |  ORDER BY s_acctbal DESC, s_name LIMIT 2) s""".stripMargin))
    }),
    // time-series gap filling: per-user hourly counts with missing hours
    // materialized as zeros over each user's observed range — resampling
    // for downstream models. The hour spine is generated per user from a
    // tiny post-aggregate bounds frame (sequence + explode); only the
    // already-aggregated counts frame joins back, never raw events.
    "q_gap_fill" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      val cnt = ev.groupBy(col("user_id"), col("h")).agg(count(lit(1)).as("n"))
      val hours = cnt.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      ord(hours.join(cnt, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"), coalesce(col("n"), lit(0L)).as("n")))
    }),

    // LINEAR INTERPOLATION over the gap-filled grid — q_gap_fill puts
    // zeros in missing hours; this reconstructs a VALUE series the way a
    // feature pipeline actually does: per-(user, hour) mean, then each
    // missing hour takes the time-weighted blend of its two nearest known
    // hours (running last(ignoreNulls) in both directions — two
    // frame-bounded windows per user partition, no self-join, no
    // corpus-wide sort). Grid edges are known hours by construction (the
    // grid spans min..max known), so interior nulls always have both
    // neighbors. Every quantity is BIGINT fixed-point micro-units
    // (decimal-scaled values, hour-index weights, truncating division —
    // the q_pagerank nano-units discipline): a double interpolation
    // rounds differently at half-ULP ties cross-engine (measured:
    // 32.5578125 → .557813 vs .557812), an integer one cannot.
    "q_interp_linear" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
          (col("value").cast("decimal(18,4)") * lit(10000)).cast("bigint").as("vfp"))
        .groupBy("user_id", "h")
        .agg(expr("(sum(vfp) * 100) div count(1)").as("hv_u"))
      val grid = hourly.groupBy("user_id")
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      val g = grid.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("hi", expr("unix_micros(h) div 3600000000"))
      val wAsc = Window.partitionBy("user_id").orderBy(col("h"))
      // NOTE (round-17): fusing the "next known hour" side into the
      // ascending sort via a [current, unboundedFollowing) frame measured
      // 1.44 s -> 12.5 s — Spark's UnboundedFollowing window frame
      // re-scans the remainder of the partition PER ROW (O(n²)), so the
      // second (descending) running-frame sort is the right shape.
      val wDesc = Window.partitionBy("user_id").orderBy(col("h").desc)
      ord(g
        .withColumn("pv", last(col("hv_u"), ignoreNulls = true).over(wAsc))
        .withColumn("ph", last(when(col("hv_u").isNotNull, col("hi")), ignoreNulls = true).over(wAsc))
        .withColumn("nv", last(col("hv_u"), ignoreNulls = true).over(wDesc))
        .withColumn("nh", last(when(col("hv_u").isNotNull, col("hi")), ignoreNulls = true).over(wDesc))
        .withColumn("v_interp_u",
          when(col("hv_u").isNotNull, col("hv_u"))
            .otherwise(expr(
              "(pv * (nh - hi) + nv * (hi - ph)) div (nh - ph)")))
        .withColumn("filled", col("hv_u").isNull)
        .select(col("user_id"), unix_micros(col("h")).as("h_us"),
          col("v_interp_u"), col("filled")))
    }),

    // ---- JSON struct parsing + map functions ----
    "q_from_json" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, INT>")).as("m"))
        .select(col("event_id"),
          element_at(map_keys(col("m")), 1).as("first_key"),
          element_at(map_values(col("m")), 1).as("first_val"),
          size(map_keys(col("m"))).as("n_keys"),
          to_json(col("m")).as("js")))
    }),
    "q_unionbyname" -> ((s, dir) => {
      val a = t(s, dir, "customer").select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val b = t(s, dir, "supplier").select(col("s_acctbal").as("bal"), col("s_suppkey").as("k"))
      ord(a.unionByName(b)) // b's columns are in the other order on purpose
    }),
    "q_sort_within_partitions" -> ((s, dir) => {
      // declared operator: partition-local sort (no global shuffle); the
      // outer ord() restores a deterministic order for the oracle compare
      ord(t(s, dir, "lineitem")
        .repartition(col("l_returnflag"))
        .sortWithinPartitions(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_returnflag"))
    }),
    "q_array_union" -> ((s, dir) => {
      ord(t(s, dir, "documents").select(
        col("doc_id"),
        array_join(sort_array(array_union(
          slice(split(col("text"), "\\s+"), 1, 5),
          array(lit("graft"), lit("data")))), ",").as("u")))
    }),

    // ---- reference dataflow ops as relational queries ----
    // D9: seeded random sample. The RNG stream is engine-specific, so the
    // oracle checks the deterministic invariants instead: exactly k rows,
    // all distinct, all real table keys (the inner join back onto the table
    // is the membership proof — a fabricated id would drop the count).
    "q_sample" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val samp = d.orderBy(rand(42)).limit(25).select("doc_id", "lang", "source")
      ord(samp.join(d.select("doc_id"), "doc_id")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_distinct")))
    }),
    // stratified sampling per language — the training-data mixture
    // operator (downsample dominant languages, keep rare ones). sampleBy
    // is a per-row Bernoulli filter (no shuffle); the sample is
    // engine-specific randomness, so the oracle checks INVARIANTS: every
    // stratum is present and its realized rate sits within 0.2 of the
    // target fraction (>= 5 sigma at this SF, and deterministic for a
    // fixed seed + input split anyway).
    "q_sample_stratified" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val fractions = Map("en" -> 0.5, "de" -> 0.4, "fr" -> 0.3, "es" -> 0.2, "zh" -> 0.1)
      val samp = d.stat.sampleBy("lang", fractions, seed = 42L)
      val target = when(col("lang") === "en", 0.5).when(col("lang") === "de", 0.4)
        .when(col("lang") === "fr", 0.3).when(col("lang") === "es", 0.2).otherwise(0.1)
      ord(samp.groupBy("lang").agg(count(lit(1)).as("n_samp"))
        .join(d.groupBy("lang").agg(count(lit(1)).as("n_all")), "lang")
        .select(col("lang"),
          (abs(col("n_samp") / col("n_all") - target) <= 0.2).as("rate_ok")))
    }),
    // D10: tokens common to every document of a source (common-annotation
    // intersection, distributed formulation: no driver-side fold).
    "q_common_tokens" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val docCounts = d.groupBy("source").agg(countDistinct(col("doc_id")).as("n_docs"))
      val tok = d.select(col("source"), col("doc_id"),
          explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .distinct()
        .groupBy("source", "token").agg(count(lit(1)).as("n_with"))
      ord(tok.join(broadcast(docCounts), "source")
        .filter(col("n_with") === col("n_docs"))
        .select("source", "token"))
    }),
    // D14/D15: archive upsert — delta rows win over base rows by key.
    "q_upsert_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val base = o.filter(col("o_orderkey") % 3 < 2)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val delta = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("k"), (col("o_totalprice") + 1000).as("price"))
      ord(base.join(delta, base("k") === delta("k"), "full")
        .select(
          coalesce(delta("k"), base("k")).as("k"),
          coalesce(delta("price"), base("price")).as("price")))
    }),

    // ---- statistical aggregates / recursive CTE / scalar surface ----

    // sample statistics (variance/stddev/covariance/correlation) from
    // exact decimal power sums: the sums are order-independent and
    // engine-exact, the closing formulas are identical IEEE double
    // expressions on both sides, rounded last. The native streaming
    // stddev/corr aggregates accumulate doubles in partition order (not
    // reproducible cross-engine); the power-sum form is also the
    // distributable one — ONE partial+final aggregate, no second pass,
    // and at 100 TB the five sums ride the same shuffle as any count.
    "q_stats_agg" -> ((s, dir) => {
      // decimal routing exists only for the oracle hash-compare; bench
      // mode measures the natural double power sums (DECIMAL(38,_)
      // aggregation runs on the BigDecimal path, ~6x the cost)
      def d(c: Column) =
        if (graft.Tables.benchMode) sum(c) else sum(c.cast("decimal(38,6)")).cast("double")
      val x = col("l_quantity"); val y = col("l_extendedprice")
      ord(t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("nd"),
          d(x).as("sx"), d(x * x).as("sxx"),
          d(y).as("sy"), d(y * y).as("syy"), d(x * y).as("sxy"))
        .select(col("l_returnflag"),
          col("nd").cast("bigint").as("n"),
          round((col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - 1), 6)
            .as("var_qty"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - 1)), 6)
            .as("stddev_qty"),
          round((col("sxy") - col("sx") * col("sy") / col("nd")) / (col("nd") - 1), 6)
            .as("covar_qp"),
          round((col("nd") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("nd") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("nd") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qp")))
    }),

    // recursive CTE (Spark 4 WITH RECURSIVE): generate the 24-hour spine
    // recursively and left-join per-hour event aggregates. The recursion
    // runs on a 1-row frame for 24 bounded steps; the fact table is
    // scanned exactly once — the dimension-generation pattern that also
    // covers date spines and hierarchy walks.
    "q_sql_recursive_cte" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events_rc")
      ord(s.sql(
        """WITH RECURSIVE spine(h) AS (
          |  SELECT 0 UNION ALL SELECT h + 1 FROM spine WHERE h < 23
          |)
          |SELECT s.h, COALESCE(e.n, CAST(0 AS BIGINT)) AS n_events,
          |       COALESCE(e.sum_value, CAST(0 AS DOUBLE)) AS sum_value
          |FROM spine s LEFT JOIN (
          |  SELECT CAST(hour(ts) AS INT) AS h, COUNT(*) AS n,
          |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |  FROM events_rc GROUP BY hour(ts)) e ON s.h = e.h""".stripMargin))
    }),

    // grouping flags on a rollup: the aggregation level of each output
    // row made explicit — what report consumers key on to separate
    // subtotal rows from data rows.
    "q_grouping_id" -> ((s, dir) => {
      ord(t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          count(lit(1)).as("n")))
    }),

    // positional window values over the full frame: first/last/nth with
    // an explicit ROWS UNBOUNDED...UNBOUNDED frame (the default frame
    // would stop at CURRENT ROW and make last/nth non-deterministic).
    // The synthetic lineitem has duplicate (orderkey, linenumber) pairs,
    // so the order adds every value-bearing output column as tiebreaker —
    // rows equal under the full order are interchangeable in the outputs.
    "q_window_nth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ord(t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          first(col("l_partkey")).over(w).as("first_part"),
          last(col("l_partkey")).over(w).as("last_part"),
          nth_value(col("l_quantity"), 2).over(w).as("second_qty")))
    }),

    // bitwise surface: AND/OR/XOR aggregates plus scalar xor/shifts —
    // integer arithmetic, exact in both engines.
    "q_bitwise" -> ((s, dir) => {
      ord(t(s, dir, "events")
        .groupBy("event_type")
        .agg(expr("bit_and(user_id)").as("band"),
          expr("bit_or(user_id)").as("bor"),
          expr("bit_xor(user_id)").as("bxor"),
          sum(expr("user_id ^ event_id")).as("sum_xor"),
          sum(expr("shiftleft(user_id, 3)")).as("sum_shl"),
          sum(expr("shiftright(event_id, 2)")).as("sum_shr")))
    }),

    // calendar functions beyond q_date_funcs: quarter / ISO week / ISO
    // day-of-week / day-of-year / month-end / month arithmetic (with
    // end-of-month clamping, identical in both engines).
    "q_date_funcs2" -> ((s, dir) => {
      ord(t(s, dir, "orders").select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("qtr"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        dayofyear(col("o_orderdate")).as("doy"),
        (expr("weekday(o_orderdate)") + 1).as("iso_dow"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(col("o_orderdate"), 2).as("plus2m")))
    }),

    // string surface beyond q_str_funcs: pad/repeat/reverse/translate/
    // split_part/instr/prefix/suffix predicates.
    "q_str_funcs2" -> ((s, dir) => {
      ord(t(s, dir, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, "*").as("brand_rpad"),
        repeat(substring(col("p_type"), 1, 2), 3).as("type_rep"),
        reverse(col("p_type")).as("type_rev"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
        expr("split_part(p_type, ' ', 2)").as("type_mid"),
        instr(col("p_name"), "a").cast("int").as("first_a"),
        col("p_name").startsWith("a").as("starts_a"),
        col("p_type").endsWith("D").as("ends_d")))
    }),

    // array surface beyond q_array_funcs: slice / flatten / distinct /
    // position / remove over the tokenized text (all map-side; sorting
    // normalizes any engine-specific distinct order).
    "q_array_funcs2" -> ((s, dir) => {
      val words = filter(split(col("text"), "\\s+"), w => w =!= lit(""))
      ord(t(s, dir, "documents").select(
        col("doc_id"),
        size(words).as("n_words"),
        array_join(slice(words, 1, 5), " ").as("head5"),
        array_join(sort_array(array_distinct(slice(words, 1, 10))), ",").as("d10"),
        array_position(words, "the").as("pos_the"),
        array_join(flatten(array(slice(words, 1, 2), slice(words, 3, 2))), " ").as("flat4"),
        array_join(array_remove(slice(words, 1, 8), "the"), " ").as("no_the8")))
    }),

    // gap-based SESSIONIZATION: the batch form of session analytics —
    // a new session starts when a user's inter-event gap exceeds 30
    // minutes. One window pass per user partition (lag → flag → running
    // sum), then one aggregate per (user, session); time arithmetic in
    // exact integer microseconds (unix_micros/epoch_us agree across
    // engines where second-level functions floor vs round). At scale
    // this is one hash exchange on user_id reused by both the window
    // and the aggregate.
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val gap = col("us") - lag(col("us"), 1).over(byTime)
      val flagged = ev.withColumn("new_s",
        when(gap.isNull || gap > 1800000000L, 1L).otherwise(0L))
      val sess = flagged.withColumn("session_id",
        sum(col("new_s")).over(byTime
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ord(sess.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .withColumn("duration_us", col("end_us") - col("start_us")))
    }),

    // ordered FUNNEL per user: first 'view', first 'click' strictly
    // after it, first 'purchase' strictly after that — the ordered-step
    // conversion measure in ONE scan and ONE exchange. Per user in time
    // order, a running min of view-times validates each click (earliest
    // view ≤ this row = the global first view whenever one precedes it),
    // and a running min of validated click-times validates each
    // purchase; the final groupBy reuses the same user_id partitioning.
    // The naive min-per-stage chain of join+aggregate scans the fact
    // table six times; this is the shape that survives 100 TB. Stage
    // times stay NULL where the funnel broke; per-user rows keep the
    // output value-checkable without a serial global rollup (the oracle
    // recomputes via the independent three-stage formulation).
    "q_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mv = min(when(col("event_type") === "view", col("us"))).over(w)
      val staged = ev.withColumn("click_ok",
        when(col("event_type") === "click" && col("us") > mv, col("us")))
      val mc = min(col("click_ok")).over(w)
      val staged2 = staged.withColumn("purchase_ok",
        when(col("event_type") === "purchase" && col("us") > mc, col("us")))
      ord(staged2.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("us"))).as("t_view"),
          min(col("click_ok")).as("t_click"),
          min(col("purchase_ok")).as("t_purchase"))
        .filter(col("t_view").isNotNull))
    }),

    // COHORT RETENTION: users grouped by first-activity day, counted on
    // each later activity day as an offset from their cohort — the
    // retention triangle. Two groupBys on (user, day) keys; the output
    // is cohorts × offsets, tiny at any corpus size.
    "q_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ord(ev.distinct().join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users")))
    }),

    // NOT IN with a nullable subquery: exercises the null-aware anti
    // join (three-valued NOT IN semantics — one NULL in the subquery
    // empties the result, so the planner cannot use a plain anti join;
    // the nullif keeps the column nullable without producing one).
    "q_sql_not_in" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_ni")
      t(s, dir, "customer").createOrReplaceTempView("customer_ni")
      ord(s.sql(
        """SELECT o_orderkey, o_custkey FROM orders_ni
          |WHERE o_custkey NOT IN
          |  (SELECT nullif(c_custkey, -1) FROM customer_ni WHERE c_acctbal < 0)""".stripMargin))
    }),

    // exact interpolated median (both engines: quantile_cont semantics)
    // plus a DETERMINISTIC mode: the native mode() aggregate ties
    // arbitrarily, so the portable form ranks (count DESC, value ASC)
    // explicitly — which is also the distributable shape (one groupBy +
    // one per-group WindowGroupLimit-prunable rank, no serial state).
    "q_agg_median_mode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cnts = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("c").desc, col("l_quantity").asc)
      val mode = cnts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
      val med = t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(median(col("l_quantity")), 6).as("median_qty"))
      ord(med.join(mode, Seq("l_returnflag")))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_agg_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts, true AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sample" ->
      "SELECT CAST(25 AS BIGINT) AS n, CAST(25 AS BIGINT) AS n_distinct",
    "q_sample_stratified" ->
      """SELECT * FROM (VALUES ('de', true), ('en', true), ('es', true),
        |  ('fr', true), ('zh', true)) AS t(lang, rate_ok)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_filter_date" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND o_orderstatus = 'O' ORDER BY ALL NULLS FIRST""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_minmax" ->
      """SELECT l_returnflag, MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        |  COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_groupingsets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_distinct_twophase" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_collect" ->
      """SELECT lang, string_agg(source, ',' ORDER BY source) AS sources,
        |  string_agg(DISTINCT source, ',' ORDER BY source) AS distinct_sources,
        |  COUNT(*) AS n
        |FROM documents GROUP BY lang ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_inner" ->
      """SELECT l_orderkey, l_linenumber, o_orderdate, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_broadcast" ->
      """SELECT c_custkey, n_name, r_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey ORDER BY ALL NULLS FIRST""".stripMargin,
    // recomputed from the original table (distinct non-empty texts =
    // the ingest dedup); n_files = 1 IS the compaction postcondition
    "q_compact_store" ->
      """WITH c AS (SELECT DISTINCT text FROM documents WHERE length(text) > 0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(MIN(length(text)) AS INT) AS min_len,
        |  CAST(MAX(length(text)) AS INT) AS max_len,
        |  CAST(1 AS BIGINT) AS n_files
        |FROM c""".stripMargin,
    // recomputed from the original parquet: the CSV writer/reader pair
    // (doubles, dates, bigints through text) must round-trip exactly
    "q_csv_roundtrip" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
        |FROM orders GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    // recomputed from the original parquet: the ORC writer/reader pair
    // must be value- and type-faithful or this diverges
    "q_orc_roundtrip" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_orderdate) AS first_date
        |FROM orders WHERE o_totalprice > 200000
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    // recomputed from the original table: the z-ordered staging must be
    // a faithful re-layout or this diverges
    "q_zorder_layout" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 50 AND 150 AND l_suppkey BETWEEN 2 AND 15
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // recomputed from the original table: the partitioned staging must
    // be a faithful, correctly-bucketed-by-lang copy or this diverges
    "q_join_dpp" ->
      """WITH d AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
        |           FROM documents GROUP BY lang HAVING COUNT(*) >= 75)
        |SELECT f.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(f.n_chars) AS BIGINT) AS sum_chars, max(d.n_lang) AS n_lang
        |FROM documents f JOIN d ON f.lang = d.lang
        |GROUP BY f.lang ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_partitioned_write" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,
    // the plain join the salted form must reproduce row-for-row
    "q_join_skew_salted" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    // the single-phase aggregate the salted two-phase form must equal
    "q_agg_skew_salted" ->
      """SELECT l_suppkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    // recomputed from the original tables: the bucketed staging must be
    // a faithful copy or this diverges
    "q_join_bucketed" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    // recomputed as the plain join: the bloom filter must be purely an
    // execution-side prune, never a row filter
    "q_join_bloom" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_left" ->
      """SELECT o_orderkey, l_linenumber, l_quantity
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey AND l_quantity > 45
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_right" ->
      """SELECT o_orderkey, l_linenumber, l_quantity
        |FROM lineitem RIGHT JOIN orders ON o_orderkey = l_orderkey AND l_quantity > 45
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer FULL JOIN orders ON c_custkey = o_custkey AND o_totalprice > 450000
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_orderpriority = '1-URGENT')
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderpriority = '1-URGENT')
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY ALL NULLS FIRST",
    "q_join_theta" ->
      """SELECT s_suppkey, COUNT(*) AS n_richer
        |FROM supplier JOIN customer ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
        |GROUP BY s_suppkey ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_range" ->
      """SELECT c_custkey, band, c_acctbal
        |FROM customer JOIN (
        |  SELECT r_regionkey AS band, r_regionkey * 2000.0 AS lo,
        |    (r_regionkey + 1) * 2000.0 AS hi FROM region) bands
        |ON c_acctbal >= lo AND c_acctbal < hi
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id, user_id, ts,
        |  (SELECT max(e2.ts) FROM events e2
        |   WHERE e2.user_id = e.user_id AND e2.event_type = 'error'
        |     AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id))) AS last_error_ts
        |FROM events e WHERE event_type = 'purchase' ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_asof_tol" ->
      """SELECT event_id, user_id, ts,
        |  (SELECT max(e2.ts) FROM events e2
        |   WHERE e2.user_id = e.user_id AND e2.event_type = 'error'
        |     AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id))
        |     AND e2.ts >= e.ts - INTERVAL 1 HOUR) AS last_error_ts
        |FROM events e WHERE event_type = 'purchase' ORDER BY ALL NULLS FIRST""".stripMargin,
    // independent correlated min/max form of the nearest-direction rule
    "q_join_asof_nearest" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN prev_err IS NULL THEN next_err
        |       WHEN next_err IS NULL THEN prev_err
        |       WHEN epoch_us(ts) - epoch_us(prev_err) <= epoch_us(next_err) - epoch_us(ts)
        |         THEN prev_err ELSE next_err END AS nearest_error_ts
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts,
        |    (SELECT max(e2.ts) FROM events e2
        |     WHERE e2.user_id = e.user_id AND e2.event_type = 'error'
        |       AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id))) AS prev_err,
        |    (SELECT min(e2.ts) FROM events e2
        |     WHERE e2.user_id = e.user_id AND e2.event_type = 'error'
        |       AND (e2.ts > e.ts OR (e2.ts = e.ts AND e2.event_id >= e.event_id))) AS next_err
        |  FROM events e WHERE event_type = 'purchase')
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // the naive theta form the bucketed equi join must reproduce
    "q_join_interval" ->
      """WITH a AS (SELECT event_id AS a_id, ts AS a_s, ts + INTERVAL 1 HOUR AS a_e
        |           FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT event_id AS b_id, ts AS b_s, ts + INTERVAL 2 HOUR AS b_e
        |      FROM events WHERE event_type = 'error')
        |SELECT a_id, b_id,
        |  epoch_us(least(a_e, b_e)) - epoch_us(greatest(a_s, b_s)) AS overlap_us
        |FROM a, b WHERE a_s < b_e AND b_s < a_e
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INTEGER) AS drk,
        |  CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_rank_global" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(rank() OVER (ORDER BY l_quantity) AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER (ORDER BY l_quantity) AS INTEGER) AS drk
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_pct_global" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(percent_rank() OVER (ORDER BY l_quantity), 6) AS pct_rank,
        |  round(cume_dist() OVER (ORDER BY l_quantity), 6) AS cdist
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value,
        |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_topk_pergroup" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_pct" ->
      """SELECT o_custkey, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_bit_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  xor(l_orderkey, l_partkey) AS bxor,
        |  l_orderkey & l_partkey AS band,
        |  l_orderkey | l_partkey AS bor,
        |  CAST(l_linenumber << 2 AS INTEGER) AS shl,
        |  l_orderkey >> 1 AS shr
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_date_more" ->
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(last_day(o_orderdate) AS DATE) AS eom,
        |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_union_all" ->
      """SELECT c_nationkey AS nk, c_acctbal AS bal FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_nationkey AS nk, s_acctbal AS bal FROM supplier WHERE s_acctbal > 9000
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9990
        |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_except" ->
      """SELECT n_nationkey AS nk FROM nation EXCEPT SELECT s_nationkey AS nk FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_dropdup" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY ALL NULLS FIRST",
    "q_skew_report" ->
      """WITH f AS (SELECT user_id AS key, COUNT(*) AS n FROM events GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(MIN(n) AS BIGINT) AS min_key_rows,
        |  CAST(MAX(n) AS BIGINT) AS max_key_rows,
        |  round(quantile_cont(n, 0.5), 6) AS p50,
        |  round(quantile_cont(n, 0.99), 6) AS p99,
        |  CAST((MAX(n) * COUNT(*)) // SUM(n) AS BIGINT) AS skew_factor,
        |  CAST(LEAST(32, GREATEST(1, (MAX(n) * COUNT(*)) // SUM(n))) AS BIGINT) AS suggested_salts
        |FROM f ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_set_ops_all" ->
      """WITH a AS (SELECT user_id, event_type FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT user_id, event_type FROM events WHERE event_id % 2 = 1)
        |SELECT user_id, event_type, 'except_all' AS tag
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT user_id, event_type, 'intersect_all' AS tag
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_interp_linear" ->
      """WITH hv AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |    (SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) * 100) // COUNT(*) AS hv_u
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hv GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM sp),
        |g AS (SELECT grid.user_id, grid.h, hv.hv_u,
        |        epoch_us(grid.h) // 3600000000 AS hi
        |      FROM grid LEFT JOIN hv USING (user_id, h)),
        |p AS (SELECT user_id, h, hv_u, hi,
        |  last_value(hv_u IGNORE NULLS) OVER w AS pv,
        |  last_value(CASE WHEN hv_u IS NOT NULL THEN hi END IGNORE NULLS) OVER w AS ph,
        |  last_value(hv_u IGNORE NULLS) OVER wd AS nv,
        |  last_value(CASE WHEN hv_u IS NOT NULL THEN hi END IGNORE NULLS) OVER wd AS nh
        |  FROM g
        |  WINDOW w AS (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wd AS (PARTITION BY user_id ORDER BY h DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, epoch_us(h) AS h_us,
        |  CAST(CASE WHEN hv_u IS NOT NULL THEN hv_u
        |    ELSE (pv * (nh - hi) + nv * (hi - ph)) // (nh - ph) END AS BIGINT) AS v_interp_u,
        |  hv_u IS NULL AS filled
        |FROM p ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_str_funcs" ->
      """SELECT c_custkey,
        |  c_name || '-' || c_mktsegment AS cn,
        |  upper(c_name) AS up,
        |  lower(c_mktsegment) AS lo,
        |  substring(c_name, 10, 9) AS cnum_str,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  trim('  ' || c_mktsegment || '  ') AS trimmed,
        |  printf('%s|%d', c_mktsegment, c_custkey) AS fmt
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_regexp" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cnum,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS repl
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_levenshtein" ->
      "SELECT p_partkey, CAST(levenshtein(p_brand, p_type) AS INTEGER) AS dist FROM part ORDER BY ALL NULLS FIRST",
    "q_hash_md5" ->
      "SELECT doc_id, md5(text) AS h FROM documents ORDER BY ALL NULLS FIRST",
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_ago,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  abs(l_discount - 0.05) AS ab,
        |  l_quantity * l_quantity AS sq,
        |  round(ln(l_extendedprice), 6) AS ln6,
        |  ((l_orderkey % 7) + 7) % 7 AS pm
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_cond_funcs" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' THEN 'open'
        |       WHEN o_orderstatus = 'F' THEN 'finished'
        |       ELSE 'other' END AS status_word,
        |  coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'none') AS prio,
        |  o_totalprice IS NULL AS price_missing
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_json_agg" ->
      """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_explode_tokens" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |WHERE length(token) > 0 GROUP BY token ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_array_funcs" ->
      """SELECT doc_id,
        |  list_contains(toks, 'data') AS has_data,
        |  CAST(len(toks) AS INTEGER) AS n_toks,
        |  toks[1] AS first_tok,
        |  coalesce(array_to_string(list_sort(list_intersect(toks, ['data','spark','table'])), ','), '') AS kw_hits
        |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_higher_order" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS esum,
        |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm2
        |FROM embeddings ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_sliding" ->
      """SELECT wstart, COUNT(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS wstart FROM events)
        |GROUP BY wstart ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_session_window" ->
      """WITH gaps AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL '15 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM gaps)
        |SELECT min(ts) AS sstart, user_id, COUNT(*) AS n
        |FROM sess GROUP BY user_id, sid ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_stream_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event_id, COUNT(*) AS n
        |FROM events GROUP BY user_id, event_type ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_ts_convention" ->
      """SELECT event_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, CAST(hour(ts) AS INTEGER) AS hh
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_common_tokens" ->
      """WITH dc AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM documents GROUP BY source),
        |tok AS (
        |  SELECT DISTINCT source, doc_id, token FROM (
        |    SELECT source, doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |  WHERE length(token) > 0),
        |cnt AS (SELECT source, token, COUNT(*) AS n_with FROM tok GROUP BY source, token)
        |SELECT cnt.source, cnt.token FROM cnt JOIN dc ON cnt.source = dc.source
        |WHERE cnt.n_with = dc.n_docs ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sql_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        |d AS (SELECT user_id, us, value,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt
        |  FROM e)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4)) * dt) AS DOUBLE) / SUM(dt), 6) AS twa
        |FROM d WHERE dt IS NOT NULL GROUP BY user_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_pit" ->
      """SELECT event_id, user_id, ts,
        |  (SELECT e2.event_type FROM events e2
        |   WHERE e2.user_id = e.user_id AND e2.event_type <> 'purchase'
        |     AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id))
        |   ORDER BY e2.ts DESC, e2.event_id DESC LIMIT 1) AS status_asof
        |FROM events e WHERE event_type = 'purchase'
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_cdc_apply" ->
      """WITH ch AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_orderkey AS c_orderkey, o_orderstatus AS c_status,
        |    o_totalprice * 2 AS c_totalprice
        |  FROM orders WHERE o_orderkey % 10 IN (0, 1)
        |  UNION ALL
        |  SELECT 'I', -o_orderkey, 'N', o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 2),
        |m AS (
        |  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice,
        |         c.op, c.c_orderkey, c.c_status, c.c_totalprice
        |  FROM orders s FULL OUTER JOIN ch c ON s.o_orderkey = c.c_orderkey)
        |SELECT coalesce(o_orderkey, c_orderkey) AS orderkey,
        |  CASE WHEN op IN ('U', 'I') THEN c_status ELSE o_orderstatus END AS status,
        |  CASE WHEN op IN ('U', 'I') THEN c_totalprice ELSE o_totalprice END AS totalprice
        |FROM m WHERE coalesce(op, '') <> 'D'
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_distinct_running" ->
      """SELECT event_id, user_id, ts, event_type,
        |  (SELECT COUNT(DISTINCT e2.event_type) FROM events e2
        |   WHERE e2.user_id = e.user_id
        |     AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id)))
        |    AS n_distinct_types
        |FROM events e ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_profile" ->
      """WITH s AS (SELECT COUNT(*) AS n_rows,
        |  COUNT(l_returnflag) AS c1, COUNT(DISTINCT l_returnflag) AS d1,
        |    CAST(MIN(l_returnflag) AS VARCHAR) AS mn1, CAST(MAX(l_returnflag) AS VARCHAR) AS mx1,
        |  COUNT(l_linestatus) AS c2, COUNT(DISTINCT l_linestatus) AS d2,
        |    CAST(MIN(l_linestatus) AS VARCHAR) AS mn2, CAST(MAX(l_linestatus) AS VARCHAR) AS mx2,
        |  COUNT(l_orderkey) AS c3, COUNT(DISTINCT l_orderkey) AS d3,
        |    CAST(MIN(l_orderkey) AS VARCHAR) AS mn3, CAST(MAX(l_orderkey) AS VARCHAR) AS mx3,
        |  COUNT(l_shipdate) AS c4, COUNT(DISTINCT l_shipdate) AS d4,
        |    CAST(MIN(l_shipdate) AS VARCHAR) AS mn4, CAST(MAX(l_shipdate) AS VARCHAR) AS mx4
        |  FROM lineitem)
        |SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val FROM (
        |  SELECT 'l_returnflag' AS col_name, n_rows, n_rows - c1 AS n_null, d1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM s
        |  UNION ALL
        |  SELECT 'l_linestatus', n_rows, n_rows - c2, d2, mn2, mx2 FROM s
        |  UNION ALL
        |  SELECT 'l_orderkey', n_rows, n_rows - c3, d3, mn3, mx3 FROM s
        |  UNION ALL
        |  SELECT 'l_shipdate', n_rows, n_rows - c4, d4, mn4, mx4 FROM s)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_scd2" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM o
        |       WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS status, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM ch ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sql_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_nullsafe" ->
      """WITH o AS (SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS k
        |  FROM orders),
        |d AS (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_status
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderkey, o.k AS status, d.n_status
        |FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.k
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_unpivot" ->
      """SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'c_nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median,
        |  true AS within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sql_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.8 * (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) FROM orders)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sql_lateral" ->
      """SELECT n_name, s.s_name, s.s_acctbal
        |FROM nation, LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier
        |  WHERE s_nationkey = n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2) s
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events),
        |cnt AS (SELECT user_id, h, COUNT(*) AS n FROM ev GROUP BY 1, 2),
        |b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM cnt GROUP BY 1),
        |hours AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b)
        |SELECT hours.user_id, hours.h, coalesce(cnt.n, 0) AS n
        |FROM hours LEFT JOIN cnt USING (user_id, h)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id,
        |  to_json(map(json_keys(props), [2 * CAST(props -> k AS INT) FOR k IN json_keys(props)])) AS doubled,
        |  to_json(map(list_filter(json_keys(props), k -> CAST(props -> k AS INT) > 50),
        |              [CAST(props -> k AS INT) FOR k IN list_filter(json_keys(props), k -> CAST(props -> k AS INT) > 50)])) AS big,
        |  CAST(len(json_keys(props)) + 1 AS INT) AS n_concat
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_from_json" ->
      """SELECT event_id,
        |  json_keys(props)[1] AS first_key,
        |  CAST(props -> json_keys(props)[1] AS INTEGER) AS first_val,
        |  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
        |  to_json(map(json_keys(props), [CAST(props -> k AS INTEGER) FOR k IN json_keys(props)])) AS js
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_unionbyname" ->
      """SELECT c_custkey AS k, c_acctbal AS bal FROM customer
        |UNION ALL SELECT s_suppkey AS k, s_acctbal AS bal FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sort_within_partitions" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_array_union" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(
        |    string_split_regex(text, '\s+')[1:5] || ['graft', 'data'])), ',') AS u
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_upsert_merge" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders WHERE o_orderkey % 3 < 2),
        |delta AS (SELECT o_orderkey AS k, o_totalprice + 1000 AS price FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT coalesce(delta.k, base.k) AS k, coalesce(delta.price, base.price) AS price
        |FROM base FULL JOIN delta ON base.k = delta.k ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_stats_agg" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS nd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(nd AS BIGINT) AS n,
        |  ROUND((sxx - sx*sx/nd)/(nd-1), 6) AS var_qty,
        |  ROUND(SQRT((sxx - sx*sx/nd)/(nd-1)), 6) AS stddev_qty,
        |  ROUND((sxy - sx*sy/nd)/(nd-1), 6) AS covar_qp,
        |  ROUND((nd*sxy - sx*sy)/(SQRT(nd*sxx - sx*sx)*SQRT(nd*syy - sy*sy)), 6) AS corr_qp
        |FROM s ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sql_recursive_cte" ->
      """WITH RECURSIVE spine(h) AS (
        |  SELECT 0 UNION ALL SELECT h + 1 FROM spine WHERE h < 23
        |)
        |SELECT s.h, COALESCE(e.n, CAST(0 AS BIGINT)) AS n_events,
        |       COALESCE(e.sum_value, CAST(0 AS DOUBLE)) AS sum_value
        |FROM spine s LEFT JOIN (
        |  SELECT CAST(hour(ts) AS INT) AS h, COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY hour(ts)) e ON s.h = e.h
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_nth" ->
      """SELECT l_orderkey, l_linenumber,
        |  first_value(l_partkey) OVER w AS first_part,
        |  last_value(l_partkey) OVER w AS last_part,
        |  nth_value(l_quantity, 2) OVER w AS second_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_bitwise" ->
      """SELECT event_type,
        |  bit_and(user_id) AS band, bit_or(user_id) AS bor, bit_xor(user_id) AS bxor,
        |  CAST(SUM(xor(user_id, event_id)) AS BIGINT) AS sum_xor,
        |  CAST(SUM(user_id << 3) AS BIGINT) AS sum_shl,
        |  CAST(SUM(event_id >> 2) AS BIGINT) AS sum_shr
        |FROM events GROUP BY event_type ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_str_funcs2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_lpad,
        |  rpad(p_brand, 12, '*') AS brand_rpad,
        |  repeat(substring(p_type, 1, 2), 3) AS type_rep,
        |  reverse(p_type) AS type_rev,
        |  translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
        |  split_part(p_type, ' ', 2) AS type_mid,
        |  CAST(instr(p_name, 'a') AS INT) AS first_a,
        |  starts_with(p_name, 'a') AS starts_a,
        |  ends_with(p_type, 'D') AS ends_d
        |FROM part ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_array_funcs2" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(words) AS INT) AS n_words,
        |  array_to_string(words[1:5], ' ') AS head5,
        |  array_to_string(list_sort(list_distinct(words[1:10])), ',') AS d10,
        |  CAST(COALESCE(list_position(words, 'the'), 0) AS BIGINT) AS pos_the,
        |  array_to_string(flatten([words[1:2], words[3:4]]), ' ') AS flat4,
        |  array_to_string(list_filter(words[1:8], x -> x <> 'the'), ' ') AS no_the8
        |FROM w ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_cms_union" ->
      """SELECT user_id, exact_cnt, true AS never_under, true AS within_bound
        |FROM (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        |  FROM events GROUP BY user_id
        |  ORDER BY exact_cnt DESC, user_id LIMIT 20)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_hll_union" ->
      """SELECT CAST(weekofyear(ts) AS INT) AS wk,
        |  COUNT(DISTINCT user_id) AS exact_users, true AS within_5pct
        |FROM events GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    // the full-table aggregate directly — a pass proves the engine's
    // partial-merge is lossless
    "q_incr_agg" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY source
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // the same dense grid, fixed expression tree, 9-decimal term
    // rounding and decimal sum
    "q_drift_chi2" ->
      """WITH g AS (
        |  SELECT source, CAST(least(n_chars // 32, 31) AS INT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |bt AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS bin_tot FROM g GROUP BY bin),
        |ns AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_src FROM g GROUP BY source),
        |tot AS (SELECT CAST(SUM(bin_tot) AS BIGINT) AS n_total FROM bt),
        |dense AS (
        |  SELECT ns.source, bt.bin, ns.n_src, bt.bin_tot, tot.n_total,
        |    COALESCE(g.cnt, 0) AS obs,
        |    CAST(ns.n_src AS DOUBLE) * bt.bin_tot / tot.n_total AS exp
        |  FROM ns CROSS JOIN bt CROSS JOIN tot
        |  LEFT JOIN g ON g.source = ns.source AND g.bin = bt.bin),
        |terms AS (
        |  SELECT source, n_src,
        |    round((obs - exp) * (obs - exp) / exp, 9) AS term
        |  FROM dense)
        |SELECT source, MAX(n_src) AS n_src,
        |  round(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6) AS chi2,
        |  round(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6) > 44.985 AS drift
        |FROM terms GROUP BY source
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // the same binning, vector-add union, and covering-bin interpolation
    "q_hist_quantiles" ->
      """WITH g AS (
        |  SELECT source, CAST(least(n_chars // 32, 31) AS INT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |h AS (SELECT source, bin, cnt FROM g
        |      UNION ALL
        |      SELECT '__all__', bin, CAST(SUM(cnt) AS BIGINT) FROM g GROUP BY bin),
        |c AS (SELECT source, bin, cnt,
        |        CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS BIGINT) AS cum,
        |        CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_docs
        |      FROM h),
        |q AS (SELECT unnest([50, 90]) AS q_pct),
        |f AS (SELECT c.*, q.q_pct, (q.q_pct * n_docs + 99) // 100 AS t
        |      FROM c, q WHERE cum >= (q.q_pct * n_docs + 99) // 100),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source, q_pct ORDER BY bin) AS rn
        |      FROM f)
        |SELECT source, q_pct, n_docs,
        |  round(CAST(bin * 32 AS DOUBLE) +
        |    32.0 * CAST(t - cum + cnt AS DOUBLE) / cnt, 6) AS q_est
        |FROM r WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_window_time_range" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_last_hour,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id, event_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us, max(us) - min(us) AS duration_us
        |FROM s GROUP BY user_id, session_id ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t_view FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT ev.user_id, min(us) AS t_click FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t_view GROUP BY ev.user_id),
        |s3 AS (SELECT ev.user_id, min(us) AS t_purchase FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t_click GROUP BY ev.user_id)
        |SELECT s1.user_id, t_view, t_click, t_purchase
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sql_not_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT nullif(c_custkey, -1) FROM customer WHERE c_acctbal < 0)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_agg_median_mode" ->
      """WITH med AS (
        |  SELECT l_returnflag, ROUND(median(l_quantity), 6) AS median_qty
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS c
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |m AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty FROM (
        |    SELECT l_returnflag, l_quantity,
        |      row_number() OVER (PARTITION BY l_returnflag
        |                         ORDER BY c DESC, l_quantity ASC) AS rk
        |    FROM c) WHERE rk = 1)
        |SELECT med.l_returnflag, med.median_qty, m.mode_qty
        |FROM med JOIN m USING (l_returnflag) ORDER BY ALL NULLS FIRST""".stripMargin,
  )
}
