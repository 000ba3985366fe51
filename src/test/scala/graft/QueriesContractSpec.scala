package graft

/** Driver-contract guardrails: every oracle key names a real query, every
  * query executes at sf0.001, the flagship entry returns rows, and key
  * result invariants hold (the driver smoke/t2 preconditions). */
class QueriesContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fixture corpus is vertical-tab-free (the one Java-\\s vs RE2-\\s divergence)") {
    // Java \s includes U+000B; RE2's (the DuckDB oracle's) does not. The
    // engine follows Java semantics (the reference's — Annotators.isRegexWs,
    // WordScan.isWsByte, the split("\\s+") signature family), so oracle
    // parity is sound only while the corpus has no vertical tabs — asserted
    // here for the correctness-gate SF.
    import org.apache.spark.sql.functions.col
    val vt = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").contains("\u000B")).count()
    assert(vt == 0, s"$vt fixture docs contain U+000B; token parity claim breaks")
  }

  test("fixture corpus has no null/empty/sub-window texts (the prefix-hash " +
    "oracle precondition)") {
    // The O(bytes) prefix-hash oracles (q_fingerprint family) have no
    // pos = 0 row, so an empty document would silently vanish from the
    // oracle output while the engine still emits its row — a row-count
    // FAIL at compare time. The generator guarantees every text covers
    // at least one 32-byte rolling window; pin that here (at the
    // correctness-gate SF) so a fixture regeneration that breaks the
    // guarantee fails loudly in `sbt test`, not in the driver compare.
    import org.apache.spark.sql.functions.{col, min, octet_length}
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(d.filter(col("text").isNull || col("text") === "").count() == 0,
      "fixture contains null/empty texts")
    val minBytes = d.agg(min(octet_length(col("text")))).head().getInt(0)
    assert(minBytes >= 32,
      s"shortest fixture text is $minBytes bytes < the 32-byte window")
  }

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("materializeCtes: rewrites every bare CTE, skips recursive " +
    "column-list declarations, and is idempotent") {
    // The rewrite is the fix for four straight empty CORRECTNESS
    // artifacts (DuckDB inlines every CTE reference; q_dedup_semantic's
    // oracle cost 384 s un-materialized) — pin its behavior.
    val f = SparkEntry.materializeCtes _
    assert(f("WITH a AS (SELECT 1)\nSELECT * FROM a") ==
      "WITH a AS MATERIALIZED (SELECT 1)\nSELECT * FROM a")
    assert(f("WITH x AS (s),\nb2 AS (t)\nSELECT 1") ==
      "WITH x AS MATERIALIZED (s),\nb2 AS MATERIALIZED (t)\nSELECT 1")
    // recursive CTEs are declared with a column list and must NOT match
    // (DuckDB cannot materialize them)
    val rec = "WITH RECURSIVE reach(src, lbl) AS (SELECT 1)\nSELECT 2"
    assert(f(rec) == rec, "column-list (recursive) declaration rewritten")
    // idempotent: a second pass is a no-op
    val once = f("WITH a AS (SELECT 1)\nSELECT * FROM a")
    assert(f(once) == once, "double-application changed the SQL")
    // indented body lines never match
    val body = "WITH a AS (\n  nested AS (no)\n)\nSELECT 1"
    assert(f(body).linesIterator.count(_.contains("MATERIALIZED")) == 1)
  }

  test("every catalog oracle's bare CTE definitions are all materialized " +
    "(an unmatched name silently reverts to the 384s inline cost)") {
    // The rewrite only matches lowercase names at line start with
    // single-space ' AS ('. A CTE outside that grammar (uppercase or
    // digit-first name, two CTEs on one line, 'AS  (' / 'AS(' spacing)
    // would silently skip materialization — the exact failure mode that
    // shipped four empty correctness artifacts. So this guard scans
    // ANYWHERE with flexible spacing and case. `<name> AS (` also
    // legitimately appears as a named WINDOW declaration — those are
    // told apart by their body: a window spec starts with PARTITION/
    // ORDER/ROWS/RANGE/GROUPS, a CTE body with a query keyword. (Column
    // aliases put the name AFTER the AS; recursive declarations close a
    // parenthesis before the AS — neither can match at all.)
    val bare = "(?im)\\b([A-Za-z_0-9]+)[ \\t]+AS[ \\t]*\\(\\s*([A-Za-z]*)".r
    val windowSpec = Set("PARTITION", "ORDER", "ROWS", "RANGE", "GROUPS")
    val offending = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        bare.findAllMatchIn(sql)
          .filterNot(m => windowSpec(m.group(2).toUpperCase))
          .map(_.group(1)).toSeq.map(n => s"$name:$n")
    }
    assert(offending.isEmpty,
      s"un-materialized CTE definitions survived the rewrite: $offending")
  }

  test("flagship entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("fingerprint expressions: equal text equal hash, append changes it") {
    import graft.functions.{MinWindowHash, RollingHash}
    def rh(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = h * RollingHash.Base + (b & 0xffL))
      h
    }
    assert(rh("abc") != rh("abd"))
    assert(rh("abc") == rh("abc"))
    // min-window hash is invariant under appends that don't create a
    // smaller window (winnowing property on a shared prefix)
    val base = "x" * 100
    val m1 = MinWindowHash.evalBytes((base + "zzz").getBytes("UTF-8"), 32)
    val m2 = MinWindowHash.evalBytes(base.getBytes("UTF-8"), 32)
    assert(java.lang.Long.compareUnsigned(m1, m2) <= 0,
      "appending can only add windows, so the min can only decrease")
  }

  test("minhash candidates contain the top exact near-dup pairs") {
    val exact = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir)
      .filter("jaccard >= 0.5")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("q_dedup_minhash")(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 bands x 4 rows: P(miss | j >= 0.5) = (1 - j^4)^8 <= 0.6 per pair —
    // not a guarantee, but the fixture's near-dups are j ~ 0.8+ where the
    // miss probability is ~2e-2; require containment of the strong pairs
    val strong = exact
    assert(strong.subsetOf(cand),
      s"LSH missed strong pairs: ${strong -- cand}")
  }

  test("knn: every query id gets exactly k neighbors, ranked by similarity") {
    val rows = SparkEntry.queries("q_knn_bruteforce")(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    for ((_, rs) <- byQ) {
      assert(rs.length == 5)
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getDouble(2)).sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, "similarity must be non-increasing in rank")
    }
  }

  test("family split admits zero near-dup leakage across splits") {
    // q_split_by_family's defining property: with the split drawn on the
    // duplicate-family representative, no exact or near duplicate pair
    // can straddle a split boundary. Re-run the q_split_leakage audit
    // under the family rule and assert every tier reads zero.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, dir, "documents")
    val rep = docs.select(col("doc_id"),
      min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text"))))
        .as("rep"))
    val pairs = graft.operators.TextDedup.jaccardPairs(
      graft.operators.TextDedup.canonicalize(docs, "doc_id", "text"),
      "doc_id", "text", threshold = 0.2, portable = true)
    val comp = graft.operators.TextDedup.duplicateClusters(pairs)
    val fam = rep.join(comp.select(col("member").as("rep"), col("cluster_rep")),
        Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("rep")).as("family_rep"))
    def splitOf(c: org.apache.spark.sql.Column) = {
      val draw = conv(substring(md5(c.cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 100
      when(draw < 80, "train").when(draw < 90, "valid").otherwise("test")
    }
    val sp = fam.select(col("doc_id"), splitOf(col("family_rep")).as("sp"))
    // exact tier: two docs with identical text in different splits
    val byText = docs.select(md5(col("text")).as("h"), col("doc_id"))
      .join(sp, "doc_id")
    val exactLeak = byText.as("a").join(byText.as("b"), "h")
      .filter(col("a.sp") =!= col("b.sp")).count()
    assert(exactLeak == 0, s"$exactLeak exact-dup pairs straddle splits")
    // near tier: a jaccard pair whose endpoints split differently
    val nearLeak = pairs
      .join(sp.select(col("doc_id").as("doc_a"), col("sp").as("sa")), "doc_a")
      .join(sp.select(col("doc_id").as("doc_b"), col("sp").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(nearLeak == 0, s"$nearLeak near-dup pairs straddle splits")
    graft.plans.Checkpoints.releaseAll(spark)
  }
}
