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

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
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
}
