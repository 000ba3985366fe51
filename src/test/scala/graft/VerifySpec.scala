package graft

import java.nio.file.Files

/** Contract of the driver-facing correctness dump (`Verify.run`):
  *
  *   - a succeeding query leaves a parquet directory named after it;
  *   - a THROWING query must be recorded by name in
  *     `verify_errors.json` — never silently dropped (advisor round 9:
  *     the correctness artifact shrank 130→118 with zero red flags);
  *   - `oracle_sql.json` carries every declared oracle, JSON-escaped.
  */
class VerifySpec extends SparkSpec {

  test("succeeding queries produce parquet and an empty error marker") {
    val out = Files.createTempDirectory("graft-verify-ok").toString
    val errors = Verify.run(spark, "/root/testdata/sf0.001", out,
      Set("q1_agg", "q_ts_convention"))
    assert(errors.isEmpty, s"expected no failures, got $errors")
    assert(new java.io.File(s"$out/q1_agg").isDirectory)
    assert(new java.io.File(s"$out/q_ts_convention").isDirectory)
    assert(Files.readString(java.nio.file.Paths.get(s"$out/verify_errors.json")) == "{}")
    assert(spark.read.parquet(s"$out/q1_agg").count() > 0)
  }

  test("a throwing query is recorded by name in verify_errors.json") {
    val out = Files.createTempDirectory("graft-verify-err").toString
    // a nonexistent sfDir makes the scan throw for every selected query
    val errors = Verify.run(spark, "/no/such/testdata", out, Set("q1_agg"))
    assert(errors.contains("q1_agg"), s"failure must be recorded, got $errors")
    val marker = Files.readString(java.nio.file.Paths.get(s"$out/verify_errors.json"))
    assert(marker.contains("\"q1_agg\""),
      s"marker file must name the failed query, got: $marker")
    // the oracle dump still happens — the driver compares what DID succeed
    assert(new java.io.File(s"$out/oracle_sql.json").isFile)
  }

  test("exhausted budget skips the tail but never the static artifacts") {
    // the round-14 failure mode: a driver-side kill mid-loop left parquet
    // but NO oracle_sql.json, so the compare degraded to zero rows and the
    // round's correctness artifact shipped empty. The partial-proof
    // contract: every static artifact exists even when ZERO queries ran.
    val out = Files.createTempDirectory("graft-verify-budget").toString
    val errors = Verify.run(spark, "/root/testdata/sf0.001", out,
      Set("q1_agg"), budgetSec = -1.0)
    assert(errors.isEmpty)
    assert(!new java.io.File(s"$out/q1_agg").exists, "budget -1 must skip all")
    val oracle = Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    assert(oracle.contains("\"q1_agg\""),
      "oracle_sql.json must be complete BEFORE the query loop")
    assert(Files.readString(java.nio.file.Paths.get(s"$out/verify_errors.json")) == "{}")
    assert(new java.io.File(s"$out/provenance.json").isFile)
    val skipped = Files.readString(java.nio.file.Paths.get(s"$out/verify_skipped.json"))
    assert(skipped.contains("\"q1_agg\""), "skipped queries must be named")
  }

  test("heavyTail names resolve to real catalog queries") {
    val ghosts = Verify.heavyTail.filterNot(SparkEntry.queries.contains)
    assert(ghosts.isEmpty,
      s"Verify.heavyTail names not in the catalog (rename drift): $ghosts")
  }
}
