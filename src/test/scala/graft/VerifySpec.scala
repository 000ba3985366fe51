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
      Set("q1_agg", "q_ts_convention")).errors
    assert(errors.isEmpty, s"expected no failures, got $errors")
    assert(new java.io.File(s"$out/q1_agg").isDirectory)
    assert(new java.io.File(s"$out/q_ts_convention").isDirectory)
    assert(Files.readString(java.nio.file.Paths.get(s"$out/verify_errors.json")) == "{}")
    assert(spark.read.parquet(s"$out/q1_agg").count() > 0)
  }

  test("a throwing query is recorded by name in verify_errors.json") {
    val out = Files.createTempDirectory("graft-verify-err").toString
    // a nonexistent sfDir makes the scan throw for every selected query
    val errors = Verify.run(spark, "/no/such/testdata", out, Set("q1_agg")).errors
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
    val result = Verify.run(spark, "/root/testdata/sf0.001", out,
      Set("q1_agg"), budgetSec = -1.0)
    assert(result.errors.isEmpty)
    assert(result.skipped == Seq("q1_agg"),
      "run() must return the budget-skipped names directly")
    assert(!new java.io.File(s"$out/q1_agg").exists, "budget -1 must skip all")
    val oracle = Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    assert(oracle.contains("\"q1_agg\""),
      "oracle_sql.json must be complete BEFORE the query loop")
    assert(Files.readString(java.nio.file.Paths.get(s"$out/verify_errors.json")) == "{}")
    assert(new java.io.File(s"$out/provenance.json").isFile)
    val skipped = Files.readString(java.nio.file.Paths.get(s"$out/verify_skipped.json"))
    assert(skipped.contains("\"q1_agg\""), "skipped queries must be named")
  }

  test("parallel broad phase produces the same artifacts as sequential") {
    // The driver path now runs the broad catalog on worker threads; the
    // contract is identical to sequential: parquet per query, complete
    // correctness_self.json row counts, complete verify_timing.json.
    val out = Files.createTempDirectory("graft-verify-par").toString
    val names = Set("q1_agg", "q_ts_convention", "q_join_semi", "q_sort_limit")
    val errors = Verify.run(spark, "/root/testdata/sf0.001", out, names,
      parallelism = 4).errors
    assert(errors.isEmpty, s"expected no failures, got $errors")
    names.foreach { n =>
      assert(new java.io.File(s"$out/$n").isDirectory, s"missing parquet for $n")
    }
    val self = Files.readString(java.nio.file.Paths.get(s"$out/correctness_self.json"))
    names.foreach { n =>
      assert(self.contains("\"" + n + "\""), s"correctness_self.json missing $n")
    }
    // self-reported row counts equal what the parquet actually holds
    val q1Rows = spark.read.parquet(s"$out/q1_agg").count()
    assert(self.contains(s""""q1_agg": "$q1Rows""""),
      s"self summary must carry q1_agg's true row count $q1Rows, got: $self")
    val timing = Files.readString(java.nio.file.Paths.get(s"$out/verify_timing.json"))
    names.foreach(n => assert(timing.contains("\"" + n + "\"")))
  }

  test("budget resolution: driver-style defaults to 150s, everything else unlimited") {
    // driver contract = no flags, exactly two positional args
    assert(Verify.resolveBudget(Nil, Seq("sf", "out"), Map.empty)
      == Verify.driverDefaultBudgetSec)
    // subset invocation (3+ positional): unlimited
    assert(Verify.resolveBudget(Nil, Seq("sf", "out", "q1_agg"), Map.empty)
      == Double.MaxValue)
    // explicit flag wins over everything
    assert(Verify.resolveBudget(Seq("--budget-sec=7"), Seq("sf", "out"),
      Map("SPARK_GRAFT_VERIFY_BUDGET_SEC" -> "9")) == 7.0)
    // env wins over the default
    assert(Verify.resolveBudget(Nil, Seq("sf", "out"),
      Map("SPARK_GRAFT_VERIFY_BUDGET_SEC" -> "9")) == 9.0)
    // a flagged two-arg invocation is NOT driver-style
    assert(Verify.resolveBudget(Seq("--par=4"), Seq("sf", "out"), Map.empty)
      == Double.MaxValue)
    // "none" is the documented opt-out for slow boxes (flag and env)
    assert(Verify.resolveBudget(Seq("--budget-sec=none"), Seq("sf", "out"),
      Map.empty) == Double.MaxValue)
    assert(Verify.resolveBudget(Nil, Seq("sf", "out"),
      Map("SPARK_GRAFT_VERIFY_BUDGET_SEC" -> "none")) == Double.MaxValue)
  }

  test("parallelism resolution: flag > env > max(2, cpus/4)") {
    assert(Verify.resolvePar(Seq("--par=6"), 32,
      Map("SPARK_GRAFT_VERIFY_PAR" -> "3")) == 6)
    assert(Verify.resolvePar(Nil, 32, Map("SPARK_GRAFT_VERIFY_PAR" -> "3")) == 3)
    assert(Verify.resolvePar(Nil, 32, Map.empty) == 8)
    assert(Verify.resolvePar(Nil, 4, Map.empty) == 2, "floor of 2 at small cpus")
  }

  test("heavyTail names resolve to real catalog queries") {
    val ghosts = Verify.heavyTail.filterNot(SparkEntry.queries.contains)
    assert(ghosts.isEmpty,
      s"Verify.heavyTail names not in the catalog (rename drift): $ghosts")
  }
}
