package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeJsonMap(path: String, m: Iterable[(String, String)]): Unit =
    Files.writeString(Paths.get(path),
      m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))

  /** Queries that pay real wall-clock beyond their data size (streaming
    * micro-batch replays, multi-job e2e pipelines, iterative graph audits
    * with checkpoint I/O). They run LAST so that any interruption — a
    * driver timeout, the `budgetSec` cut — costs these few rows, never the
    * broad catalog. Membership is advisory (a name not in the catalog is
    * ignored); ordering has zero effect on results. */
  private[graft] val heavyTail: Seq[String] = Seq(
    "q_pipeline_e2e", "q_curation_e2e", "q_prep_pipeline",
    "q_pagerank", "q_pagerank_convergence", "q_cc_convergence",
    "q_dedup_clusters_star", "q_mmr_rerank", "q_bitext_mine",
    "q_stream_join_replay", "q_stream_neardup_replay",
    "q_stream_session_replay", "q_stream_tumbling_replay",
    "q_stream_segment_replay", "q_stream_topk_replay",
    "q_stream_sliding_replay")

  /** Run the selected catalog queries against `sfDir`, writing one parquet
    * directory per query under `outDir`, plus `oracle_sql.json` and
    * `verify_errors.json` (failure marker, advisor round 9: a throwing
    * query used to vanish from the artifact entirely, so CORRECTNESS could
    * shrink silently and still read all-green — now every failure is
    * recorded by name in the output directory itself).
    *
    * PARTIAL-PROOF CONTRACT (round-14 failure): the driver's round-14 run
    * died mid-loop, and because oracle_sql.json was written only AFTER the
    * full query loop, the compare found no oracles and CORRECTNESS_r14
    * shipped EMPTY — a whole round with zero official correctness signal.
    * Everything the driver needs besides the per-query parquet is static,
    * so it is all written BEFORE the first query runs, and the error
    * marker is rewritten after every failure. Any kill or timeout now
    * costs the unfinished tail of the catalog, never the round.
    *
    * `budgetSec`: once this much wall time has elapsed, no NEW query is
    * launched; the remainder is listed in `verify_skipped.json` (and
    * stderr) so a budgeted run is self-describing. Default: unlimited.
    *
    * Returns the failure map; session lifecycle stays with the caller so
    * the spec can drive this with the shared test session. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Set[String], budgetSec: Double = Double.MaxValue): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // ---- partial-proof: all static artifacts land before query #1 ----
    writeJsonMap(s"$outDir/oracle_sql.json", SparkEntry.oracleSql)
    writeJsonMap(s"$outDir/verify_errors.json", errors)
    Files.writeString(Paths.get(s"$outDir/provenance.json"),
      s"""{"sha":"${Provenance.gitSha()}","ts":"${Provenance.nowIso}","sf":${q(sfDir)}}""")
    val t0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - t0) / 1e9
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }.toSeq
    // heavy wall-clock rows last: an interruption truncates the tail
    val ordered = selected.sortBy { case (n, _) =>
      val i = heavyTail.indexOf(n); if (i < 0) -1 else i }
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val timing = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    ordered.foreach { case (name, fn) =>
      if (elapsedSec > budgetSec) skipped += name
      else {
        val q0 = System.nanoTime()
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
          writeJsonMap(s"$outDir/verify_errors.json", errors)
        }
        // release any frame the query checkpointed (e.g. a clustering
        // result) — 250 queries share this JVM, leaked blocks compound
        graft.plans.Checkpoints.releaseAll(spark)
        // per-query elapsed: the round-14 postmortem had NO way to tell
        // which rows made an 11-minute loop slow — now the log does
        timing(name) = (System.nanoTime() - q0) / 1e9
        println(f"[verify] $name ${timing(name)}%.2fs (total ${elapsedSec}%.0fs)")
      }
    }
    // machine-readable profile of the loop itself, next to the artifacts
    // it explains (what the round-14 postmortem lacked)
    writeJsonMap(s"$outDir/verify_timing.json",
      timing.map { case (k, v) => k -> f"$v%.3f" })
    if (skipped.nonEmpty) {
      writeJsonMap(s"$outDir/verify_skipped.json",
        skipped.map(_ -> "SKIPPED: wall-clock budget exhausted"))
      System.err.println(s"[verify] budget ${budgetSec}s exhausted at " +
        f"$elapsedSec%.0fs — skipped ${skipped.size} queries: ${skipped.mkString(", ")}")
    }
    println(f"[verify] total wall ${elapsedSec}%.1fs, " +
      s"${ordered.size - skipped.size - errors.size} ok / ${errors.size} failed" +
      (if (skipped.nonEmpty) s" / ${skipped.size} skipped" else ""))
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    val budget = flags.collectFirst {
      case f if f.startsWith("--budget-sec=") => f.stripPrefix("--budget-sec=").toDouble
    }.getOrElse(Double.MaxValue)
    val badFlags = flags.filterNot(_.startsWith("--budget-sec="))
    if (badFlags.nonEmpty) {
      System.err.println(s"[verify] unknown flag(s): ${badFlags.mkString(", ")} — " +
        "valid: --budget-sec=N"); sys.exit(2)
    }
    val sfDir = pos(0); val outDir = pos(1)
    // optional: extra args select a subset of queries (local iteration aid;
    // the driver always runs with exactly two args = the full catalog)
    val only = pos.drop(2).toSet
    // default to the machine, capped: the round-14 loop took ~11 min at 16
    // cpus, and the old default of 4 would have put the full catalog well
    // past a plausible driver timeout — verify wall time is a correctness-
    // artifact risk, not just a convenience
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = run(spark, sfDir, outDir, only, budget)
    // rc stays 0 even on failures: the driver must still run the DuckDB
    // compare on the queries that DID produce output — one regression
    // should cost one row, not the round.
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    val attempted = SparkEntry.queries.count { case (n, _) => only.isEmpty || only(n) }
    println(s"[verify] succeeded ${attempted - errors.size}/$attempted")
    spark.stop()
  }
}
