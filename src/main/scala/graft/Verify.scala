package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Run the selected catalog queries against `sfDir`, writing one parquet
    * directory per query under `outDir`, plus `oracle_sql.json` and
    * `verify_errors.json` (failure marker, advisor round 9: a throwing
    * query used to vanish from the artifact entirely, so CORRECTNESS could
    * shrink silently and still read all-green — now every failure is
    * recorded by name in the output directory itself). Returns the failure
    * map; session lifecycle stays with the caller so the spec can drive
    * this with the shared test session. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Set[String]): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
      }
      // release any frame the query checkpointed (e.g. a clustering
      // result) — 115 queries share this JVM, leaked blocks compound
      graft.plans.Checkpoints.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // provenance rides in the output dir so the CORRECTNESS artifact built
    // from it is traceable to the exact commit (round-9 advisory)
    Files.writeString(Paths.get(s"$outDir/provenance.json"),
      s"""{"sha":"${Provenance.gitSha()}","ts":"${Provenance.nowIso}","sf":${q(sfDir)}}""")
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional: extra args select a subset of queries (local iteration aid;
    // the driver always runs with exactly two args = the full catalog)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = run(spark, sfDir, outDir, only)
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
