package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-area catalogs:
  *   - [[graft.queries.Relational]] — SURVEY §2c relational surface
  *   - [[graft.queries.Annotation]] — SURVEY §2b annotation operators
  *   - [[graft.queries.Ext]] — SURVEY §2d LLM-pipeline operators
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.all ++
      graft.queries.Annotation.all ++
      graft.queries.Ext.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every oracle passes through [[materializeCtes]]: DuckDB 1.x INLINES
    * each CTE reference, so a multiply-referenced CTE (or an unrolled
    * iteration chain where step i references step i-1 twice) re-evaluates
    * its entire upstream chain per reference — measured 384 s for
    * q_dedup_semantic's oracle and 41 s for q_pagerank_convergence's at
    * sf0.01, enough to blow any comparer's time budget. Forcing
    * `AS MATERIALIZED` is semantics-preserving (same rows, evaluated
    * once) and collapses those to < 0.2 s each. */
  def oracleSql: Map[String, String] =
    (graft.queries.Relational.oracles ++
      graft.queries.Annotation.oracles ++
      graft.queries.Ext.oracles).map { case (k, v) => k -> materializeCtes(v) }

  /** Insert `AS MATERIALIZED` into every CTE definition. Matches only a
    * bare lowercase identifier at line start followed by ` AS (` — CTE
    * definitions in this catalog are one-per-line after stripMargin,
    * while body lines are indented. Recursive CTEs (which DuckDB cannot
    * materialize) are all declared with an explicit column list
    * (`reach(src, lbl) AS (`, `spine(h) AS (`) and therefore never
    * match. Idempotent: an already-materialized definition no longer
    * matches the ` AS (` suffix. */
  private[graft] def materializeCtes(sql: String): String =
    sql.replaceAll(
      "(?m)^(WITH (?:RECURSIVE )?)?([a-z][a-z_0-9]*) AS \\(",
      "$1$2 AS MATERIALIZED (")
}
