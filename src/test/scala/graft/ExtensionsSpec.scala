package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide injection route: a session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` must expose the
  * custom expressions from plain SQL with no explicit register() call —
  * this is how a deployed cluster gets them (spark-defaults.conf). */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects the custom functions") {
    // One JVM allows one SparkContext, so when the shared TestSpark
    // session exists getOrCreate returns it and the extensions config is
    // ignored — in that case exercise the injector directly (same code
    // path GraftExtensions.apply runs at session build).
    val fresh = SparkSession.getActiveSession.isEmpty &&
      SparkSession.getDefaultSession.isEmpty
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!fresh) graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT rolling_hash('abc') AS a, vec_dot(array(1D, 2D), array(3D, 4D)) AS b").head()
    val expected = "abc".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => h * graft.functions.RollingHash.Base + (b & 0xffL))
    assert(r.getLong(0) == expected && r.getDouble(1) == 11.0)
  }
}
