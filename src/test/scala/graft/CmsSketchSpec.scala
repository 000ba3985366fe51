package graft

import org.apache.spark.sql.functions._
import graft.functions.CmsSketch

/** Contract for the re-aggregatable count-min union (q_cms_union's
  * operator): unioning per-part sketches must be indistinguishable from
  * sketching the whole corpus at once — CMS tables add, so with a fixed
  * seed the merged sketch is BYTE-identical, not just estimate-close. */
class CmsSketchSpec extends SparkSpec {

  private val agg = "count_min_sketch(v, 0.001d, 0.99d, 42)"

  test("union of per-part sketches is byte-identical to the whole-corpus sketch") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 7, i.toLong % 13)).toDF("part", "v")
    val whole = df.agg(expr(agg).as("sk")).head.getAs[Array[Byte]]("sk")
    val merged = df.groupBy("part").agg(expr(agg).as("sk"))
      .agg(CmsSketch.cms_union(col("sk")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("merged estimates are never under the exact count") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 3, i.toLong % 11)).toDF("part", "v")
    val merged = df.groupBy("part").agg(expr(agg).as("sk"))
      .agg(CmsSketch.cms_union(col("sk")).as("sk"))
    val exact = df.groupBy("v").agg(count(lit(1)).as("exact"))
    val bad = exact.crossJoin(merged)
      .withColumn("est", CmsSketch.cms_estimate_long(col("sk"), col("v")))
      .filter(col("est") < col("exact"))
      .count()
    assert(bad == 0L)
  }

  test("cms_union skips nulls and returns null on all-null input") {
    import spark.implicits._
    val one = Seq(1L).toDF("v").agg(expr(agg).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val df = Seq(Option(one), None, Option(one)).toDF("sk")
    val merged = df.agg(CmsSketch.cms_union(col("sk")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    // two identical sketches merge to doubled counts, null skipped
    val m = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(merged))
    assert(m.estimateCount(java.lang.Long.valueOf(1L)) == 2L)
    val allNull = Seq[Option[Array[Byte]]](None, None).toDF("sk")
      .agg(CmsSketch.cms_union(col("sk")).as("sk")).head
    assert(allNull.isNullAt(0))
  }
}
