package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScalableWindows

/** The distributed global row_number/ntile must equal the serial
  * Window.orderBy forms row-for-row, while keeping the big side out of a
  * single-partition exchange. */
class ScalableWindowsSpec extends SparkSpec {

  private def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("descending order keys are rejected up front (buckets ascend)") {
    import org.apache.spark.sql.functions.col
    val e = intercept[IllegalArgumentException] {
      graft.operators.ScalableWindows.withGlobalRank(
        orders, Seq(col("o_totalprice").desc), "rk", partitions = 4)
    }
    assert(e.getMessage.contains("descending"), e.getMessage)
    // the serial fast path rejects identically: correctness must not
    // depend on which side of the size threshold the input lands
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.ScalableWindows.withGlobalRowNumber(
        orders.limit(5), Seq(col("o_totalprice").desc), "rn")
    }
    assert(e2.getMessage.contains("descending"))
  }

  test("global row_number matches the serial window exactly") {
    val serial = orders.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
      .select("o_orderkey", "rn")
    val scalable = ScalableWindows.withGlobalRowNumber(
      orders, Seq(col("o_totalprice"), col("o_orderkey")), "rn", partitions = 4)
      .select("o_orderkey", "rn")
    assert(scalable.exceptAll(serial).isEmpty && serial.exceptAll(scalable).isEmpty)
  }

  test("global ntile matches the serial window for bucket counts that divide unevenly") {
    for (b <- Seq(4, 7, 100000)) { // 100000 > row count exercises the q=0 branch
      val serial = orders.withColumn("nt",
        ntile(b).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
        .select("o_orderkey", "nt")
      val scalable = ScalableWindows.withGlobalNtile(
        orders, b, Seq(col("o_totalprice"), col("o_orderkey")), "nt", partitions = 4)
        .select("o_orderkey", "nt")
      assert(scalable.exceptAll(serial).isEmpty && serial.exceptAll(scalable).isEmpty,
        s"ntile($b) diverged from the serial window")
    }
  }

  test("global running sum matches the serial window exactly (forced distributed)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val serial = orders.withColumn("cum",
      sum(col("o_totalprice").cast("decimal(18,4)")).over(
        Window.orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("o_orderkey", "cum").collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val dist = graft.operators.ScalableWindows.withGlobalRunningSum(
        orders, col("o_totalprice").cast("decimal(18,4)"),
        Seq(col("o_orderkey")), "cum", partitions = 8)
      .select("o_orderkey", "cum").collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(dist.size == serial.size)
    assert(dist == serial, "decimal prefix sums must agree bit-for-bit")
  }

  test("global running sum: null values match the serial window for every prefix pattern") {
    // the round-4 advice finding: a row whose in-bucket prefix is all-NULL
    // must still inherit prior buckets' sums, and a row whose ENTIRE
    // prefix is null must be NULL (not 0) — exactly SUM's null-skipping.
    // Rows 0..9 with values null,null,1,null,2,null,... put all-null
    // prefixes in the first bucket(s) of the 8-partition distributed path.
    import spark.implicits._
    val df = (0L until 10L).map { i =>
      (i, if (i < 2 || i % 2 == 1) None else Some(i))
    }.toDF("k", "x")
    val serial = df.withColumn("cum",
      sum(col("x")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val dist = ScalableWindows.withGlobalRunningSum(
        df, col("x"), Seq(col("k")), "cum", partitions = 8)
      .select("k", "cum").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(dist == serial,
      s"null handling diverged: serial=$serial dist=$dist")
    assert(serial(0L).isEmpty && serial(1L).isEmpty,
      "fixture must exercise the all-null global prefix (expects NULL)")
  }

  test("global rank and dense_rank match the serial window on heavy ties") {
    // l_quantity has ~50 distinct values over the whole table — every rank
    // is a tie group, and tie groups straddle quantile boundaries unless
    // the bucketing keeps equal keys together (the correctness argument)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val serial = li
      .withColumn("rk", rank().over(Window.orderBy(col("l_quantity"))))
      .withColumn("drk", dense_rank().over(Window.orderBy(col("l_quantity"))))
      .select("l_orderkey", "l_linenumber", "rk", "drk")
    val scalable = ScalableWindows.withGlobalDenseRank(
        ScalableWindows.withGlobalRank(li, Seq(col("l_quantity")), "rk", partitions = 4),
        Seq(col("l_quantity")), "drk", partitions = 4)
      .select("l_orderkey", "l_linenumber", "rk", "drk")
    assert(scalable.exceptAll(serial).isEmpty && serial.exceptAll(scalable).isEmpty)
    // and the fused one-pass form computes the same numbers
    val fused = ScalableWindows.withGlobalRankAndDenseRank(
        li, Seq(col("l_quantity")), "rk", "drk", partitions = 4)
      .select("l_orderkey", "l_linenumber", "rk", "drk")
    assert(fused.exceptAll(serial).isEmpty && serial.exceptAll(fused).isEmpty)
  }

  test("global percent_rank/cume_dist match the serial window bit-for-bit") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val w = Window.orderBy(col("l_quantity"))
    val serial = li.withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select("l_orderkey", "l_linenumber", "pr", "cd")
    val scalable = ScalableWindows.withGlobalPercentRankAndCumeDist(
        li, Seq(col("l_quantity")), "pr", "cd", partitions = 4)
      .select("l_orderkey", "l_linenumber", "pr", "cd")
    // bit-for-bit: both divide the same two integers, no rounding slack
    assert(scalable.exceptAll(serial).isEmpty && serial.exceptAll(scalable).isEmpty)
  }

  test("distributed path survives degenerate key distributions") {
    val s = spark
    import s.implicits._
    // all-equal keys: every bound collapses to one value -> 1 tie group
    val same = (1L to 100L).map(i => (i, 5.0)).toDF("id", "k")
    val rkSame = ScalableWindows.withGlobalRankAndDenseRank(
      same, Seq(col("k")), "rk", "drk", partitions = 8).collect()
    assert(rkSame.forall(r => r.getInt(2) == 1 && r.getInt(3) == 1))
    val rnSame = ScalableWindows.withGlobalRowNumber(
        same, Seq(col("k"), col("id")), "rn", partitions = 8)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert((1L to 100L).forall(i => rnSame(i) == i.toInt))
    // single row, and fewer rows than requested partitions
    val tiny = Seq((1L, 3.0), (2L, 1.0)).toDF("id", "k")
    val rnTiny = ScalableWindows.withGlobalRowNumber(
        tiny, Seq(col("k"), col("id")), "rn", partitions = 16)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(rnTiny == Map(2L -> 1, 1L -> 2))
    val pct1 = ScalableWindows.withGlobalPercentRankAndCumeDist(
      Seq((1L, 9.9)).toDF("id", "k"), Seq(col("k")), "pr", "cd", partitions = 4).head()
    assert(pct1.getDouble(2) == 0.0 && pct1.getDouble(3) == 1.0,
      "single-row percent_rank/cume_dist must be 0 and 1")
  }

  test("working columns never clobber user columns with the same names") {
    val tricky = orders
      .withColumn("__bkt", lit("keep me")).withColumn("__off", lit(7))
    val out = ScalableWindows.withGlobalRowNumber(
      tricky, Seq(col("o_totalprice"), col("o_orderkey")), "rn", partitions = 4)
    assert(out.columns.count(_ == "__bkt") == 1)
    assert(out.select("__bkt").distinct().collect().map(_.getString(0)).toSeq == Seq("keep me"))
    assert(out.select("__off").distinct().head().getInt(0) == 7)
    val serial = tricky.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    assert(out.select("o_orderkey", "rn")
      .exceptAll(serial.select("o_orderkey", "rn")).isEmpty)
  }

  test("the corpus-sized side never passes through a single-partition exchange") {
    val plan = ScalableWindows.withGlobalRowNumber(
      orders, Seq(col("o_totalprice"), col("o_orderkey")), "rn", partitions = 4)
      .queryExecution.executedPlan.toString
    // the only SinglePartition allowed is the per-bucket-counts side
    // (<= shuffle.partitions rows); the data side must hash-partition on
    // the deterministic quantile bucket
    assert(plan.contains("hashpartitioning(__bkt"), s"bucket partitioning missing:\n${plan.take(600)}")
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1, s"data side serialized:\n${plan.take(1200)}")
  }
}
