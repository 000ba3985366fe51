package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed tables must deliver the co-located join: zero exchanges in the
  * physical plan when both sides are bucketed on the join key with equal
  * bucket counts — the write-time shuffle replaces every query-time one. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs with no exchange and matches the shuffled join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    Bucketing.writeBucketed(li, "li_bucketed", s"$dir/li", 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_bucketed", s"$dir/o", 4, Seq("o_orderkey"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      j.collect() // finalize the adaptive plan before inspecting it
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, got:\n${plan.take(1200)}")
      assert(j.count() ==
        li.join(o, li("l_orderkey") === o("o_orderkey")).count(),
        "bucketed join must return exactly the shuffled join's rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_partitioned").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("status") === "O")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("status"),
      s"partition pruning lost:\n${plan.take(800)}")
  }
}
