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

  test("bucketed record store: archive lookup shuffles only the incoming batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val store = graft.sources.Sources.fromTextColumn(docs, "text")
    Bucketing.writeBucketed(store.toDF(), "record_store", s"$dir/store", 4, Seq("identifier"))
    val incoming = graft.sources.Sources.fromTextColumn(docs.limit(50), "text")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val stored = spark.table("record_store").as[graft.model.Record]
      val merged = graft.sources.Sources.lookup(incoming, stored)
      merged.collect()
      val plan = merged.queryExecution.executedPlan.toString
      // the store scan must be bucketed, and the branch between the join's
      // store-side Sort and the store FileScan must contain no Exchange —
      // the archive never reshuffles, only the incoming batch does
      assert(plan.contains("Bucketed: true"), s"store scan not bucketed:\n${plan.take(900)}")
      val scanIdx = plan.indexOf("spark_catalog.default.record_store")
      assert(scanIdx > 0, "store scan not found in plan")
      val sortIdx = plan.lastIndexOf("Sort [", scanIdx)
      assert(sortIdx > 0 && !plan.substring(sortIdx, scanIdx).contains("Exchange"),
        s"store side reshuffled:\n${plan.substring(sortIdx, scanIdx)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS record_store")
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
