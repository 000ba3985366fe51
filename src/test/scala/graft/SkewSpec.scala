package graft

import graft.functions.Skew

class SkewSpec extends SparkSpec {

  test("salted join equals plain join on a skewed key") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k", "id AS v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed SMJ partition at runtime (skew=true)") {
    // the adaptive complement to explicit salting: when the hot key's
    // partition blows past the skew threshold, OptimizeSkewedJoin splits
    // it into subpartitions and replicates the matching side — no query
    // rewrite needed. Thresholds are scaled down so local data trips the
    // same code path a 100-TB skewed join would.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // ~200k rows, 95% on one hot key; both sides big enough for SMJ
      val big = spark.range(200000)
        .selectExpr("CASE WHEN id % 20 < 19 THEN 0 ELSE id % 7 END AS k",
          "id AS v", "repeat('x', 16) AS pad")
      val right = spark.range(50000)
        .selectExpr("id % 7 AS k", "id AS w")
      // keyless aggregate: a groupBy(k) downstream would REQUIRE
      // hashpartitioning on k and suppress the split (AQE refuses to
      // add an extra shuffle unless forceOptimizeSkewedJoin)
      val j = big.join(right, "k").agg(org.apache.spark.sql.functions.sum("v"))
      j.collect() // AQE finalizes the plan only after execution
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected a runtime skew-split SMJ:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted two-phase sum equals plain groupBy sum") {
    val df = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k", "CAST(id AS DOUBLE) AS v")
    val plain = df.groupBy("k").sum("v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSumByKey(df, "k", "v", salts = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    for ((k, v) <- plain) assert(math.abs(salted(k) - v) < 1e-6, s"key $k")
  }
}
