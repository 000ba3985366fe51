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
