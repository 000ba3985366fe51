package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4.2 / the 100-TB contract).
  *
  * A shuffle join on a key with one hot value puts the whole hot partition
  * on one task. Salting splits each hot key into `salts` sub-keys: the big
  * side gets a random salt per row, the small side is replicated once per
  * salt value, and the join key becomes (key, salt) — same result, `salts`×
  * the parallelism on the hot key, `salts`× replication of the (small)
  * build side. AQE's skew-join handles sort-merge cases adaptively; salting
  * is the explicit form that also works for hash joins and aggregations.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. Result is
    * row-identical to `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: `df.groupBy(key).agg(sum(valueCol))`
    * with the first phase keyed on (key, salt) so a hot key spreads over
    * the cluster before the (tiny) second phase combines per-salt partials. */
  def saltedSumByKey(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("_salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }
}
