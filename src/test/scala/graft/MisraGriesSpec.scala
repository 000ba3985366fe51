package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg.misra_gries

/** Contract for the mergeable Misra–Gries summary (q_heavy_hitters'
  * sketch pass): the candidate set must be a SUPERSET of every item with
  * true count > total/(k+1) regardless of partitioning (the in-partition
  * eviction path AND the merge-time subtraction path), and the full
  * sketch→exact-verify pattern must yield a partitioning-independent
  * result. The sketch alone is allowed to over-report candidates — the
  * exact re-count is what the catalog query emits. */
class MisraGriesSpec extends SparkSpec {

  // 500×alpha + 300×beta + 400 singletons: heavy items far above any
  // threshold the specs use, a long tail to force eviction at small k
  private def corpus: Seq[String] =
    Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++
      (1 to 400).map(i => f"tail$i%04d")

  private def sketch(df: DataFrame, k: Int): (Long, Seq[String]) = {
    val r = df.agg(misra_gries(col("s"), k).as("mg"))
      .select(col("mg.total"), col("mg.candidates")).head()
    (r.getLong(0), r.getSeq[String](1))
  }

  test("candidates are a superset of true heavy items under in-partition eviction") {
    import spark.implicits._
    // k=10 << 402 distinct: the decrement-all path fires constantly.
    // Guarantee: anything with count > 1200/11 ≈ 109 survives.
    val (total, cands) = sketch(corpus.toDF("s").repartition(1), k = 10)
    assert(total == 1200L)
    assert(cands.size <= 10)
    assert(cands.contains("alpha") && cands.contains("beta"))
  }

  test("candidates survive merges across many partitions (subtraction rule)") {
    import spark.implicits._
    val (total, cands) = sketch(corpus.toDF("s").repartition(13), k = 10)
    assert(total == 1200L)
    assert(cands.size <= 10)
    assert(cands.contains("alpha") && cands.contains("beta"))
  }

  test("k >= distinct count keeps every item, sorted") {
    import spark.implicits._
    val data = Seq("b", "a", "c", "a", "b", "a")
    val (total, cands) = sketch(data.toDF("s").repartition(3), k = 100)
    assert(total == 6L)
    assert(cands == Seq("a", "b", "c"))
  }

  test("nulls are skipped and not counted in total") {
    import spark.implicits._
    val (total, cands) =
      sketch(Seq(Option("x"), None, Option("x"), None).toDF("s"), k = 4)
    assert(total == 2L)
    assert(cands == Seq("x"))
  }

  test("sketch + exact verify is independent of partitioning") {
    import spark.implicits._
    // the q_heavy_hitters shape at phi=20 (support 5%), k=40 >= phi
    def verified(parts: Int): Seq[(String, Long)] = {
      val df = corpus.toDF("s").repartition(parts)
      val (total, cands) = sketch(df, k = 40)
      df.filter(col("s").isInCollection(cands))
        .groupBy("s").agg(count(lit(1)).as("c"))
        .filter(col("c") * 20 >= total)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    }
    val one = verified(1)
    assert(one == Seq(("alpha", 500L), ("beta", 300L)))
    assert(verified(7) == one)
    assert(verified(32) == one)
  }
}
