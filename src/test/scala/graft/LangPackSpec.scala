package graft

import org.apache.spark.sql.functions._
import graft.queries.Ext.{packLang, unpackLang}

/** The order-isomorphic lang pack behind `q_prep_pipeline`'s
  * HashAggregate-friendly `min(lang)` (Ext.packLang/unpackLang).
  *
  * Round-5 advisory finding covered here: the old 7-byte BIGINT pack
  * padded in CHARACTERS, so a multi-byte UTF-8 tag could pass the byte
  * guard yet overflow `conv` and silently become NULL — min() then
  * skipped the row instead of failing, diverging from `min(lang)`.
  * The pack is now byte-level and 14 bytes wide (covers every
  * registered BCP-47 tag, e.g. `zh-Hant-TW` = 10 bytes).
  */
class LangPackSpec extends SparkSpec {
  import spark.implicits._

  private def minViaPack(langs: Seq[String]): Seq[Option[String]] = {
    val df = langs.zipWithIndex.toDF("lang", "i")
    df.agg(min(packLang(col("lang"))).as("__lc"))
      .select(unpackLang(col("__lc")).as("lang"))
      .as[Option[String]].collect().toSeq
  }

  test("round-trips and min-decodes long and non-ASCII tags (zh-Hant-TW fixture)") {
    // every case the 7-byte pack mishandled: >7 bytes, multi-byte UTF-8
    // (3 chars / 9 bytes), and mixes with plain ASCII tags
    val corpora = Seq(
      Seq("zh-Hant-TW", "en", "pt-BR"),          // long tag present, ASCII min
      Seq("zh-Hant-TW", "zh-Hans-CN"),           // min IS a >7-byte tag
      Seq("日本語", "en-US"),                     // multi-byte UTF-8 survives
      Seq("日本語", "中文"),                      // min decided by UTF-8 bytes
      Seq("en", "EN", "en-GB-oxendict"),         // case + 14-byte boundary tag
      Seq("fr"))
    for (langs <- corpora) {
      val expected = langs.min(Ordering.comparatorToOrdering(
        (a: String, b: String) => {
          // memcmp on UTF-8 bytes — both Spark's UTF8String and the
          // DuckDB oracle compare strings this way
          val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
          val n = math.min(x.length, y.length)
          var i = 0
          while (i < n && x(i) == y(i)) i += 1
          if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
        }))
      assert(minViaPack(langs) == Seq(Some(expected)),
        s"min over $langs must decode to $expected")
    }
  }

  test("order isomorphism: pack order == UTF-8 memcmp order for tag pairs") {
    val tags = Seq("en", "en-US", "en-GB-oxendict", "zh-Hant-TW", "zh",
      "日本語", "pt-BR", "a", "z-z-z-z-z-z-z", "EN")
    val pairs = for (a <- tags; b <- tags) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        (packLang(col("a")) < packLang(col("b"))).as("plt"),
        (col("a") < col("b")).as("slt"))
      .as[(String, String, Boolean, Boolean)].collect()
    for ((a, b, plt, slt) <- got)
      assert(plt == slt, s"pack order diverges from string order on ($a, $b)")
  }

  test("null lang is skipped by min exactly like min(lang); all-null stays null") {
    val df = Seq(Some("sw"), None, Some("de"), None).toDF("lang")
    val one = df.agg(min(packLang(col("lang"))).as("__lc"))
      .select(unpackLang(col("__lc")).as("lang")).as[Option[String]].head()
    assert(one.contains("de"))
    val allNull = Seq[Option[String]](None, None).toDF("lang")
      .agg(min(packLang(col("lang"))).as("__lc"))
      .select(unpackLang(col("__lc")).as("lang")).as[Option[String]].head()
    assert(allNull.isEmpty)
  }

  test("a tag beyond 14 bytes fails LOUDLY, not silently-NULL") {
    val e = intercept[Exception] {
      Seq("x-private-use-subtag-way-too-long").toDF("lang")
        .select(packLang(col("lang"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("min(packLang) aggregates in HashAggregate (fixed-width decimal buffer)") {
    val df = Seq(("a", "en"), ("a", "zh-Hant-TW")).toDF("k", "lang")
      .groupBy("k").agg(min(packLang(col("lang"))).as("__lc"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate in:\n$plan")
    assert(!plan.contains("SortAggregate"), s"SortAggregate crept in:\n$plan")
  }
}
