package graft

import graft.operators.BpeTrainer

/** Library contracts of the BPE trainer beyond the oracle-replayed
  * catalog query: greedy-merge semantics, tie-breaking, exhaustion. */
class BpeTrainerSpec extends SparkSpec {

  private def df(rows: (String, Long)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("word", "freq")
  }

  private def merges(rows: Seq[(String, Long)], steps: Int) =
    BpeTrainer.train(df(rows: _*), steps).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("greedy left-to-right: overlapping pair instances don't double-merge") {
    // "aaa" = a a a: two "a a" instances counted, but fusion is greedy
    // left-to-right, so round 1 yields "aa a" (not "a aa" and not "aaa")
    val m = merges(Seq(("aaa", 3L)), 2)
    assert(m(0) == ((1, "a a", "aa", 6L)), s"round 1: ${m(0)}")
    assert(m(1) == ((2, "aa a", "aaa", 3L)), s"round 2 must see 'aa a': ${m(1)}")
  }

  test("counts weight by word frequency and ties break lexicographically") {
    // equal weighted counts (1 each) -> lexicographically smaller pair
    val tie = merges(Seq(("bc", 1L), ("ad", 1L)), 1)
    assert(tie(0) == ((1, "a d", "ad", 1L)), s"tie-break: ${tie(0)}")
    // frequency outweighs occurrence count: "xy" freq 5 beats the two
    // 1-freq words sharing "a b"
    val m = merges(Seq(("xy", 5L), ("ab", 1L), ("abc", 1L)), 1)
    assert(m(0) == ((1, "x y", "xy", 5L)), s"weighted argmax: ${m(0)}")
  }

  test("back-to-back occurrences both merge in one round (true BPE greedy)") {
    // "abab" = a b a b: round 1 must fuse BOTH "a b" occurrences
    // (-> "ab ab"), not alternate ones — then round 2 composes "abab"
    val m = merges(Seq(("abab", 10L)), 3)
    assert(m.toSeq == Seq(
      (1, "a b", "ab", 20L),
      (2, "ab ab", "abab", 10L)), s"got ${m.toSeq}")
  }

  test("exhaustion: single-symbol dictionary stops early and cleanly") {
    assert(merges(Seq(("a", 7L), ("b", 1L)), 3).isEmpty)
  }

  test("symbolize replays the merge list in order, including on unseen words") {
    val spark0 = spark
    import spark0.implicits._
    val m = Seq(("a b", "ab"), ("ab ab", "abab"))
    val out = BpeTrainer.symbolize(
        Seq("abab", "aba", "ba", "x").toDF("word"), m)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map(
      "abab" -> "abab",  // both merges fire
      "aba" -> "ab a",   // greedy left-to-right, the trailing a stays
      "ba" -> "b a",     // reversed pair never merges
      "x" -> "x"))       // single symbol untouched
  }

  test("wordFreq is the corpus word count") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq("a b a", "b  c").toDF("text")
    val wf = BpeTrainer.wordFreq(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }
}
