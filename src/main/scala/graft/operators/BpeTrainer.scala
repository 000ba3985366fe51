package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * vocabulary-induction step of an LLM data pipeline, in the shape real
  * trainers (SentencePiece, HF tokenizers) use at corpus scale:
  *
  *   1. ONE corpus-scale pass counts word frequencies (shuffle keyed on
  *      the word — the only step that touches 100 TB);
  *   2. every merge round then runs over the WORD-FREQUENCY dict (vocab
  *      scale, corpus-size-independent): count adjacent symbol pairs
  *      weighted by word freq, pick the most frequent pair, fuse it in
  *      every word's symbol sequence.
  *
  * Determinism contract (what makes the DuckDB oracle replay bit-for-bit):
  * the winning pair is (max count, then lexicographically smallest pair);
  * fusion is string `replace` on the space-joined symbol sequence with
  * sentinel-space padding — left-to-right, non-overlapping in both
  * engines, which is exactly BPE's greedy left-to-right merge rule
  * (Sennrich et al. 2016). Symbols never contain spaces (they start as
  * single non-space characters and fuse without separators), so the
  * padded `' '+pair+' '` pattern can never match across a symbol
  * boundary.
  *
  * The per-round argmax is a `limit(1).collect()` — one row, bounded by
  * contract (the same pattern as the IVF centroid collects).
  */
object BpeTrainer {

  /** Train `steps` merges over a `(word, freq)` dictionary. Returns one
    * row per merge round: (step, pair, merged, cnt). */
  def train(words: DataFrame, steps: Int): DataFrame = {
    val spark = words.sparkSession
    // symbol sequence = space-joined characters of the word
    var syms = words.select(col("word"), col("freq"),
      concat_ws(" ", split(col("word"), "")).as("s"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      // adjacent symbol pairs weighted by word frequency; words with a
      // single symbol left emit none (guard BEFORE sequence(): Spark's
      // sequence(1, 0) is the DESCENDING [1, 0], not empty)
      val best = syms
        .filter(size(split(col("s"), " ")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(split(s, ' ')) - 1), " +
            "i -> concat(element_at(split(s, ' '), i), ' ', element_at(split(s, ' '), i + 1)))"))
          .as("p"))
        .groupBy("p").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("p").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((step, pair, merged, cnt))
        // fuse the pair everywhere. Separators are DOUBLED first so each
        // match consumes one space from each neighboring separator and
        // leaves one behind: back-to-back occurrences ("a b a b") then
        // both merge in one pass, where single-space separators made the
        // first match swallow the second's leading space and skip it
        // (caught by BpeTrainerSpec). Pattern quoting is \Q..\E;
        // left-to-right non-overlapping regexp_replace — identical to
        // SQL replace() semantics, which is BPE's greedy merge order.
        val prev = syms
        val doubled = concat(lit(" "),
          regexp_replace(col("s"), " ", "  "), lit(" "))
        val fused = regexp_replace(doubled,
          java.util.regex.Pattern.quote(" " + pair.replace(" ", "  ") + " "),
          java.util.regex.Matcher.quoteReplacement(s" $merged "))
        syms = syms.withColumn("s",
            trim(regexp_replace(fused, "  ", " ")))
          .localCheckpoint(true) // k rounds: cap lineage + replay
        // the superseded round's blocks are dead the moment the new
        // checkpoint exists — release immediately (Checkpoints contract)
        if (step > 1) graft.plans.Checkpoints.release(prev)
        step += 1
      }
    }
    // the last round's symbol frame is internal — release before returning
    if (merges.nonEmpty) graft.plans.Checkpoints.release(syms)
    import spark.implicits._
    merges.toSeq.toDF("step", "pair", "merged", "cnt")
  }

  /** Apply a learned merge list to a `(word)` frame: replay the merges
    * IN ORDER over each word's character sequence with the same
    * doubled-separator greedy fusion as training, yielding the word's
    * subword symbolization. The whole chain is ONE static expression
    * tree (merges are a driver-side list, bounded by the vocab size the
    * caller trained), so it codegens and runs in a single scan — apply
    * it to the DISTINCT-word dictionary and join back to the corpus,
    * never to raw 100-TB text. Returns the input plus `syms`
    * (space-joined subword symbols). */
  def symbolize(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val chain = merges.foldLeft(
      concat_ws(" ", split(col("word"), "")): org.apache.spark.sql.Column) {
      case (s, (pair, merged)) =>
        trim(regexp_replace(
          regexp_replace(
            concat(lit(" "), regexp_replace(s, " ", "  "), lit(" ")),
            java.util.regex.Pattern.quote(" " + pair.replace(" ", "  ") + " "),
            java.util.regex.Matcher.quoteReplacement(s" $merged ")),
          "  ", " "))
    }
    words.withColumn("syms", chain)
  }

  /** Corpus-side word-frequency dictionary: the one 100-TB-scale pass. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(col(textCol), "\\s+"),
        w => w =!= lit(""))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
}
