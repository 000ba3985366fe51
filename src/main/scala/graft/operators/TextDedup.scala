package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSig, ShingleHashes, SimHash64}

/** Library API for the deduplication family (SURVEY.md §2d) — the query
  * catalog (`graft.queries.Ext`) calls these with fixed parameters; users
  * tune them. All operators take a DataFrame with (`idCol`, `textCol`).
  *
  * Hash sources: `portable = true` uses the md5-derived families the
  * DuckDB oracle replicates bit-for-bit; `false` uses xxhash64 (cheaper,
  * production default).
  *
  * Scale shapes (the design contract at 100 TB):
  *   - canonicalization first — d exact copies would inflate pairwise
  *     candidate generation d²-fold;
  *   - signatures (`minhash_sig`, `simhash_text`, `shingle_hashes`) are
  *     ONE narrow expression per document — map-side, no shuffle;
  *   - candidate generation is always an equi-join (LSH bands, posting
  *     lists), never a theta self-join;
  *   - `maxDf` drops ubiquitous shingles from the inverted index: a
  *     shingle shared by k documents emits k(k-1)/2 pairs, so one
  *     boilerplate header shared by a million docs would otherwise emit
  *     5·10^11 pairs. Capping df bounds per-shingle work at maxDf²/2
  *     while keeping every pair whose overlap includes at least one
  *     sub-ubiquitous shingle (the standard exactness/cost trade).
  */
object TextDedup {

  /** Exact duplicate groups: one row per distinct content hash. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** One representative (min id) per distinct text. */
  def canonicalize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))

  /** Exact n-gram Jaccard similar pairs over canonicalized docs:
    * (doc_a, doc_b, n_inter, jaccard) for jaccard >= `threshold`.
    * `maxDf`: drop shingles appearing in more than this many documents
    * (0 = exact, no cap).
    *
    * Each document's shingle count rides THROUGH the postings explode
    * (`(doc_id, n)` structs in the posting lists), so |A| and |B| fall out
    * of the pair aggregate itself — the corpus is scanned once and the
    * only full-text exchange is the caller's canonicalization. Joining
    * counts back in afterwards would re-derive this whole subplan twice
    * (three scans + three text shuffles — a measured 43% regression, and
    * a scale-killer at 100 TB). */
  def jaccardPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      portable: Boolean = false,
      maxDf: Int = 0): DataFrame = {
    val docs = canon
      .select(col(idCol).as("doc_id"),
        ShingleHashes.shingle_hashes(col(textCol), portable).as("hs"))
      .filter(col("hs").isNotNull)
    val sh = docs.select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("s"))
    val posts0 = sh.groupBy("s")
      .agg(collect_set(struct(col("doc_id"), col("n"))).as("ds"))
      .filter(size(col("ds")) > 1)
    val posts = if (maxDf > 0) posts0.filter(size(col("ds")) <= maxDf) else posts0
    // pair generation as two codegen'd explodes + an inequality filter —
    // the equivalent nested-`transform` index lambda runs INTERPRETED
    // (Spark higher-order functions have no codegen) and was ~40% of the
    // query's time at 1M+ candidate pairs
    posts
      .select(explode(col("ds")).as("x"), col("ds"))
      .select(col("x"), explode(col("ds")).as("y"))
      .filter(col("y.doc_id") > col("x.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"), max(col("x.n")).as("na"), max(col("y.n")).as("nb"))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** Train/eval contamination detection: shingle-overlap pairs BETWEEN
    * two corpora — (doc_id, bench_id, n_shared) for every corpus/benchmark
    * document pair sharing at least `minOverlap` n-gram shingles. The
    * bipartite inverted-index join: candidates only from shared shingles
    * (never corpus × benchmark), map-side `shingle_hashes` signatures,
    * one equi-join on the 64-bit shingle key. The benchmark side is
    * typically tiny (an eval set) — Spark broadcasts it when it fits. */
  def crossOverlapPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      minOverlap: Int,
      portable: Boolean = false): DataFrame = {
    def postings(df: DataFrame, out: String) = df
      .select(col(idCol).as(out),
        ShingleHashes.shingle_hashes(col(textCol), portable).as("hs"))
      .filter(col("hs").isNotNull)
      .select(col(out), explode(col("hs")).as("s"))
    postings(corpus, "doc_id").join(postings(benchmark, "bench_id"), "s")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
  }

  /** MinHash/LSH candidate pairs over canonicalized docs:
    * (doc_a, doc_b, n_match, est_jaccard) for est >= `threshold`. */
  def minhashPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 32,
      bands: Int = 8,
      portable: Boolean = false): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val sig = canon
      .select(col(idCol).as("doc_id"),
        MinHashSig.minhash_sig(col(textCol), k, portable).as("sig"))
      .filter(col("sig").isNotNull)
    // band keys as STATIC per-band expressions (band count is a knob, not
    // data): a transform-over-sequence lambda would run interpreted per
    // document — Spark higher-order functions have no codegen
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1).cast("string")): _*).as("bkey"))
    }: _*)
    val banded = sig.select(col("doc_id"), col("sig"), explode(bandStructs).as("x"))
      .select(col("doc_id"), col("sig"), col("x.band").as("band"), col("x.bkey").as("bkey"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        // codegen'd signature-agreement count (zip_with/filter lambdas
        // would run interpreted per candidate pair)
        graft.functions.ArrEqCount.arr_eq_count(col("x.sig"), col("y.sig")).as("n_match"))
      .distinct()
      .withColumn("est_jaccard", round(col("n_match").cast("double") / k, 6))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_match", "est_jaccard")
  }

  /** SimHash candidate pairs over canonicalized docs:
    * (doc_a, doc_b, hamming) for hamming <= `maxHamming`. Band count and
    * width follow the pigeonhole rule: maxHamming+1 bands guarantee two
    * signatures within the distance share an exact band. */
  def simhashPairs(
      canon: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      portable: Boolean = false): DataFrame = {
    val bands = maxHamming + 1
    val width = 60 / bands
    val mask = (1L << width) - 1
    val sim = canon.select(col(idCol).as("doc_id"),
      SimHash64.simhash_text(col(textCol), portable).as("simhash"))
    // static per-band expressions — see the minhash banding note
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("bkey"))
    }: _*)
    val banded = sim.select(col("doc_id"), col("simhash"), explode(bandStructs).as("x"))
      .select(col("doc_id"), col("simhash"), col("x.band").as("band"), col("x.bkey").as("bkey"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
