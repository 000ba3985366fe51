package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingle hashes of a document in one narrow pass:
  * split on whitespace (Java `split("\\s+", -1)`, Spark's `split`
  * semantics), join 3-token windows with spaces, hash each (portable
  * md5-prefix-60 for the oracle gate / xxhash64 seed 42 in production —
  * the same switch as MinHashSig), and dedup. Returns a sorted
  * ARRAY<BIGINT>, or null for documents under 3 tokens.
  *
  * This is the input of the Jaccard inverted index: one projection feeds
  * both the per-doc distinct count (`size`) and the posting explode, so
  * the interpreted transform/concat_ws/slice lambda pipeline and its
  * duplicated evaluation disappear.
  */
case class ShingleHashes(child: Expression, portable: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.evalShingles(input.asInstanceOf[UTF8String], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val arrayData = classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $arrayData ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.ShingleHashes.evalShingles(${c.value}, $portable);
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Named `evalShingles`, not `eval` (static-forwarder collision with
    * `Expression.eval(InternalRow)` breaks codegen otherwise). */
  def evalShingles(text: UTF8String, portable: Boolean): GenericArrayData = {
    val w = text.toString.split("\\s+", -1)
    if (w.length < 3) return null
    val set = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + 2 < w.length) {
      sb.setLength(0)
      sb.append(w(i)).append(' ').append(w(i + 1)).append(' ').append(w(i + 2))
      val shingle = sb.toString
      val h =
        if (portable) md5Prefix60(shingle)
        else XxHash64Function.hash(
          UTF8String.fromString(shingle), StringType, 42L)
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a long — identical to
    * `CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT)`. */
  private[functions] def md5Prefix60(s: String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >> 4)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def shingle_hashes(c: Column, portable: Boolean): Column =
    column(ShingleHashes(expression(c), portable))
}

/** POSITIONAL n-gram hashes of a document in one narrow codegen'd pass:
  * split on whitespace, drop empty tokens, join every n-token window with
  * spaces, hash each with the portable md5-prefix-60. Array index i is
  * the gram's 0-based position over the FILTERED token stream, so
  * `posexplode` yields exactly the (position, gram-hash) pairs the
  * boilerplate inverted index needs — replacing a per-doc sort window
  * with four `lead()`s (a corpus-wide exchange + sort) by a map-side
  * projection. Documents under n tokens yield an EMPTY array (posexplode
  * drops them; the doc still rides the token side of the join). */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram width must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    GramHashes.evalGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashes.evalGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  /** Named `evalGrams`, not `eval` — static-forwarder collision note in
    * [[MinWindowHash]]. */
  def evalGrams(text: UTF8String, n: Int): GenericArrayData = {
    val w = SplitWords.words(text)
    if (w.length < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](w.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n - 1 < w.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      out(i) = ShingleHashes.md5Prefix60(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def gram_hashes(c: Column, n: Int): Column = column(GramHashes(expression(c), n))
}

/** POSITIONAL n-gram TEXTS (space-joined) in one narrow codegen'd pass —
  * [[GramHashes]] for consumers that need the gram string itself (top-k
  * bigram reports), replacing the per-doc lead() window (a corpus-wide
  * exchange + sort over the exploded token stream) with a map-side
  * projection. Documents under n tokens yield an EMPTY array. */
case class GramTexts(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram width must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gram_texts"

  override def nullSafeEval(input: Any): Any =
    GramTexts.evalGramTexts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramTexts.evalGramTexts($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramTexts =
    copy(child = newChild)
}

object GramTexts {
  /** Named `evalGramTexts`, not `eval` — static-forwarder collision note
    * in [[MinWindowHash]]. */
  def evalGramTexts(text: UTF8String, n: Int): GenericArrayData = {
    val w = SplitWords.words(text)
    if (w.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](w.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n - 1 < w.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def gram_texts(c: Column, n: Int): Column = column(GramTexts(expression(c), n))
}

/** Forward SKIP-GRAM (word, context) pairs at token distances 1..maxDist
  * in one codegen'd pass: for non-empty tokens w(0..L-1), emits
  * struct(w(i), w(i+d)) for every i and d <= maxDist with i+d < L — the
  * word2vec training-pair generator. The per-doc lead()-window form of
  * this pays a corpus-wide exchange + sort over the exploded token
  * stream; this is a map-side projection (the symmetric reverse
  * direction stays a cheap union in the caller, NOT baked in, so callers
  * can weight directions independently). */
case class SkipGramPairs(child: Expression, maxDist: Int) extends UnaryExpression {
  require(maxDist > 0, "skip-gram window must be positive")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("c", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "skipgram_pairs"

  override def nullSafeEval(input: Any): Any =
    SkipGramPairs.evalPairs(input.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SkipGramPairs.evalPairs($c, $maxDist);")

  override protected def withNewChildInternal(newChild: Expression): SkipGramPairs =
    copy(child = newChild)
}

object SkipGramPairs {
  /** Named `evalPairs`, not `eval` — static-forwarder collision note in
    * [[MinWindowHash]]. */
  def evalPairs(text: UTF8String, maxDist: Int): GenericArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val w = SplitWords.words(text)
    var total = 0
    var d = 1
    while (d <= maxDist) { if (w.length > d) total += w.length - d; d += 1 }
    val out = new Array[Any](total)
    val u = new Array[UTF8String](w.length)
    var i = 0
    while (i < w.length) { u(i) = UTF8String.fromString(w(i)); i += 1 }
    var k = 0
    i = 0
    while (i < w.length) {
      d = 1
      while (d <= maxDist && i + d < w.length) {
        out(k) = new GenericInternalRow(Array[Any](u(i), u(i + d)))
        k += 1
        d += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def skipgram_pairs(c: Column, maxDist: Int): Column =
    column(SkipGramPairs(expression(c), maxDist))
}

/** Hashed-n-gram LINEAR MODEL inference in one codegen'd pass — the
  * fastText-style quality-classifier shape (hash each word n-gram into a
  * weight table, sum the weights, threshold) with the weight table
  * REPLACED by a deterministic function of the feature hash itself
  * (`w(h) = h mod `mod` - `bias``), so the oracle can replay the exact
  * score without shipping a model file. Returns ARRAY<BIGINT>
  * `[n_grams, score]`; documents under n tokens yield `[0, 0]`.
  *
  * Feature hashing IS the vocabulary here (Weinberger et al. 2009): no
  * dictionary lookup, no shuffle — the whole classifier is a map-side
  * projection, which is what makes model-based quality filtering viable
  * at corpus scale. The 60-bit md5 feature hash matches the inverted-
  * index family (GramHashes), so both engines bucket identically. */
case class GramScore(child: Expression, n: Int, mod: Int, bias: Int)
    extends UnaryExpression {
  require(n > 0 && mod > 1, "gram width and modulus must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_score"

  override def nullSafeEval(input: Any): Any =
    GramScore.evalScore(input.asInstanceOf[UTF8String], n, mod, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramScore.evalScore($c, $n, $mod, $bias);")

  override protected def withNewChildInternal(newChild: Expression): GramScore =
    copy(child = newChild)
}

object GramScore {
  /** Named `evalScore`, not `eval` — static-forwarder collision note in
    * [[MinWindowHash]]. */
  def evalScore(text: UTF8String, n: Int, mod: Int, bias: Int): GenericArrayData = {
    val w = SplitWords.words(text)
    if (w.length < n) return new GenericArrayData(Array(0L, 0L))
    var score = 0L
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n - 1 < w.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      score += ShingleHashes.md5Prefix60(sb.toString) % mod - bias
      i += 1
    }
    new GenericArrayData(Array((w.length - n + 1).toLong, score))
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def gram_score(c: Column, n: Int, mod: Int, bias: Int): Column =
    column(GramScore(expression(c), n, mod, bias))
}

/** Whitespace tokenization with empty-token drop as ONE codegen'd
  * expression — the `filter(split(text, '\\s+'), w -> w != '')` idiom
  * without the interpreted higher-order lambda (see the verify-skill perf
  * trap: HOF lambdas never codegen). Returns ARRAY<STRING> of the
  * non-empty tokens; `posexplode` over it yields 0-based positions over
  * the filtered stream directly, with no re-rank window. */
case class SplitWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "split_words"

  override def nullSafeEval(input: Any): Any =
    SplitWords.evalWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SplitWords.evalWords($c);")

  override protected def withNewChildInternal(newChild: Expression): SplitWords =
    copy(child = newChild)
}

object SplitWords {
  /** Non-empty whitespace-split tokens (Java `split("\\s+", -1)` minus
    * empties — identical to Spark `filter(split(text,'\\s+'), w->w!='')`). */
  private[functions] def words(text: UTF8String): Array[String] = {
    val raw = text.toString.split("\\s+", -1)
    var nonEmpty = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) nonEmpty += 1; i += 1 }
    if (nonEmpty == raw.length) raw
    else {
      val out = new Array[String](nonEmpty)
      var j = 0
      i = 0
      while (i < raw.length) {
        if (!raw(i).isEmpty) { out(j) = raw(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** Named `evalWords`, not `eval` — static-forwarder collision note in
    * [[MinWindowHash]]. */
  def evalWords(text: UTF8String): GenericArrayData = {
    val w = words(text)
    val out = new Array[Any](w.length)
    var i = 0
    while (i < w.length) { out(i) = UTF8String.fromString(w(i)); i += 1 }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def split_words(c: Column): Column = column(SplitWords(expression(c)))
}

/** Fixed `w`-token window segmentation as ONE codegen'd expression —
  * value-identical to the former
  * `transform(sequence(0, ceil(size(toks)/w)-1), i -> array_join(slice(toks, i*w+1, w), ' '))`
  * over the [[SplitWords]] token array, which ran the outer lambda
  * INTERPRETED and re-allocated a slice + join per window (the verify-skill
  * HOF perf trap; this feeds two corpus scans in q_heavy_hitters plus
  * q_dedup_lines and the streaming segment replay). Zero tokens yield an
  * empty array (the caller's `size(...) > 0` filter semantics). */
case class TokenWindows(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "window must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_windows"

  override def nullSafeEval(input: Any): Any =
    TokenWindows.evalWindows(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenWindows.evalWindows($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): TokenWindows =
    copy(child = newChild)
}

object TokenWindows {
  /** Named `evalWindows`, not `eval` — static-forwarder collision note in
    * [[MinWindowHash]]. */
  def evalWindows(text: UTF8String, w: Int): GenericArrayData = {
    val toks = SplitWords.words(text)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = (toks.length + w - 1) / w
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = i * w
      val end = math.min(j + w, toks.length)
      while (j < end) {
        if (j > i * w) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def token_windows(c: Column, w: Int): Column = column(TokenWindows(expression(c), w))
}
