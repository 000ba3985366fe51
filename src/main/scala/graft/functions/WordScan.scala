package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-run scanner: over the UTF-8 bytes of `child`, find
  * maximal runs of word chars `[A-Za-z0-9_]` (the regex `\b...\b` unit —
  * Java and RE2 both define `\w`/`\b` over ASCII word chars by default,
  * and UTF-8 continuation bytes are >= 0x80, so byte-wise scanning is
  * exact for any input) and return
  * `array(n_in_set, n_short, n_runs, n_split_tokens, n_ws_chars)`:
  *
  *   - n_in_set: runs whose lowercase form is in `words` — equal to
  *     `regexp_count(lower(text), '\b(w1|w2|...)\b')`;
  *   - n_short:  runs of length <= shortLen — equal to
  *     `regexp_count(text, '\b\w{1,shortLen}\b')`;
  *   - n_runs:   all runs;
  *   - n_split_tokens: `size(split(text, "\\s+"))` — whitespace-run
  *     count + 1, exactly Java split-with-keep-empties semantics;
  *   - n_ws_chars: count of `\s` chars (`[ \t\n\x0B\f\r]`, all
  *     ASCII, so bytes == chars).
  *
  * Why: those regexp forms cost ~150 ns/char in Java's backtracking engine
  * (the dominant cost of language-ID and quality scoring on the 20x-docs
  * scale probe); this loop does one pass at ~1 ns/byte and stays inside
  * whole-stage codegen. The oracle side keeps the regexp formulation —
  * the run semantics are identical by construction.
  */
case class WordScan(child: Expression, words: Seq[String], shortLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "word_scan"

  @transient private lazy val set: java.util.HashSet[String] = WordScan.toSet(words)

  override def nullSafeEval(input: Any): Any =
    WordScan.scanBytes(input.asInstanceOf[UTF8String], set, shortLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordScan.scanBytes($c, $setRef, $shortLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordScan =
    copy(child = newChild)
}

object WordScan {

  def toSet(words: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(w.toLowerCase))
    s
  }

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Java regex \s: space, tab, LF, vertical tab, form feed, CR. */
  private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Named `scanBytes`, not `eval`: a companion `eval` collides with the
    * inherited `Expression.eval(InternalRow)` and loses its static
    * forwarder, breaking codegen (see MinWindowHash). */
  def scanBytes(text: UTF8String, set: java.util.HashSet[String], shortLen: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var inSet = 0
    var short = 0
    var runs = 0
    var wsRuns = 0
    var wsChars = 0
    var inWs = false
    val buf = new java.lang.StringBuilder(24)
    var i = 0
    while (i <= n) {
      val word = i < n && isWordByte(bytes(i))
      if (word) {
        val b = bytes(i)
        buf.append((if (b >= 'A' && b <= 'Z') (b + 32) else b.toInt).toChar)
      } else if (buf.length() > 0) {
        runs += 1
        if (buf.length() <= shortLen) short += 1
        if (set.contains(buf.toString)) inSet += 1
        buf.setLength(0)
      }
      if (i < n && isWsByte(bytes(i))) {
        wsChars += 1
        if (!inWs) wsRuns += 1
        inWs = true
      } else inWs = false
      i += 1
    }
    new GenericArrayData(Array(inSet, short, runs, wsRuns + 1, wsChars))
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def word_scan(c: Column, words: Seq[String], shortLen: Int = 2): Column =
    column(WordScan(expression(c), words, shortLen))

  /** Count of whole-word occurrences of `words` — the fast twin of
    * `regexp_count(lower(text), "\\b(w1|w2|...)\\b")`. */
  def word_set_count(c: Column, words: Seq[String]): Column =
    word_scan(c, words).getItem(0)
}
