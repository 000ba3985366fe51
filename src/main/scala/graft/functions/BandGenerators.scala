package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom generators that take a document's text straight to its LSH band
  * rows / posting rows in ONE evaluation per document.
  *
  * Why generators and not `explode(signature_expr)`: Catalyst's
  * `InferFiltersFromGenerate` rule adds `isnotnull(e) AND size(e) > 0` below
  * any `explode`/`inline`, and predicate pushdown then drives that condition
  * below the canonicalization aggregate — so the signature expression (the
  * dominant per-document cost) re-runs per RAW document inside a Filter, on
  * top of its projection evaluation (observed in the round-3 plans: 2–4
  * evaluations per doc). The rule matches only `ExplodeBase`/`Inline`
  * (`canInferFilters`), so a custom generator is structurally exempt: the
  * signature runs exactly once per canonical document, inside the Generate.
  * Null / too-short documents simply emit no rows — no filter needed, so no
  * expression can leak into a Filter condition.
  *
  * All three participate in whole-stage codegen via the
  * `CollectionGenerator` contract (`GenerateExec` loops over the returned
  * ArrayData inline).
  */
private[graft] trait BandGenerator extends CollectionGenerator { self: UnaryExpression =>
  override val inline: Boolean = true
  override val position: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)
  override def dataType: DataType = collectionType

  /** Static per-row entry point invoked from generated code. */
  protected def genCall(c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val arrayData = classOf[ArrayData].getName
    // empty array (not null) for null/degenerate input: zero generated rows
    // without a nullable collection in the Generate contract
    ev.copy(
      code = code"""
        ${c.code}
        $arrayData ${ev.value} = ${c.isNull} ?
          graft.functions.BandGenerators.emptyRows() : ${genCall(c.value.toString)};
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  protected def evalRows(text: UTF8String): ArrayData

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val arr = evalRows(t.asInstanceOf[UTF8String])
      val n = arr.numElements()
      val out = new Array[InternalRow](n)
      var i = 0
      while (i < n) { out(i) = arr.getStruct(i, elementSchema.length); i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }
}

/** (sig ARRAY<BIGINT>, band INT, bkey STRING) — one row per LSH band of the
  * document's MinHash signature; no rows for documents under 3 tokens (the
  * signature's null case). bkey is the band's signature slice joined with
  * '_' — byte-identical to the former
  * `concat_ws("_", element_at(sig, …).cast("string"))` banding, which the
  * DuckDB oracle replicates. */
case class MinHashBands(child: Expression, k: Int, bands: Int, portable: Boolean)
    extends UnaryExpression with BandGenerator {
  require(k > 0 && bands > 0 && k % bands == 0, "bands must divide k")
  override def prettyName: String = "minhash_bands"
  override def elementSchema: StructType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", StringType, nullable = false)))
  override protected def genCall(c: String): String =
    s"graft.functions.BandGenerators.minhashBands($c, $k, $bands, $portable)"
  override protected def evalRows(text: UTF8String): ArrayData =
    BandGenerators.minhashBands(text, k, bands, portable)
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** (simhash BIGINT, band INT, bkey BIGINT) — one row per pigeonhole band of
  * the document's 60-bit SimHash (bands = maxHamming + 1, width = 60/bands:
  * two signatures within the distance share at least one exact band). */
case class SimHashBands(child: Expression, bands: Int, width: Int, portable: Boolean)
    extends UnaryExpression with BandGenerator {
  require(bands > 0 && width > 0 && bands * width <= 64, "bands*width must fit 64 bits")
  override def prettyName: String = "simhash_bands"
  override def elementSchema: StructType = StructType(Seq(
    StructField("simhash", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", LongType, nullable = false)))
  override protected def genCall(c: String): String =
    s"graft.functions.BandGenerators.simhashBands($c, $bands, $width, $portable)"
  override protected def evalRows(text: UTF8String): ArrayData =
    BandGenerators.simhashBands(text, bands, width, portable)
  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
}

/** (n INT, s BIGINT) — one row per DISTINCT word-3-gram shingle hash of the
  * document, each carrying the document's distinct-shingle count `n` (so
  * |A| and |B| ride the posting lists into the pair aggregate — see
  * TextDedup.jaccardPairs); no rows for documents under 3 tokens. */
case class ShinglePosts(child: Expression, portable: Boolean)
    extends UnaryExpression with BandGenerator {
  override def prettyName: String = "shingle_posts"
  override def elementSchema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("s", LongType, nullable = false)))
  override protected def genCall(c: String): String =
    s"graft.functions.BandGenerators.shinglePosts($c, $portable)"
  override protected def evalRows(text: UTF8String): ArrayData =
    BandGenerators.shinglePosts(text, portable)
  override protected def withNewChildInternal(newChild: Expression): ShinglePosts =
    copy(child = newChild)
}

object BandGenerators {

  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Shared zero-row result for null/degenerate input. A `def`, not a
    * `val`: object vals get no static forwarder, so generated Java code
    * (`BandGenerators.emptyRows()`) could not reference a val and the
    * whole Generate would silently fall back to interpreted execution. */
  def emptyRows(): ArrayData = EMPTY

  def minhashBands(text: UTF8String, k: Int, bands: Int, portable: Boolean): ArrayData = {
    val sig = MinHashSig.evalSig(text, k, portable)
    if (sig == null) return EMPTY
    val rowsPerBand = k / bands
    val sb = new java.lang.StringBuilder(48)
    val rows = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('_')
        sb.append(sig.getLong(b * rowsPerBand + r))
        r += 1
      }
      rows(b) = new GenericInternalRow(
        Array[Any](sig, b, UTF8String.fromString(sb.toString)))
      b += 1
    }
    new GenericArrayData(rows)
  }

  def simhashBands(text: UTF8String, bands: Int, width: Int, portable: Boolean): ArrayData = {
    val sig = SimHash64.evalText(text, portable)
    val mask = (1L << width) - 1
    val rows = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      rows(b) = new GenericInternalRow(
        Array[Any](sig, b, (sig >>> (b * width)) & mask))
      b += 1
    }
    new GenericArrayData(rows)
  }

  def shinglePosts(text: UTF8String, portable: Boolean): ArrayData = {
    val hs = ShingleHashes.evalShingles(text, portable)
    if (hs == null) return EMPTY
    val n = hs.numElements()
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = new GenericInternalRow(Array[Any](n, hs.getLong(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def minhash_bands(c: Column, k: Int, bands: Int, portable: Boolean): Column =
    column(MinHashBands(expression(c), k, bands, portable))
  def simhash_bands(c: Column, bands: Int, width: Int, portable: Boolean): Column =
    column(SimHashBands(expression(c), bands, width, portable))
  def shingle_posts(c: Column, portable: Boolean): Column =
    column(ShinglePosts(expression(c), portable))
}
