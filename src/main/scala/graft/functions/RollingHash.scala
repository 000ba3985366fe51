package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over the UTF-8 bytes.
  *
  * `fp = sum(byte_i * B^(n-1-i)) mod 2^64` with base B=1000003 (wrapping long
  * arithmetic). A native Catalyst `Expression` with `doGenCode`, so it stays
  * inside whole-stage codegen — no UDF serialization, no boxing; at 100 TB
  * the fingerprint pass is memory-bandwidth-bound, not CPU-bound.
  *
  * Used for exact-dedup keys and shift-detection (two documents with the
  * same fingerprint are byte-identical with overwhelming probability).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${RollingHash.Base}L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Winnowing-style minimum window fingerprint: the minimum rolling hash over
  * all `w`-byte windows (a near-dup signal robust to appends/prefixes —
  * winnowing, Schleimer et al. SIGMOD'03). Windows shorter than `w` hash the
  * whole text. */
case class MinWindowHash(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "window must be positive")
  override def dataType: DataType = LongType
  override def prettyName: String = "min_window_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    java.lang.Long.valueOf(MinWindowHash.evalBytes(bytes, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      s"""
         |byte[] $bytes = $c.getBytes();
         |${ev.value} = graft.functions.MinWindowHash.evalBytes($bytes, $w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinWindowHash =
    copy(child = newChild)
}

object MinWindowHash {
  /** Rolling update: h' = (h - lead*B^(w-1)) * B + next, wrapping 2^64.
    * Named `evalBytes` (not `eval`) on purpose: a companion method named
    * `eval` collides with the inherited `Expression.eval(InternalRow)`, so
    * scalac emits no static forwarder and generated code can't call it —
    * Janino fails and Spark silently falls back to interpreted execution. */
  def evalBytes(bytes: Array[Byte], w: Int): Long = {
    if (bytes.isEmpty) return 0L
    val n = bytes.length
    if (n <= w) {
      var h = 0L; var i = 0
      while (i < n) { h = h * RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
      return h
    }
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow *= RollingHash.Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * RollingHash.Base + (bytes(i) & 0xffL)
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }
}

/** Content-defined chunking cut count (the rsync/FastCDC boundary rule
  * without the length guards): a chunk boundary falls after every `w`-byte
  * window whose rolling hash has its low 6 bits zero (expected chunk ≈ 64
  * bytes at this mask). Boundaries depend only on LOCAL content, so an
  * insertion reshapes at most the chunks it touches — the property that
  * makes chunk-level dedup stable under edits, unlike fixed-stride
  * chunking where one inserted byte shifts every later boundary. Returns
  * the number of qualifying cut positions; chunks = cuts + 1. */
case class CdcCuts(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "window must be positive")
  override def dataType: DataType = LongType
  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      CdcCuts.evalCuts(input.asInstanceOf[UTF8String].getBytes, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcCuts.evalCuts($c.getBytes(), $w);")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  /** Named `evalCuts`, not `eval` — see the MinWindowHash forwarder note. */
  def evalCuts(bytes: Array[Byte], w: Int): Long = {
    val n = bytes.length
    if (n < w) return 0L
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow *= RollingHash.Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
    var cuts = if ((h & 63L) == 0L) 1L else 0L
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * RollingHash.Base + (bytes(i) & 0xffL)
      if ((h & 63L) == 0L) cuts += 1
      i += 1
    }
    cuts
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def cdc_cuts(c: Column, w: Int): Column = column(CdcCuts(expression(c), w))
}

/** Per-chunk hashes at content-defined boundaries: the payload is split
  * after every `w`-byte window whose hash has its low 6 bits zero (the
  * [[CdcCuts]] rule), and each resulting chunk gets the full polynomial
  * rolling hash of its own bytes (the [[RollingHash]] family, wrapping
  * 2^64). Texts shorter than one window are a single chunk. The array
  * feeds chunk-level dedup: shared content between edited copies lands
  * identical chunk hashes even when surrounding bytes moved. */
case class CdcChunkHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "window must be positive")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      CdcChunkHashes.evalChunks(input.asInstanceOf[UTF8String].getBytes, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CdcChunkHashes.evalChunks($c.getBytes(), $w));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}

object CdcChunkHashes {
  /** Named `evalChunks`, not `eval` — see the MinWindowHash forwarder
    * note. A cut closes the chunk at the LAST byte of the qualifying
    * window; the trailing remainder (if non-empty) is the final chunk. */
  def evalChunks(bytes: Array[Byte], w: Int): Array[Long] = {
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def hashRange(from: Int, until: Int): Long = {
      var h = 0L
      var i = from
      while (i < until) { h = h * RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
      h
    }
    if (n == 0) return Array(0L)
    if (n < w) return Array(hashRange(0, n))
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow *= RollingHash.Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
    var start = 0
    if ((h & 63L) == 0L) { out += hashRange(start, w); start = w }
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * RollingHash.Base + (bytes(i) & 0xffL)
      if ((h & 63L) == 0L) { out += hashRange(start, i + 1); start = i + 1 }
      i += 1
    }
    if (start < n) out += hashRange(start, n)
    out.toArray
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def cdc_chunk_hashes(c: Column, w: Int): Column =
    column(CdcChunkHashes(expression(c), w))
}

object RollingHash {
  final val Base = 1000003L

  // Spark 4: Column <-> Expression bridging lives in the classic API
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
  def min_window_hash(c: Column, w: Int): Column = column(MinWindowHash(expression(c), w))
}
