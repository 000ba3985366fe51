package graft.operators

import graft.operators.Multimodal.{Decoder, Featurizer, MediaMeta}

/** Pure-JVM codec for binary PPM (P6) images — a REAL implementation of
  * the [[Multimodal.Decoder]]/[[Multimodal.Featurizer]] seams, so the
  * seam's contract (dimension parsing, channel order, truncation errors)
  * is proven against actual pixel data without native codec libraries.
  * P6 is the uncompressed Netpbm format: an ASCII header (`P6`,
  * whitespace/comments, width, height, maxval ≤ 255) followed by
  * width·height packed RGB byte triples in row-major order.
  *
  * Everything is deterministic and allocation-light: the decoder reads
  * only the header (O(header), not O(pixels)); the featurizer and
  * resampler run one primitive loop over the plane. All are serializable
  * functions, shipping inside `mapPartitions` closures exactly like the
  * stubs they replace — the Spark-side schema, batching and partitioning
  * are identical (the seam's whole point).
  */
object PpmCodec {

  /** Parsed header: (width, height, maxval, offset of the first pixel
    * byte). Fails with a usable message on wrong magic, malformed or
    * incomplete headers, out-of-range maxval, or a payload shorter than
    * the 3·w·h bytes the header promises (truncation). */
  def header(payload: Array[Byte]): (Int, Int, Int, Int) = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "not a P6 ppm: bad magic")
    var pos = 2
    // after the magic: three whitespace-separated decimal fields, with
    // '#'-to-end-of-line comments allowed anywhere whitespace is
    def nextInt(): Int = {
      var inComment = false
      while (pos < payload.length && {
        val c = payload(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      require(pos < payload.length, "truncated ppm header")
      var v = 0L
      var any = false
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); any = true; pos += 1
        require(v <= Int.MaxValue, "ppm header field overflows Int")
      }
      require(any, s"malformed ppm header at byte $pos")
      v.toInt
    }
    val w = nextInt(); val h = nextInt(); val mx = nextInt()
    require(w > 0 && h > 0, s"non-positive ppm dimensions ${w}x$h")
    require(mx > 0 && mx <= 255, s"unsupported ppm maxval $mx (P6 wide pixels not supported)")
    require(pos < payload.length && payload(pos).toChar.isWhitespace,
      "truncated ppm header")
    pos += 1 // exactly ONE whitespace byte separates maxval from the plane
    val need = 3L * w * h
    require(payload.length - pos >= need,
      s"truncated ppm plane: header promises $need bytes, payload carries ${payload.length - pos}")
    (w, h, mx, pos)
  }

  /** The [[Multimodal.Decoder]] seam: real dimensions from the header. */
  val decoder: Decoder = payload => {
    val (w, h, _, _) = header(payload)
    MediaMeta(payload.length, w, h, "ppm")
  }

  /** RGB byte at (x, y, channel 0..2) — row-major, R then G then B, the
    * channel-order contract the specs pin against known pixels. */
  def pixel(payload: Array[Byte], x: Int, y: Int, c: Int): Int = {
    val (w, h, _, off) = header(payload)
    require(x >= 0 && x < w && y >= 0 && y < h && c >= 0 && c < 3,
      s"pixel ($x,$y,$c) out of bounds for ${w}x$h")
    payload(off + (y * w + x) * 3 + c) & 0xff
  }

  /** The [[Multimodal.Featurizer]] seam over REAL pixels: 8-bin histogram
    * of integer luminance (299·R + 587·G + 114·B) / 1000 — the classic
    * BT.601 weights in exact integer arithmetic, so any engine replays it
    * bit-for-bit. One loop over the plane, no allocation beyond the 8
    * bins. */
  val luminanceHistogram: Featurizer = payload => {
    val (w, h, _, off) = header(payload)
    val hist = new Array[Long](8)
    var i = off
    val end = off + w * h * 3
    while (i < end) {
      val lum = (299 * (payload(i) & 0xff) + 587 * (payload(i + 1) & 0xff) +
        114 * (payload(i + 2) & 0xff)) / 1000
      hist(lum >> 5) += 1
      i += 3
    }
    hist
  }

  /** Nearest-neighbor resample to `outW`x`outH`, returned as a fresh P6
    * payload (header + plane) — source pixel = floor(dst · src / out),
    * the standard integer mapping, exactly reproducible anywhere. Proves
    * the resize seam can carry REAL resampled bytes, not just metadata. */
  def resampleNearest(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, s"non-positive output ${outW}x$outH")
    val (w, h, mx, off) = header(payload)
    val hdr = s"P6\n$outW $outH\n$mx\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + outW * outH * 3)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        val s = off + (sy * w + sx) * 3
        val d = hdr.length + (y * outW + x) * 3
        out(d) = payload(s); out(d + 1) = payload(s + 1); out(d + 2) = payload(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
