package graft

import graft.operators.{Multimodal, PpmCodec}

/** The codec seam contract: every multimodal operator takes an injectable
  * Decoder/Featurizer, so a deployment with real codec libraries swaps its
  * decoder in WITHOUT touching query code — these tests inject fakes and
  * check the values flow through the batch plumbing unchanged. */
class MultimodalSpec extends SparkSpec {

  private def payloads = {
    val s = spark
    import s.implicits._
    s.createDataset(Seq(
      (1L, "abcd".getBytes("UTF-8")),
      (2L, "0123456789".getBytes("UTF-8"))))
  }

  test("an injected decoder replaces the stub without touching the query shape") {
    val custom: Multimodal.Decoder = p => Multimodal.MediaMeta(p.length, 1920, 1080, "jpeg")
    val rows = Multimodal.decode(payloads, custom).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet
    assert(rows == Set((1L, 4, 1920, 1080, "jpeg"), (2L, 10, 1920, 1080, "jpeg")))
  }

  test("resize fits injected decoder dims into the box, aspect preserved") {
    val custom: Multimodal.Decoder = p => Multimodal.MediaMeta(p.length, 640, 480, "x")
    val r = Multimodal.resize(payloads, box = 224, decoder = custom).collect().head
    assert((r.getInt(3), r.getInt(4)) == (224, 168))
  }

  test("resize rejects a decoder reporting degenerate 0x0 dimensions with a usable error") {
    val broken: Multimodal.Decoder = p => Multimodal.MediaMeta(p.length, 0, 0, "x")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resize(payloads, box = 224, decoder = broken).collect()
    }
    assert(e.getMessage.contains("non-positive dimensions") ||
      Option(e.getCause).exists(_.getMessage.contains("non-positive dimensions")),
      s"expected the decoder-contract message, got: ${e.getMessage}")
  }

  test("an injected featurizer flows through the feature batch") {
    val f: Multimodal.Featurizer = p => Array(p.length.toLong, 7L)
    val rows = Multimodal.features(payloads, f).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(rows(1L) == Seq(4L, 7L) && rows(2L) == Seq(10L, 7L))
  }

  test("frame sampling emits only fully-contained stride-aligned frames") {
    val fr = Multimodal.sampleFrames(payloads, frameLen = 4, stride = 5).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    // 4-byte payload: one frame at 0; 10-byte payload: frames at 0 and 5
    assert(fr == Set((1L, 0), (2L, 0), (2L, 5)))
  }

  // ---- real bytes through the seam: the pure-JVM PPM (P6) codec --------

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/ppm/$name")
    require(in != null, s"missing checked-in fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def ppmDs = {
    val s = spark
    import s.implicits._
    s.createDataset(Seq(
      (1L, fixture("rgb_2x2.ppm")),
      (2L, fixture("gradient_6x4.ppm")),
      (3L, fixture("comment_3x1.ppm"))))
  }

  test("PPM decoder reports real dimensions through the decode batch") {
    val rows = Multimodal.decode(ppmDs, PpmCodec.decoder).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getString(4))).toSet
    assert(rows == Set((1L, 2, 2, "ppm"), (2L, 6, 4, "ppm"), (3L, 3, 1, "ppm")))
  }

  test("PPM channel order is R,G,B row-major (pinned against known pixels)") {
    val p = fixture("rgb_2x2.ppm")
    // (0,0)=red (1,0)=green (0,1)=blue (1,1)=white
    assert((PpmCodec.pixel(p, 0, 0, 0), PpmCodec.pixel(p, 0, 0, 1), PpmCodec.pixel(p, 0, 0, 2)) == ((255, 0, 0)))
    assert((PpmCodec.pixel(p, 1, 0, 0), PpmCodec.pixel(p, 1, 0, 1), PpmCodec.pixel(p, 1, 0, 2)) == ((0, 255, 0)))
    assert((PpmCodec.pixel(p, 0, 1, 0), PpmCodec.pixel(p, 0, 1, 1), PpmCodec.pixel(p, 0, 1, 2)) == ((0, 0, 255)))
    assert(PpmCodec.pixel(p, 1, 1, 2) == 255)
    val g = fixture("gradient_6x4.ppm")
    // generator: r=x*40, g=y*60, b=(x+y)*20
    assert(PpmCodec.pixel(g, 5, 3, 0) == 200 && PpmCodec.pixel(g, 5, 3, 1) == 180 &&
      PpmCodec.pixel(g, 5, 3, 2) == 160)
  }

  test("PPM header comments parse; truncated plane and bad magic fail usably") {
    val c = fixture("comment_3x1.ppm")
    assert(PpmCodec.decoder(c) == Multimodal.MediaMeta(c.length, 3, 1, "ppm"))
    val g = fixture("gradient_6x4.ppm")
    val cut = intercept[IllegalArgumentException] {
      PpmCodec.decoder(g.dropRight(1))
    }
    assert(cut.getMessage.contains("truncated ppm plane"))
    val magic = intercept[IllegalArgumentException] {
      PpmCodec.decoder("P5\n1 1\n255\nx".getBytes("US-ASCII"))
    }
    assert(magic.getMessage.contains("bad magic"))
  }

  test("PPM luminance featurizer matches a hand-computed histogram") {
    // rgb_2x2, integer lum = (299r+587g+114b)/1000: red (255,0,0) -> 76
    // -> bin 2; green -> 149 -> bin 4; blue -> 29 -> bin 0; white -> 255
    // -> bin 7
    val hist = Multimodal.features(ppmDs.filter(_._1 == 1L), PpmCodec.luminanceHistogram)
      .collect().head.getSeq[Long](1)
    assert(hist == Seq(1L, 0L, 1L, 0L, 1L, 0L, 0L, 1L))
  }

  test("PPM resize uses real header dimensions; nearest resample replicates pixels") {
    val r = Multimodal.resize(ppmDs.filter(_._1 == 2L), box = 12, decoder = PpmCodec.decoder)
      .collect().head
    // 6x4 into a 12-box: scale by 2 exactly
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) == ((6, 4, 12, 8)))
    val up = PpmCodec.resampleNearest(fixture("rgb_2x2.ppm"), 4, 4)
    assert(PpmCodec.decoder(up) == Multimodal.MediaMeta(up.length, 4, 4, "ppm"))
    // each source pixel becomes a 2x2 block: corners keep their colors
    assert(PpmCodec.pixel(up, 0, 0, 0) == 255 && PpmCodec.pixel(up, 1, 1, 0) == 255)
    assert(PpmCodec.pixel(up, 3, 0, 1) == 255 && PpmCodec.pixel(up, 2, 3, 2) == 255)
    assert(PpmCodec.pixel(up, 3, 3, 0) == 255 && PpmCodec.pixel(up, 3, 3, 1) == 255)
  }
}
