package graft

import graft.operators.Multimodal

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
}
