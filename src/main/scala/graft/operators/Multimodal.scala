package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal plumbing (SURVEY.md §2d): image/audio/video payloads stay
  * opaque BINARY columns with typed metadata; decode / resize / frame
  * sampling / feature extraction run as per-partition batch operators.
  *
  * The codec itself is a SEAM: every operator takes a plain serializable
  * function over the raw bytes, so a deployment with real codec libraries
  * (JPEG, FLAC, H.264, ...) injects its decoder without touching the query
  * code — the Spark-side schema, batching and partitioning are identical
  * either way. The defaults below are clearly-marked deterministic stubs
  * (this container has no codec libs); they are what the DuckDB oracles
  * replicate.
  */
object Multimodal {

  /** Typed metadata a codec derives from one payload. */
  final case class MediaMeta(nBytes: Int, width: Int, height: Int, codec: String)

  /** The codec seam: payload bytes -> typed metadata. Must be
    * serializable (it ships inside the mapPartitions closure). */
  type Decoder = Array[Byte] => MediaMeta

  /** The feature seam: payload bytes -> fixed-width feature vector. */
  type Featurizer = Array[Byte] => Array[Long]

  /** STUB decoder: derives fake "dimensions" from payload size. A real
    * pipeline plugs an actual image/audio decoder in here. The height
    * product is computed in Long — `payload.length * 31` overflows Int
    * for payloads over ~69 MB, silently diverging from the oracle's
    * BIGINT arithmetic. */
  val stubDecoder: Decoder = payload => {
    val n = payload.length
    MediaMeta(n, (n % 640 + 1), ((n.toLong * 31L) % 480L + 1L).toInt, "stub")
  }

  /** STUB featurizer: 8-bin byte histogram standing in for an image/audio
    * feature extractor. */
  val byteHistogram: Featurizer = payload => {
    val hist = new Array[Long](8)
    payload.foreach(b => hist((b & 0xff) >> 5) += 1)
    hist
  }

  /** Batch decode: (doc_id, payload) -> typed metadata rows. */
  def decode(
      bin: Dataset[(Long, Array[Byte])],
      decoder: Decoder = stubDecoder): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val m = decoder(payload)
        (id, m.nBytes, m.width, m.height, m.codec)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "codec")
  }

  /** Resize metadata: fit the decoded dimensions into a `box` x `box`
    * square with aspect preserved (integer arithmetic — scale =
    * box / max(w, h), floor, min 1). The real resampler plugs in via
    * `decoder`; this transform is codec-independent. */
  def resize(
      bin: Dataset[(Long, Array[Byte])],
      box: Int = 224,
      decoder: Decoder = stubDecoder): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val m = decoder(payload)
        // the decoder seam invites external implementations: fail with a
        // usable message instead of an ArithmeticException inside the task
        // when one reports degenerate 0x0 metadata
        require(m.width > 0 && m.height > 0,
          s"decoder returned non-positive dimensions ${m.width}x${m.height} for doc $id")
        val mx = math.max(m.width, m.height)
        (id, m.width, m.height,
          (m.width.toLong * box / mx).toInt.max(1),
          (m.height.toLong * box / mx).toInt.max(1))
      }
    }.toDF("doc_id", "width", "height", "out_w", "out_h")
  }

  /** Frame sampling: every `stride` bytes take a `frameLen`-byte slice
    * (video-frame analogue), emitting (doc_id, frame_no, offset,
    * frame_fp) — one row per sampled frame, the explode-shaped batch a
    * real decoder feeds downstream. The fingerprint is the same wrapping
    * polynomial hash as [[graft.functions.RollingHash]] (DuckDB-replicable
    * mod 2^64). */
  def sampleFrames(
      bin: Dataset[(Long, Array[Byte])],
      frameLen: Int = 64,
      stride: Int = 128): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions { batch =>
      batch.flatMap { case (id, payload) =>
        Iterator.from(0).map(_ * stride)
          .takeWhile(off => off + frameLen <= payload.length)
          .map { off =>
            var h = 0L; var i = off
            while (i < off + frameLen) { h = h * 1000003L + (payload(i) & 0xffL); i += 1 }
            (id, off / stride, off, h)
          }
      }
    }.toDF("doc_id", "frame_no", "offset", "frame_fp")
  }

  /** Feature extraction: per-batch featurizer over the opaque payload. */
  def features(
      bin: Dataset[(Long, Array[Byte])],
      featurizer: Featurizer = byteHistogram): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions { batch =>
      batch.map { case (id, payload) =>
        (id, featurizer(payload).toSeq, payload.length)
      }
    }.toDF("doc_id", "byte_hist", "n_bytes")
  }
}
