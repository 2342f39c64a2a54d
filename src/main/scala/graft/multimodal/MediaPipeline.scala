package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing plumbing (SURVEY.md §2.5).
  *
  * Media payloads are opaque `binary` columns + typed metadata. The decode
  * step is STUBBED (no image/audio codecs in this container) with a
  * deterministic fake driven by the payload's md5 — but the Spark-side
  * plumbing is real and is what matters at 100 TB: schema, partition-wise
  * batched processing (`mapPartitions`, one decoder init per partition,
  * never per row), and bounded per-record output (fixed-length feature
  * vectors, frame samples capped).
  */
object MediaPipeline {

  case class MediaRecord(media_id: Long, payload: Array[Byte], format: String)
  case class MediaFeatures(
      media_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, features: Array[Float])

  /** THE DECODER SEAM — the one extension point a codec-enabled
    * deployment implements; everything else (schema, partitioning,
    * batching, downstream feature queries) is unchanged.
    *
    * Contract:
    *  - `init()` runs ONCE PER PARTITION, on the executor, inside the
    *    `mapPartitions` closure: open codec contexts, load models, map
    *    native libraries, allocate reusable buffers. Tasks run
    *    concurrently in one JVM, so init() must be thread-safe; the
    *    state it returns is task-local and needs no synchronization.
    *  - `decode(state, record)` runs once per row, streamed: same
    *    payload must yield the same features (decode is a pure function
    *    of the bytes — retries and speculative tasks re-decode), and it
    *    must not retain `record.payload` beyond the call.
    *  - Output is BOUNDED per record — fixed-length feature vector,
    *    scalar metadata — which is what keeps the stage's output size
    *    plannable at 100 TB (the payload bytes never survive the stage).
    *
    * The implementation ships in the task closure, so the trait is
    * Serializable; native/codec state must live behind `init()` (opened
    * on the executor), never in a field serialized from the driver. */
  trait MediaDecoder[S] extends Serializable {
    def init(): S
    def decode(state: S, r: MediaRecord): MediaFeatures
  }

  /** Deterministic stand-in for a real image decode (this container has
    * no codec libs): dimensions and a 16-dim feature vector derived from
    * the payload hash. The digest is the "decoder state" — created once
    * per partition, reused per row (MessageDigest.digest resets the
    * instance). */
  object DigestDecoder extends MediaDecoder[java.security.MessageDigest] {
    def init(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    def decode(digest: java.security.MessageDigest, r: MediaRecord): MediaFeatures =
      decodeOne(digest)(r)
  }

  private[multimodal] def decodeOne(digest: java.security.MessageDigest)
      (r: MediaRecord): MediaFeatures = {
    val md = digest.digest(r.payload)
    def b(i: Int): Int = md(i) & 0xff
    val feats = Array.tabulate(16)(i => (b(i) / 255.0f) - 0.5f)
    MediaFeatures(r.media_id, r.format, r.payload.length.toLong,
      width = 16 + b(0) % 1920, height = 16 + b(1) % 1080, features = feats)
  }

  /** Batched decode+featurize through the decoder seam: partition-wise,
    * decoder state initialized once per partition (the `mapPartitions`
    * closure), rows streamed. */
  def extractFeatures[S](ds: Dataset[MediaRecord],
      decoder: MediaDecoder[S]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // decoder context opened once per partition, never per row
      val state = decoder.init()
      it.map(decoder.decode(state, _))
    }
  }

  /** Default decode path: the container's deterministic stub. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    extractFeatures(ds, DigestDecoder)

  /** Resize: deterministic payload downsample (every `factor`-th byte)
    * with metadata carried through — the plumbing shape of an image
    * resize (a production build swaps the byte stride for a real
    * scaler; schema and batching are unchanged). */
  def resize(ds: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    require(factor >= 1)
    ds.mapPartitions { it =>
      it.map { r =>
        val out = Array.ofDim[Byte]((r.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        r.copy(payload = out)
      }
    }
  }

  /** Frame sampling for video-like payloads: emit every `stride`-th chunk
    * of the payload as a "frame" (bounded output per record). */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int, maxFrames: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(math.max(1, stride)).zipWithIndex
        .take(maxFrames)
        .map { case (chunk, i) => (r.media_id, i, chunk) }
    }
  }

  case class AudioWindow(media_id: Long, win: Int, n_samples: Int, rms: Double)

  /** Audio feature extraction — NOT a stub: interprets the payload as
    * little-endian 16-bit PCM and computes per-window RMS energy, the
    * first stage of any audio quality/VAD pipeline. Output is bounded
    * (`maxWindows` per record); processing is partition-streamed with no
    * per-row allocation beyond the window accumulator. */
  def pcmEnergy(ds: Dataset[MediaRecord], windowSamples: Int,
      maxWindows: Int): Dataset[AudioWindow] = {
    import ds.sparkSession.implicits._
    require(windowSamples >= 1)
    ds.flatMap { r =>
      val p = r.payload
      val nSamples = p.length / 2
      val nWin = math.min(maxWindows,
        (nSamples + windowSamples - 1) / windowSamples)
      (0 until nWin).iterator.map { w =>
        val from = w * windowSamples
        val until = math.min(nSamples, from + windowSamples)
        var acc = 0.0
        var i = from
        while (i < until) {
          // little-endian int16: low byte unsigned, high byte signed
          val s = ((p(2 * i) & 0xff) | (p(2 * i + 1) << 8)).toShort
          acc += s.toDouble * s.toDouble
          i += 1
        }
        AudioWindow(r.media_id, w, until - from,
          math.sqrt(acc / math.max(1, until - from)))
      }
    }
  }

  /** Adapt the documents table into a media-record shaped DataFrame —
    * payload-agnostic plumbing exercised by tests and `mm_*` queries. */
  def fromDocuments(spark: SparkSession, df: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select($"doc_id".as("media_id"),
        $"text".cast("binary").as("payload"),
        when($"n_chars" % 3 === 0, "png")
          .when($"n_chars" % 3 === 1, "jpeg")
          .otherwise("webp").as("format"))
      .as[MediaRecord]
  }
}
