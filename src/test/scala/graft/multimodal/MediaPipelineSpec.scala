package graft.multimodal

import graft.SparkSpec
import graft.Tables.t
import graft.multimodal.MediaPipeline._

class MediaPipelineSpec extends SparkSpec {

  private lazy val docs = t(spark, sf(), "documents")

  test("fromDocuments: schema and deterministic format tag") {
    val ds = fromDocuments(spark, docs)
    assert(ds.schema.fieldNames.toSeq == Seq("media_id", "payload", "format"))
    val rows = ds.limit(10).collect()
    assert(rows.forall(r => Set("png", "jpeg", "webp").contains(r.format)))
    assert(rows.forall(_.payload.nonEmpty))
  }

  test("extractFeatures: deterministic, fixed-width, bounded dims") {
    val ds = fromDocuments(spark, docs)
    val a = extractFeatures(ds).collect().sortBy(_.media_id)
    val b = extractFeatures(ds).collect().sortBy(_.media_id)
    assert(a.length == docs.count())
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length == 16))
    assert(a.forall(f => f.width >= 16 && f.width < 16 + 1920))
    assert(a.forall(f => f.height >= 16 && f.height < 16 + 1080))
    assert(a.forall(f => f.features.forall(x => x >= -0.5f && x <= 0.5f)))
  }

  test("decoder seam: a custom MediaDecoder swaps in, plumbing unchanged") {
    // what a codec-enabled deployment does: implement MediaDecoder and
    // pass it to extractFeatures — schema/batching/queries untouched.
    // init() count proves per-PARTITION (not per-row) initialization —
    // counted via an accumulator (the decoder itself is serialized into
    // the task closure, so a plain field would count in the copies).
    val inits = spark.sparkContext.longAccumulator("decoder_inits")
    class CountingDecoder extends MediaDecoder[java.security.MessageDigest] {
      def init(): java.security.MessageDigest = {
        inits.add(1)
        java.security.MessageDigest.getInstance("MD5")
      }
      def decode(md: java.security.MessageDigest, r: MediaRecord): MediaFeatures =
        decodeOne(md)(r).copy(features = Array.fill(16)(0.25f))
    }
    val ds = fromDocuments(spark, docs).repartition(3)
    val rows = extractFeatures(ds, new CountingDecoder).collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.features.forall(_ == 0.25f)),
      "custom decoder's features must flow through")
    assert(inits.value == 3,
      s"init() must run once per partition, ran ${inits.value}x")
  }

  test("resize: deterministic downsample, metadata preserved") {
    val ds = fromDocuments(spark, docs).limit(20)
    val orig = ds.collect().sortBy(_.media_id)
    val half = resize(ds, 2).collect().sortBy(_.media_id)
    assert(half.length == orig.length)
    orig.zip(half).foreach { case (o, h) =>
      assert(h.media_id == o.media_id && h.format == o.format)
      assert(h.payload.length == (o.payload.length + 1) / 2)
      assert(h.payload.toSeq == o.payload.grouped(2).map(_.head).toSeq)
    }
    // factor 1 = identity
    val same = resize(ds, 1).collect().sortBy(_.media_id)
    assert(same.map(_.payload.toSeq).toSeq == orig.map(_.payload.toSeq).toSeq)
  }

  test("sampleFrames: bounded output per record, stride chunks") {
    val ds = fromDocuments(spark, docs).limit(20)
    val frames = sampleFrames(ds, stride = 32, maxFrames = 4).collect()
    val byId = frames.groupBy(_._1)
    assert(byId.values.forall(_.length <= 4))
    // frame indexes are 0..n-1 per media
    byId.values.foreach { fs =>
      assert(fs.map(_._2).sorted.toSeq == (0 until fs.length).toSeq)
    }
  }

  test("pcmEnergy: real int16 RMS, bounded windows, known values") {
    import spark.implicits._
    // hand-built PCM: samples [3, -4] -> rms = sqrt((9+16)/2) = 3.5355
    // little-endian: 3 -> (3, 0); -4 -> (0xfc, 0xff)
    val payload = Array[Byte](3, 0, 0xfc.toByte, 0xff.toByte)
    val one = Seq(MediaRecord(1L, payload, "pcm")).toDS()
    val win = pcmEnergy(one, windowSamples = 2, maxWindows = 8).collect()
    assert(win.length == 1)
    assert(win.head.n_samples == 2)
    assert(math.abs(win.head.rms - math.sqrt(12.5)) < 1e-12)

    // bounded output + determinism over real payloads
    val ds = fromDocuments(spark, docs).limit(50)
    val a = pcmEnergy(ds, 64, 4).collect().sortBy(w => (w.media_id, w.win))
    val b = pcmEnergy(ds, 64, 4).collect().sortBy(w => (w.media_id, w.win))
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    assert(a.groupBy(_.media_id).values.forall(_.length <= 4))
  }

  test("fixture guard: documents.text is pure ASCII at every tested SF") {
    // The mm_audio_energy / mm_resize oracles index payload bytes by
    // CHARACTER position (substring/ascii/string_agg) while the Scala
    // side operates on UTF-8 BYTES — identical only while the fixture
    // text is ASCII. This guard turns that silent assumption into a
    // loud failure if the generated documents ever gain multi-byte
    // text (Multimodal.scala oracle comments document the dependency).
    import org.apache.spark.sql.functions._
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val nonAscii = graft.Tables.t(spark, sf(dir), "documents")
        .filter(octet_length(col("text")) =!= length(col("text")) ||
          col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(nonAscii == 0,
        s"$dir/documents.text contains non-ASCII rows ($nonAscii) — " +
          "the character-indexed mm oracles are no longer byte-faithful")
    }
  }
}
