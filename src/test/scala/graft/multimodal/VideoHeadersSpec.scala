package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF walk is real binary parsing over untrusted crawl
  * bytes: every layout knob (fullbox versions, size encodings, brands)
  * must round-trip, and every malformed class must be a clean None,
  * never a throw or a garbage row. */
class VideoHeadersSpec extends AnyFunSuite {

  private def build(w: Int = 640, h: Int = 360, ts: Int = 1000,
      dur: Long = 5000L, v1: Boolean = false, brand: String = "isom",
      freeBox: Boolean = false, mdatMode: Int = 2,
      pay: Int = 0): Array[Byte] =
    VideoHeaders.buildMp4(w, h, ts, dur, v1, brand, freeBox, mdatMode, pay)

  test("build -> parse round-trips across the layout lattice") {
    for {
      v1 <- Seq(false, true)
      brand <- Seq("isom", "mp42", "qt  ")
      free <- Seq(false, true)
      mode <- 0 to 2
      (w, h, ts, dur) <- Seq((1, 1, 600, 0L), (640, 360, 1000, 5000L),
        (1919, 1079, 90000, 3599999L), (32767, 32767, 48000, 1L))
    } {
      val m = VideoHeaders.parse(
        build(w, h, ts, dur, v1, brand, free, mode, pay = 7)).get
      assert(m.width == w && m.height == h, s"geometry at v1=$v1 mode=$mode")
      assert(m.timescale == ts && m.duration == dur)
      assert(m.duration_ms == dur * 1000L / ts)
      assert(m.major_brand == brand)
      assert(m.format == (if (brand == "qt  ") "mov" else "mp4"))
      assert(m.n_boxes == (if (free) 4 else 3))
    }
  }

  test("v1 fullboxes carry 64-bit durations intact") {
    val big = 0x123456789AL // needs > 32 bits
    val m = VideoHeaders.parse(build(dur = big, v1 = true)).get
    assert(m.duration == big)
    assert(m.duration_ms == big * 1000L / 1000L)
  }

  test("unknown boxes are skipped by size, like a real demuxer") {
    val base = build()
    // splice an unknown udta box (with nested junk) between ftyp and moov
    val udta = Array[Byte](0, 0, 0, 12, 'u', 'd', 't', 'a', 1, 2, 3, 4)
    val spliced = base.take(24) ++ udta ++ base.drop(24)
    val m = VideoHeaders.parse(spliced).get
    assert(m.width == 640 && m.height == 360 && m.n_boxes == 4)
  }

  test("all three mdat size encodings yield the documented byte counts") {
    // plain 32-bit: 8 + pay; largesize: 16 + pay; size-0: 8 + pay
    assert(build(mdatMode = 2, pay = 5).length == 24 + 216 + 8 + 5)
    assert(build(mdatMode = 0, pay = 5).length == 24 + 216 + 16 + 5)
    assert(build(mdatMode = 1, pay = 5).length == 24 + 216 + 8 + 5)
    assert(build(v1 = true).length == 24 + 240 + 8)
  }

  test("malformed containers are None, never a throw") {
    val good = build(pay = 9)
    // truncations at every prefix length up to the metadata-complete
    // boundary (ftyp + moov = 240 bytes) must be None; at exactly that
    // boundary the container is valid metadata with no mdat yet —
    // a real progressive-download prefix — and must parse
    (0 until 240).foreach { n =>
      assert(VideoHeaders.parse(good.take(n)).isEmpty, s"truncated at $n")
    }
    assert(VideoHeaders.parse(good.take(240)).isDefined)
    // truncations inside the mdat box are None (its size lies)
    (241 until good.length).foreach { n =>
      assert(VideoHeaders.parse(good.take(n)).isEmpty, s"mdat cut at $n")
    }
    assert(VideoHeaders.parse(null).isEmpty)
    assert(VideoHeaders.parse(Array.fill[Byte](32)(0)).isEmpty)
    // not starting with ftyp
    assert(VideoHeaders.parse(good.drop(24)).isEmpty)
    // lying box size: moov claims past EOF
    val lying = good.clone()
    lying(24) = 127 // moov size high byte -> ~2 GB
    assert(VideoHeaders.parse(lying).isEmpty)
    // unknown fullbox version in mvhd
    val badVer = good.clone()
    badVer(24 + 8 + 8) = 9 // mvhd version byte
    assert(VideoHeaders.parse(badVer).isEmpty)
    // non-ASCII fourcc aborts the walk
    val badTag = good.clone()
    badTag(24 + 4) = 0x01
    assert(VideoHeaders.parse(badTag).isEmpty)
    // builder rejects nonsense geometry/timing
    intercept[IllegalArgumentException](build(w = 0))
    intercept[IllegalArgumentException](build(w = 40000))
    intercept[IllegalArgumentException](build(ts = 0))
  }

  test("a child box lying about its size inside moov is None (nested bounds)") {
    val good = build()
    // shrink tkhd's declared size below its real extent: the trak
    // child walk then resynchronizes into matrix zeroes, reads a
    // size-0 box with a non-ASCII tag, and must abort cleanly
    val bad = good.clone()
    bad(24 + 8 + 108 + 8 + 3) = 50 // tkhd size low byte (was 92)
    assert(VideoHeaders.parse(bad).isEmpty)
  }
}
