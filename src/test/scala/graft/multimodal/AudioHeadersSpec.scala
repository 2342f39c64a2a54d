package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The RIFF walk is real binary parsing over untrusted crawl bytes:
  * round-trips across the layout lattice (padding rule included), and
  * every malformed class is a clean None, never a throw. */
class AudioHeadersSpec extends AnyFunSuite {

  private def build(ch: Int = 2, rate: Int = 44100, bits: Int = 16,
      float32: Boolean = false, frames: Long = 100L,
      lp: Int = 0): Array[Byte] =
    AudioHeaders.buildWav(ch, rate, bits, float32, frames, lp)

  test("build -> parse round-trips across the layout lattice") {
    for {
      ch <- Seq(1, 2)
      rate <- Seq(8000, 22050, 44100)
      (bits, fl) <- Seq((8, false), (16, false), (24, false), (32, true))
      frames <- Seq(0L, 1L, 499L)
      lp <- Seq(0, 1, 4, 7) // odd values exercise the alignment pad
    } {
      val m = AudioHeaders.parse(build(ch, rate, bits, fl, frames, lp)).get
      assert(m.format == "wav" && m.codec == (if (fl) "float" else "pcm"))
      assert(m.channels == ch && m.sample_rate == rate &&
        m.bits_per_sample == bits)
      assert(m.n_frames == frames)
      assert(m.duration_ms == frames * 1000L / rate)
    }
  }

  test("word-alignment: odd chunks carry an uncounted pad byte") {
    // mono 8-bit, odd frame count -> odd data chunk -> +1 pad
    val odd = build(ch = 1, bits = 8, frames = 33L)
    assert(odd.length == 44 + 33 + 1)
    assert(AudioHeaders.parse(odd).get.n_frames == 33L)
    // odd LIST payload -> +1 pad inside the chunk walk
    val lst = build(frames = 10L, lp = 5)
    assert(lst.length == 44 + (8 + 5 + 1) + 10 * 4)
    assert(AudioHeaders.parse(lst).get.n_frames == 10L)
  }

  test("malformed containers are None, never a throw") {
    val good = build(frames = 25L)
    (0 until good.length).foreach { n =>
      assert(AudioHeaders.parse(good.take(n)).isEmpty, s"truncated at $n")
    }
    assert(AudioHeaders.parse(null).isEmpty)
    assert(AudioHeaders.parse(Array.fill[Byte](64)(0)).isEmpty)
    // RIFF size lying about the total
    val lying = good.clone(); lying(4) = (lying(4) + 1).toByte
    assert(AudioHeaders.parse(lying).isEmpty)
    // unknown codec id
    val codec = good.clone(); codec(20) = 7
    assert(AudioHeaders.parse(codec).isEmpty)
    // internally inconsistent fmt: byte_rate != rate * block_align
    val brate = good.clone(); brate(28) = (brate(28) + 1).toByte
    assert(AudioHeaders.parse(brate).isEmpty)
    // partial trailing frame (stereo 16-bit, block align 4): declare
    // the data chunk one byte short — the walk still lands exactly at
    // EOF (odd size + its pad byte), so ONLY the whole-frames check
    // can reject it
    val dataSizeOff = good.length - 8 - 25 * 4 + 4
    assert(new String(good, dataSizeOff - 4, 4) == "data")
    val part = good.clone()
    part(dataSizeOff) = (25 * 4 - 1).toByte
    assert(AudioHeaders.parse(part).isEmpty)
    // builder input validation
    intercept[IllegalArgumentException](build(ch = 0))
    intercept[IllegalArgumentException](build(bits = 12))
  }
}
