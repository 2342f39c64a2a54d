package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.multimodal.ImageHeaders._

/** ScalaCheck properties for the header parser: build→parse inverts
  * every real layout across arbitrary in-range geometry, and parse is
  * TOTAL — arbitrary bytes (including adversarial prefixes that start
  * with a real magic then go wrong) return None, never a throw. A
  * 100 TB curation pipeline feeds this parser every crawled payload;
  * totality is the operative contract. */
object ImageHeaderProps extends Properties("imageHeaders") {

  private val dimGen = Gen.choose(1, 16384)
  private val dim16Gen = Gen.choose(1, 65535)

  property("buildPng -> parse inverts") =
    forAll(dim16Gen, dim16Gen, Gen.oneOf(1, 2, 4, 8, 16)) { (w, h, d) =>
      parse(buildPng(w, h, d)).contains(ImageMeta("png", w, h, d))
    }

  property("buildBmp -> parse inverts") =
    forAll(dim16Gen, dim16Gen, Gen.oneOf(1, 4, 8, 24, 32)) { (w, h, d) =>
      parse(buildBmp(w, h, d)).contains(ImageMeta("bmp", w, h, d))
    }

  property("buildJpeg -> parse inverts (both SOF variants)") =
    forAll(dim16Gen, dim16Gen, Gen.choose(1, 4),
        Gen.oneOf(true, false)) { (w, h, c, prog) =>
      parse(buildJpeg(w, h, c, prog))
        .contains(ImageMeta("jpeg", w, h, 8L * c))
    }

  property("buildGif -> parse inverts") =
    forAll(dim16Gen, dim16Gen, Gen.choose(1, 8)) { (w, h, d) =>
      parse(buildGif(w, h, d)).contains(ImageMeta("gif", w, h, d))
    }

  property("buildWebpLossless -> parse inverts") =
    forAll(dimGen, dimGen) { (w, h) =>
      parse(buildWebpLossless(w, h)).contains(ImageMeta("webp", w, h, 32))
    }

  property("buildTiff -> parse inverts, both endiannesses") =
    forAll(dim16Gen, dim16Gen, Gen.oneOf(1, 8, 16, 24),
        Gen.choose(1, 8), Gen.oneOf(true, false)) { (w, h, bits, o, le) =>
      parse(buildTiff(w, h, bits, o, le))
        .contains(ImageMeta("tiff", w, h, bits, o))
    }

  property("jpeg EXIF orientation rides the embedded TIFF walk") =
    forAll(dim16Gen, dim16Gen, Gen.choose(1, 8),
        Gen.oneOf(true, false)) { (w, h, o, prog) =>
      parse(buildJpeg(w, h, 3, prog, orientation = o))
        .contains(ImageMeta("jpeg", w, h, 24, o))
    }

  private val magicPrefix: Gen[Array[Byte]] = Gen.oneOf(
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
    Array[Byte]('B', 'M'),
    Array[Byte](0xff.toByte, 0xd8.toByte),
    "GIF89a".getBytes,
    "RIFF".getBytes,
    "RIFFxxxxWEBP".getBytes,
    Array[Byte]('I', 'I', 0x2a, 0),
    Array[Byte]('M', 'M', 0, 0x2a))

  private val junkGen: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  property("parse is total on arbitrary bytes") =
    forAll(junkGen) { bytes =>
      parse(bytes); true // no throw is the property
    }

  property("parse is total on real-magic-then-junk prefixes") =
    forAll(magicPrefix, junkGen) { (magic, junk) =>
      parse(magic ++ junk); true
    }

  property("truncation at any point never throws; prefixes never lie") =
    forAll(dim16Gen, dim16Gen, Gen.choose(0, 80)) { (w, h, cut) =>
      Seq(buildPng(w, h, 8), buildBmp(w, h, 24),
        buildJpeg(w, h, 3, orientation = 5),
        buildGif(w, h, 8), buildTiff(w, h, 8, 3, littleEndian = w % 2 == 0),
        buildWebpLossless(math.min(w, 16384), math.min(h, 16384)))
        .forall { full =>
          val t = full.take(math.min(cut, full.length))
          val r = parse(t)
          // a truncated prefix either fails or reports the SAME
          // geometry as the full header — it never lies
          r.isEmpty || r == parse(full)
        }
    }
}
