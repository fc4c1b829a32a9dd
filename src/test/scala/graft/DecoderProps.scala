package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.multimodal.Multimodal

/** ScalaCheck properties for the media decoders' hostile-input
  * contract: for ANY byte payload — random garbage, magic-prefixed
  * garbage, or a truncated/bit-flipped valid file — `decodeImage` /
  * `decodeWav` either return None (callers fall back to the
  * deterministic stub) or a WELL-FORMED result; they never throw and
  * never return inconsistent dimensions. This pins the exact bug class
  * a round-6 review found in decodeBmp (a Long-overflowing bounds check
  * that let a 54-byte hostile header reach the allocator). */
object DecoderProps extends Properties("graft.decoders") {

  private def wellFormedImage(r: Option[Multimodal.DecodedImage]): Boolean =
    r.forall(img => img.width > 0 && img.height > 0 &&
      img.rgb.length == img.width * img.height * 3)

  private def wellFormedAudio(r: Option[Multimodal.DecodedAudio]): Boolean =
    r.forall(a => a.sampleRate > 0 && a.samples != null)

  // magic prefixes steer generated garbage INTO each parser (pure-random
  // bytes almost never pass the magic sniff, which would test nothing)
  private val magics: Seq[Array[Byte]] = Seq(
    Array[Byte]('B', 'M'),
    Array[Byte]('P', '6'),
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
    Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte),
    "RIFF1234WAVE".getBytes("US-ASCII"),
    Array.empty[Byte])

  private val hostileGen: Gen[Array[Byte]] = for {
    magic <- Gen.oneOf(magics)
    n <- Gen.chooseNum(0, 300)
    body <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield magic ++ body.toArray

  property("decodeImage: any bytes -> None or well-formed, never a throw") =
    Prop.forAll(hostileGen) { b =>
      wellFormedImage(Multimodal.decodeImage(b))
    }

  property("decodeWav: any bytes -> None or well-formed, never a throw") =
    Prop.forAll(hostileGen) { b =>
      wellFormedAudio(Multimodal.decodeWav(b))
    }

  // a VALID file with one flipped byte or a truncation must degrade the
  // same way — decoded-with-wrong-pixels is acceptable, a crash is not
  private def validBmp: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + 24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + 24).putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(4).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(24).putInt(0).putInt(0).putInt(0).putInt(0)
    (0 until 24).foreach(i => bb.put((i * 11).toByte))
    bb.array()
  }

  private def validWav: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(8)
    Seq(100, -200, 32767, -32768).foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  private def mutated(base: Array[Byte]): Gen[Array[Byte]] = Gen.oneOf(
    Gen.chooseNum(0, base.length - 1).map { i =>
      val c = base.clone(); c(i) = (c(i) ^ 0xff).toByte; c
    },
    Gen.chooseNum(0, base.length).map(base.take))

  private def validPng: Array[Byte] = {
    val raw = Array[Byte](0, 10, 20, 30, 40, 50, 60, // row 0: filter 0 + 2 px RGB
      0, 70, 80, 90, 100, 110, 120) // row 1
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](256)
    val comp = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) { val n = defl.deflate(buf); comp.write(buf, 0, n) }
    defl.end()
    def chunk(ty: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(ty.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(ty.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  property("bit-flipped/truncated BMP never crashes") =
    Prop.forAll(mutated(validBmp)) { b =>
      wellFormedImage(Multimodal.decodeImage(b))
    }

  property("bit-flipped/truncated PNG never crashes") =
    Prop.forAll(mutated(validPng)) { b =>
      wellFormedImage(Multimodal.decodeImage(b))
    }

  property("bit-flipped/truncated WAV never crashes") =
    Prop.forAll(mutated(validWav)) { b =>
      wellFormedAudio(Multimodal.decodeWav(b))
    }

  private lazy val validJpeg: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x336699)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  property("bit-flipped/truncated JPEG never crashes") =
    Prop.forAll(mutated(validJpeg)) { b =>
      wellFormedImage(Multimodal.decodeImage(b))
    }
}
