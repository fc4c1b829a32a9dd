package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.multimodal.Multimodal

/** ScalaCheck properties for the perceptual-fingerprint family:
  *
  *  - TOTALITY: any payload (hostile image-magic garbage included)
  *    yields a well-formed bit string, never a throw.
  *  - EXACTNESS against an INDEPENDENT BigInt oracle for the stub
  *    (byte-cell) path: dHash's cross-multiplied 128-bit comparisons
  *    ([[Multimodal]]'s `prodGt` via `Math.multiplyHigh`) and
  *    spectralHash's WHT sums are replayed here in arbitrary-precision
  *    arithmetic — a wrap or sign bug in the fast path diverges from the
  *    BigInt replay on some generated payload.
  */
object FingerprintProps extends Properties("graft.fingerprints") {

  private val anyBytes: Gen[Array[Byte]] = for {
    magic <- Gen.oneOf(Seq(
      Array[Byte]('B', 'M'), Array[Byte]('P', '6'),
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array.empty[Byte]))
    n <- Gen.chooseNum(0, 400)
    body <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield magic ++ body.toArray

  private def bits(s: String, n: Int): Boolean =
    s.length == n && s.forall(c => c == '0' || c == '1')

  property("dHash: any payload -> 64 bits, never a throw") =
    Prop.forAll(anyBytes)(b => bits(Multimodal.dHashOf(b), 64))

  property("spectralHash: any payload -> 32 bits, never a throw") =
    Prop.forAll(anyBytes)(b => bits(Multimodal.spectralHashOf(b), 32))

  // stub-path payloads only: steer AWAY from image magics so decodeImage
  // is None and the byte-cell path is what the oracle must match
  private val stubBytes: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 500)
    body <- Gen.listOfN(n, Gen.chooseNum(0, 255))
  } yield body.map(_.toByte).toArray.dropWhile(x => x == 'B' || x == 'P' || x == 0x89.toByte)

  private def cells(b: Array[Byte], k: Int): (IndexedSeq[BigInt], IndexedSeq[BigInt]) = {
    val n = b.length.toLong
    val sums = (0 until k).map { i =>
      BigInt(((i * n / k).toInt until ((i + 1) * n / k).toInt).map(p => (b(p) & 0xff).toLong).sum)
    }
    val lens = (0 until k).map(i => BigInt((i + 1) * n / k - i * n / k))
    (sums, lens)
  }

  property("dHash stub == BigInt oracle (validates the 128-bit prodGt)") =
    Prop.forAll(stubBytes) { b =>
      Multimodal.decodeImage(b).isEmpty ==> {
        val (s, l) = cells(b, 65)
        val expect = (0 until 64).map(i =>
          if (s(i + 1) * l(i) > s(i) * l(i + 1)) '1' else '0').mkString
        Multimodal.dHashOf(b) == expect
      }
    }

  property("spectralHash stub == BigInt WHT oracle") =
    Prop.forAll(stubBytes) { b =>
      Multimodal.decodeImage(b).isEmpty ==> {
        val (s, _) = cells(b, 64)
        val expect = (1 to 32).map { k =>
          val wk = (0 until 64).map(j =>
            if (java.lang.Long.bitCount(j & k) % 2 == 1) -s(j) else s(j)).sum
          if (wk > 0) '1' else '0'
        }.mkString
        Multimodal.spectralHashOf(b) == expect
      }
    }
}
