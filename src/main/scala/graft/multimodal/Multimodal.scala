package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media rides as opaque `binary` columns;
  * per-item work (decode / feature-extract / frame-sample) runs in
  * partition-batched iterator form via `mapPartitions` — the Scala/Tungsten
  * analog of PySpark's `mapInPandas` batch shape (one iterator per
  * partition, streaming through rows without materializing the partition).
  *
  * The container ships no image/audio codec LIBRARIES, but four image
  * formats need none: uncompressed 24-bit BMP and binary PPM (P6) parse
  * with plain byte arithmetic, non-interlaced 8-bit RGB/RGBA PNG
  * decodes through the JDK's own zlib (`java.util.zip.Inflater`), and
  * JPEG through the JDK's own `javax.imageio` codec.
  * [[Multimodal.decodeImage]] implements all four for real
  * (magic-sniffed; MultimodalSpec drives hand-built images through the
  * full Spark path). Payloads that are not recognized images — including
  * this repo's synthetic corpus — fall back to the DETERMINISTIC STUB
  * (byte-histogram "features", byte-slice "frames"), so gate-query
  * outputs are unchanged. Everything Spark-side is real either way:
  * binary columns, explicit schemas, partition-batched UDF signature,
  * downstream joins/aggs.
  *
  * Scale: narrow maps, no shuffle; binary payloads stay columnar in
  * parquet; feature vectors are small fixed-size arrays suitable for the
  * `graft.queries.SimilarityQueries` ANN paths.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, feat_idx: Int, feat_value: Double)
  case class MediaFrame(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** DECODE STUB: stands in for an image/audio decoder. Deterministic:
    * class histogram of payload bytes (mod `dim`). */
  private[multimodal] def decodeStub(bytes: Array[Byte], dim: Int): Array[Long] = {
    val hist = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1; i += 1 }
    hist
  }

  /** A really-decoded image: dimensions + row-major top-down RGB bytes
    * (3 per pixel). */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

  /** REAL image decode for the three codec-free formats, magic-sniffed:
    * uncompressed 24-bit BMP ('BM', BITMAPINFOHEADER, biCompression=0),
    * binary PPM ('P6', maxval 255), and non-interlaced 8-bit RGB/RGBA
    * PNG (the JDK ships zlib — `java.util.zip.Inflater` — so no codec
    * dependency). Returns None for anything else (callers fall back to
    * the stub), and None — never garbage — for truncated/malformed
    * payloads of any format. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P') decodePng(bytes)
    else if (bytes.length >= 3 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte
      && bytes(2) == 0xFF.toByte) decodeJpeg(bytes)
    else None

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 54) return None
    val pixelOff = le32(b, 10)
    val width = le32(b, 18)
    val heightRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || heightRaw == 0) return None
    val height = math.abs(heightRaw.toLong)
    val topDown = heightRaw < 0
    // ALL size arithmetic in Long: a hostile declared width would wrap
    // int32 (24*width, width*height*3), slip past the bounds check, and
    // crash the allocation instead of returning None; the payload-length
    // bound below also caps the output allocation at ~|payload|
    val rowSize = ((24L * width + 31) / 32) * 4 // rows pad to 4 bytes
    // rowSize·height itself can wrap Long (~6.4e9 × 2.1e9 ≈ 1.4e19 >
    // 2^63) — reject each factor against the payload length FIRST, so
    // the product below is ≤ 2^62 and the check cannot wrap negative
    if (height > b.length || rowSize > b.length) return None
    if (pixelOff < 54 || pixelOff.toLong + rowSize * height > b.length) return None
    // past the bound, rowSize*height <= |payload| implies width*height*3
    // and height both fit comfortably in Int
    val h = height.toInt
    val rs = rowSize.toInt
    val out = new Array[Byte](width * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y // stored bottom-up
      var x = 0
      while (x < width) {
        val s = pixelOff + srcRow * rs + x * 3 // BGR on disk
        val d = (y * width + x) * 3
        out(d) = b(s + 2)
        out(d + 1) = b(s + 1)
        out(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, h, out))
  }

  private def decodePpm(b: Array[Byte]): Option[DecodedImage] = {
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB;
    // '#' comments run to end-of-line anywhere whitespace is allowed
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      val start = i
      while (i < b.length && (b(i) >= '0' && b(i) <= '9')) i += 1
      if (i == start || i - start > 9) None
      else Some(new String(b, start, i - start, "US-ASCII").toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      // the byte after maxval must BE whitespace (a CRLF-written header
      // would otherwise shift the raster by one byte — garbage pixels,
      // not a detected failure)
      if w > 0 && h > 0 && maxv == 255 && i < b.length && b(i).toChar.isWhitespace
      _ = { i += 1 } // consume exactly that one whitespace
      if i.toLong + 3L * w * h <= b.length
    } yield DecodedImage(w, h, java.util.Arrays.copyOfRange(b, i, i + 3 * w * h))
  }

  /** Baseline/progressive JPEG via the JDK's own `javax.imageio` codec —
    * zero new dependencies, and the format ~90% of real image corpora
    * ship in. Hostile-input posture matches the hand-rolled decoders:
    * dimensions are read from the header BEFORE any raster decode (the
    * reader API exposes them without decoding), the pixel count is
    * capped at 2^24 (~16M px → a 48 MB raster) so a declared-huge or
    * crafted header returns None instead of allocating, truncated or
    * malformed entropy streams surface as None via the catch, and the
    * in-memory stream cache keeps executors from writing ImageIO tmp
    * files per task. Decode is deterministic within a JVM (one libjpeg
    * implementation); the synthetic gate corpus carries no JPEG
    * payloads, so oracle outputs are untouched. */
  private def decodeJpeg(b: Array[Byte]): Option[DecodedImage] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
        val img = reader.read(0)
        val px = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, px, 0, w)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          rgb(3 * i) = ((p >> 16) & 0xff).toByte
          rgb(3 * i + 1) = ((p >> 8) & 0xff).toByte
          rgb(3 * i + 2) = (p & 0xff).toByte
          i += 1
        }
        Some(DecodedImage(w, h, rgb))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Non-interlaced 8-bit truecolor PNG (colorType 2 = RGB, 6 = RGBA;
    * alpha dropped on output). zlib inflate via `java.util.zip.Inflater`
    * (ships with the JDK — zero new dependencies), then the five
    * standard per-row filters (None/Sub/Up/Average/Paeth) reconstructed
    * exactly per the PNG spec. Hostile-input posture matches decodeBmp:
    * every dimension product is Long-checked BEFORE allocation, the
    * raster is capped at 64 MB (a declared-huge header or a deflate
    * bomb returns None instead of allocating), truncated/garbage
    * streams surface as None via inflate accounting, and chunk walking
    * bounds-checks every length. CRCs are not verified — corruption
    * the CRC would catch either fails inflation or yields a
    * deterministic wrong-pixels image, never a crash. */
  private def decodePng(b: Array[Byte]): Option[DecodedImage] = {
    // 8-byte signature + the 25-byte IHDR chunk (len+type+13 data+crc)
    if (b.length < 33) return None
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != sig(i)) return None; i += 1 }
    if (be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val comp = b(26) & 0xff
    val filt = b(27) & 0xff
    val inter = b(28) & 0xff
    if (width <= 0 || height <= 0 || bitDepth != 8 ||
      (colorType != 2 && colorType != 6) || comp != 0 || filt != 0 || inter != 0)
      return None
    val bpp = if (colorType == 2) 3 else 4
    // Long math + absolute cap BEFORE any allocation: a 2^31-square
    // header must not reach `new Array`
    val rowBytes = 1L + bpp.toLong * width
    val rasterLen = rowBytes * height
    if (rasterLen > (1L << 26)) return None
    // walk chunks, concatenating IDAT payloads until IEND
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33
    var done = false
    while (!done) {
      if (off + 8 > b.length) return None // ran out before IEND
      val len = be32(b, off)
      if (len < 0 || off + 12L + len > b.length) return None
      if (b(off + 4) == 'I' && b(off + 5) == 'D' && b(off + 6) == 'A' && b(off + 7) == 'T')
        idat.write(b, off + 8, len)
      else if (b(off + 4) == 'I' && b(off + 5) == 'E' && b(off + 6) == 'N' && b(off + 7) == 'D')
        done = true
      off += 12 + len
    }
    val raw = new Array[Byte](rasterLen.toInt)
    val inf = new java.util.zip.Inflater()
    val ok = try {
      inf.setInput(idat.toByteArray)
      var n = 0
      var stuck = false
      while (n < raw.length && !inf.finished() && !stuck) {
        val k = inf.inflate(raw, n, raw.length - n)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) stuck = true
        n += k
      }
      !stuck && n == raw.length
    } catch {
      case _: java.util.zip.DataFormatException => false
    } finally inf.end()
    if (!ok) return None
    // reconstruct the five row filters into packed pixel rows
    val stride = bpp * width
    val rb = rowBytes.toInt
    val recon = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * rb) & 0xff
      val rs = y * rb + 1
      val ds = y * stride
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val cur = raw(rs + x) & 0xff
        val left = if (x >= bpp) recon(ds + x - bpp) & 0xff else 0
        val up = if (y > 0) recon(ds - stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) recon(ds - stride + x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case _ => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        recon(ds + x) = rec.toByte
        x += 1
      }
      y += 1
    }
    if (bpp == 3) Some(DecodedImage(width, height, recon))
    else { // RGBA → RGB (alpha dropped)
      val out = new Array[Byte](width * height * 3)
      var p = 0
      var q = 0
      while (q < recon.length) {
        out(p) = recon(q); out(p + 1) = recon(q + 1); out(p + 2) = recon(q + 2)
        p += 3; q += 4
      }
      Some(DecodedImage(width, height, out))
    }
  }

  /** Luminance histogram of a decoded image over `dim` bins (integer
    * BT.601 weights) — the "real decode" feature path. */
  private[multimodal] def luminanceHist(img: DecodedImage, dim: Int): Array[Long] = {
    val hist = new Array[Long](dim)
    var p = 0
    while (p < img.rgb.length) {
      val lum = (299 * (img.rgb(p) & 0xff) + 587 * (img.rgb(p + 1) & 0xff) +
        114 * (img.rgb(p + 2) & 0xff)) / 1000
      hist(lum * dim / 256) += 1
      p += 3
    }
    hist
  }

  /** A really-decoded audio clip: sample rate + mono-mixed signed
    * samples (stereo averages the two channels in exact integer
    * arithmetic, truncating toward zero). */
  final case class DecodedAudio(sampleRate: Int, samples: Array[Int])

  /** REAL audio decode for the codec-free format: RIFF/WAVE PCM
    * (audioFormat 1), 16-bit, mono or stereo. Same hostile-input posture
    * as the image decoders: every chunk length is Long-bounds-checked
    * against the payload before any read, malformed/truncated streams
    * return None (callers fall back to the byte-sample stub), and the
    * sample allocation is capped by the actual data chunk length. */
  def decodeWav(b: Array[Byte]): Option[DecodedAudio] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var fmtOk = false
    var channels = 0
    var rate = 0
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val len = le32(b, off + 4)
      if (len < 0 || off + 8L + len > b.length) return None
      if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' && b(off + 3) == ' ' && len >= 16) {
        val audioFormat = le16(b, off + 8)
        channels = le16(b, off + 10)
        rate = le32(b, off + 12)
        val bits = le16(b, off + 22)
        fmtOk = audioFormat == 1 && bits == 16 && (channels == 1 || channels == 2) && rate > 0
        if (!fmtOk) return None
      } else if (b(off) == 'd' && b(off + 1) == 'a' && b(off + 2) == 't' && b(off + 3) == 'a') {
        dataOff = off + 8; dataLen = len
      }
      off += 8 + len + (len & 1) // RIFF chunks pad to even offsets
    }
    if (!fmtOk || dataOff < 0) return None
    val bytesPerFrame = 2 * channels
    val n = dataLen / bytesPerFrame
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      var acc = 0
      var ch = 0
      while (ch < channels) {
        val o = dataOff + i * bytesPerFrame + ch * 2
        acc += (((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)).toShort.toInt
        ch += 1
      }
      out(i) = acc / channels
      i += 1
    }
    Some(DecodedAudio(rate, out))
  }

  case class AudioWindow(doc_id: Long, window_idx: Int, n_samples: Long, energy: Long)

  /** Windowed audio energy — Σ sample² per `window`-sample window, exact
    * int64 (a full 256-sample window of int16 peaks at ~2.7×10¹¹, eight
    * orders under the long ceiling). Recognized WAV payloads use the
    * REAL decoded samples; anything else takes the unsigned-byte stub
    * (payload bytes AS samples — deterministic, and character-replayable
    * by the DuckDB oracle over ASCII text payloads). Partition-batched
    * like the image paths. */
  def audioEnergy(df: DataFrame, idCol: String, payloadCol: String,
                  window: Int = 256): Dataset[AudioWindow] = {
    require(window > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val samples: Array[Int] = decodeWav(bytes) match {
            case Some(a) => a.samples
            case None => bytes.map(x => x & 0xff)
          }
          samples.grouped(window).zipWithIndex.map { case (w, i) =>
            var e = 0L
            w.foreach(s => e += s.toLong * s)
            AudioWindow(id, i, w.length.toLong, e)
          }
        }
      }
  }

  case class SilenceProfile(doc_id: Long, n_windows: Long, n_silent: Long,
                            longest_silence: Long, active_ratio: Double)

  /** Windowed silence detection — the VAD-style trim/segment audit an
    * audio-curation pipeline runs before transcription (silence-heavy
    * clips are cheap to drop; long internal silences mark segment
    * boundaries). A window is SILENT when at least 1/`mult` of its
    * samples sit below the low-amplitude floor; the profile reports
    * window/silent counts, the LONGEST consecutive silent run (the
    * segmentation signal) and the active ratio. Recognized WAV payloads
    * use the real decoded int16 samples (floor scaled ×256); anything
    * else takes the unsigned-byte stub, character-replayable by the
    * DuckDB oracle over ASCII text payloads (ascii(c) < `lowAmp`).
    * Exact integer counting per partition batch; the one double is the
    * final ratio. */
  def silenceProfile(df: DataFrame, idCol: String, payloadCol: String,
                     window: Int = 64, lowAmp: Int = 64,
                     mult: Int = 5): Dataset[SilenceProfile] = {
    require(window > 0 && lowAmp > 0 && mult > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (samples: Array[Int], floor: Int) = decodeWav(bytes) match {
            case Some(a) => (a.samples, lowAmp * 256) // int16 scale
            case None => (bytes.map(x => x & 0xff), lowAmp)
          }
          if (samples.isEmpty) Iterator.empty
          else {
            var ns = 0; var run = 0; var best = 0; var nw = 0
            samples.grouped(window).foreach { w =>
              nw += 1
              val nLow = w.count(s => math.abs(s) < floor)
              if (mult * nLow >= w.length) { ns += 1; run += 1; best = math.max(best, run) }
              else run = 0
            }
            Iterator.single(SilenceProfile(id, nw.toLong, ns.toLong, best.toLong,
              (nw - ns).toDouble / nw))
          }
        }
      }
  }

  case class ClipProfile(doc_id: Long, n_samples: Long, n_clipped: Long,
                         max_amp: Long, longest_clip_run: Long, clip_rate: Double)

  /** CLIPPING detection — the rail-hitting audit an audio-curation
    * pipeline runs before training on a clip (a recording that slams the
    * converter's rails carries distortion, and a long consecutive
    * clipped RUN is the tell that separates true clipping from a single
    * hot sample). Reports per item: sample count, clipped-sample count,
    * max amplitude, the longest consecutive clipped run, and the clip
    * rate. Recognized WAV payloads use the real |int16| samples against
    * `clipAmp`·256 (the silenceProfile scale convention); anything else
    * takes the unsigned-byte stub, character-replayable by the DuckDB
    * oracle over ASCII text payloads (ascii(c) >= `clipAmp`). Exact
    * integer counting per partition batch; the one double is the final
    * rate. */
  def clipProfile(df: DataFrame, idCol: String, payloadCol: String,
                  clipAmp: Int = 120): Dataset[ClipProfile] = {
    require(clipAmp > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (samples: Array[Int], rail: Int) = decodeWav(bytes) match {
            case Some(a) => (a.samples.map(math.abs), clipAmp * 256) // int16 scale
            case None => (bytes.map(x => x & 0xff), clipAmp)
          }
          if (samples.isEmpty) Iterator.empty
          else {
            var nc = 0; var run = 0; var best = 0; var mx = 0
            samples.foreach { s =>
              mx = math.max(mx, s)
              if (s >= rail) { nc += 1; run += 1; best = math.max(best, run) }
              else run = 0
            }
            Iterator.single(ClipProfile(id, samples.length.toLong, nc.toLong,
              mx.toLong, best.toLong, nc.toDouble / samples.length))
          }
        }
      }
  }

  /** Feature extraction over a binary payload column, one output row per
    * (item, feature-slot). Recognized images decode for REAL (luminance
    * histogram over the pixels, normalized by pixel count); anything else
    * takes the byte-histogram stub normalized by payload length.
    * Partition-batched: the lambda sees a whole partition's iterator
    * (mapInPandas shape). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      dim: Int = 16): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (hist, n) = decodeImage(bytes) match {
            case Some(img) => (luminanceHist(img, dim), math.max(img.width * img.height, 1))
            case None => (decodeStub(bytes, dim), math.max(bytes.length, 1))
          }
          hist.iterator.zipWithIndex.map { case (c, i) =>
            MediaFeature(id, i, c.toDouble / n)
          }
        }
      }
  }

  case class MediaHash(doc_id: Long, ahash: String)

  /** Average-hash (aHash) perceptual fingerprint as a 64-char '0'/'1'
    * string: recognized images get the REAL hash — an 8×8 grid over the
    * decoded pixels, bit set when the cell's (r+g+b) sum exceeds the
    * global mean (cross-multiplied cellSum·nPixTotal > totalSum·nPixCell,
    * compared in exact 128 bits — see [[prodGt]]; DuckDB's HUGEINT replay
    * agrees) — unrecognized payloads hash a 64-cell byte-range
    * grid with the same cross-multiplied rule (the decode stub; for ASCII
    * text payloads the DuckDB oracle replays it character-wise). Both
    * paths are deterministic and partitioning-free, so the downstream
    * near-dup join is engine-exact. */
  /** True iff a·b > c·d with all operands non-negative int64 — compared
    * in full 128-bit precision via Math.multiplyHigh, because the naive
    * Long products overflow for multi-GB payloads (255·n·(n/64) passes
    * 2^63 near n ≈ 1.5e9) and a silent wrap would flip hash bits. */
  private def prodGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
  }

  def aHash(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes0) =>
          // a NULL payload row decodes to a null array — hash it as empty
          // (all-zero fingerprint) instead of NPEing the task
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          val bits = new StringBuilder(64)
          decodeImage(bytes) match {
            case Some(img) =>
              val (w, h) = (img.width, img.height)
              val sums = new Array[Long](64); val npx = new Array[Long](64)
              var total = 0L
              var y = 0
              while (y < h) {
                // Long cell arithmetic: y*8 wraps Int32 for >268M-pixel
                // edges, which decodePpm's Long-checked bounds admit
                val cy = math.min(y.toLong * 8 / h, 7L).toInt
                var x = 0
                while (x < w) {
                  val cx = math.min(x.toLong * 8 / w, 7L).toInt
                  val p = (y * w + x) * 3
                  val s = (img.rgb(p) & 0xff) + (img.rgb(p + 1) & 0xff) + (img.rgb(p + 2) & 0xff)
                  sums(cy * 8 + cx) += s; npx(cy * 8 + cx) += 1; total += s
                  x += 1
                }
                y += 1
              }
              val nAll = w.toLong * h
              var i = 0
              while (i < 64) {
                bits.append(if (prodGt(sums(i), nAll, total, npx(i))) '1' else '0'); i += 1
              }
            case None =>
              val n = bytes.length.toLong
              var total = 0L
              val sums = new Array[Long](64)
              var i = 0
              while (i < 64) {
                var p = (i * n / 64).toInt
                val hi = ((i + 1) * n / 64).toInt
                while (p < hi) { sums(i) += bytes(p) & 0xff; p += 1 }
                total += sums(i); i += 1
              }
              i = 0
              while (i < 64) {
                val len = (i + 1) * n / 64 - i * n / 64
                bits.append(if (prodGt(sums(i), n, total, len)) '1' else '0'); i += 1
              }
          }
          MediaHash(id, bits.toString)
        }
      }
  }

  case class MediaDHash(doc_id: Long, dhash: String)

  /** Difference-hash (dHash) perceptual fingerprint as a 64-char '0'/'1'
    * string — the GRADIENT twin of [[aHash]]: where aHash thresholds each
    * cell against the global mean (and so flips wholesale under
    * brightness shifts), dHash sets bit (r,c) when the right neighbor of
    * an 8×9 brightness grid is strictly brighter — invariant to any
    * monotone global brightness change. Recognized images compare
    * per-pixel cell means cross-multiplied in exact 128 bits
    * ([[prodGt]]); unrecognized payloads (the decode stub) compare 65
    * consecutive byte-range cells the same way, and for ASCII text the
    * DuckDB oracle replays that path character-wise. Deterministic and
    * partitioning-free, like aHash. */
  def dHash(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaDHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, b) => MediaDHash(id, dHashOf(b)) })
  }

  /** Pure per-payload dHash (exposed for property tests — the Dataset
    * wrapper above is a thin map over it). */
  private[graft] def dHashOf(bytes0: Array[Byte]): String = {
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          val bits = new StringBuilder(64)
          decodeImage(bytes) match {
            case Some(img) =>
              val (w, h) = (img.width, img.height)
              val sums = new Array[Long](72); val npx = new Array[Long](72)
              var y = 0
              while (y < h) {
                // Long cell arithmetic, same >268M-pixel-edge guard as aHash
                val cy = math.min(y.toLong * 8 / h, 7L).toInt
                var x = 0
                while (x < w) {
                  val cx = math.min(x.toLong * 9 / w, 8L).toInt
                  val p = (y * w + x) * 3
                  val s = (img.rgb(p) & 0xff) + (img.rgb(p + 1) & 0xff) + (img.rgb(p + 2) & 0xff)
                  sums(cy * 9 + cx) += s; npx(cy * 9 + cx) += 1
                  x += 1
                }
                y += 1
              }
              var r = 0
              while (r < 8) {
                var c = 0
                while (c < 8) {
                  val l = r * 9 + c
                  // right neighbor's mean > this cell's mean, cross-multiplied
                  bits.append(if (prodGt(sums(l + 1), npx(l), sums(l), npx(l + 1))) '1' else '0')
                  c += 1
                }
                r += 1
              }
            case None =>
              val n = bytes.length.toLong
              val sums = new Array[Long](65); val lens = new Array[Long](65)
              var i = 0
              while (i < 65) {
                var p = (i * n / 65).toInt
                val hi = ((i + 1) * n / 65).toInt
                lens(i) = hi - p
                while (p < hi) { sums(i) += bytes(p) & 0xff; p += 1 }
                i += 1
              }
              i = 0
              while (i < 64) {
                bits.append(if (prodGt(sums(i + 1), lens(i), sums(i), lens(i + 1))) '1' else '0')
                i += 1
              }
          }
          bits.toString
  }

  case class MediaSHash(doc_id: Long, shash: String)

  /** SPECTRAL perceptual fingerprint — the pHash idea with the DCT
    * replaced by a 64-point Walsh–Hadamard transform, W_k = Σ_j c_j ·
    * (−1)^popcount(j AND k), because WHT coefficients are EXACT int64
    * (±1 butterflies, no cosine table, no libm) and so replay
    * bit-for-bit in any engine. The 32-char fingerprint is the sign
    * pattern of coefficients k = 1..32 (DC excluded): signs capture the
    * coarse spectral shape the way pHash's median-threshold does, and —
    * unlike [[aHash]]/[[dHash]] cell comparisons — react to global
    * STRUCTURE (periodicity, left/right mass) rather than local
    * gradients. Uniform-brightness shifts leave every k ≠ 0 coefficient
    * unchanged whenever cells hold equal pixel counts (the shift adds
    * 30·npx·Σ_j(−1)^popcount(j∧k) = 0), spec-pinned. Recognized images
    * transform the 8×8 luminance cell sums; other payloads the 64
    * byte-range cells (decode stub; ASCII text replays char-wise in the
    * oracle). */
  def spectralHash(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaSHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, b) => MediaSHash(id, spectralHashOf(b)) })
  }

  /** Pure per-payload spectral hash (exposed for property tests). */
  private[graft] def spectralHashOf(bytes0: Array[Byte]): String = {
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          val cells = new Array[Long](64)
          decodeImage(bytes) match {
            case Some(img) =>
              val (w, h) = (img.width, img.height)
              var y = 0
              while (y < h) {
                val cy = math.min(y.toLong * 8 / h, 7L).toInt
                var x = 0
                while (x < w) {
                  val cx = math.min(x.toLong * 8 / w, 7L).toInt
                  val p = (y * w + x) * 3
                  cells(cy * 8 + cx) +=
                    (img.rgb(p) & 0xff) + (img.rgb(p + 1) & 0xff) + (img.rgb(p + 2) & 0xff)
                  x += 1
                }
                y += 1
              }
            case None =>
              val n = bytes.length.toLong
              var i = 0
              while (i < 64) {
                var p = (i * n / 64).toInt
                val hi = ((i + 1) * n / 64).toInt
                while (p < hi) { cells(i) += bytes(p) & 0xff; p += 1 }
                i += 1
              }
          }
          val bits = new StringBuilder(32)
          var k = 1
          while (k <= 32) {
            var wk = 0L
            var j = 0
            while (j < 64) {
              wk += (if ((java.lang.Long.bitCount(j & k) & 1) == 1) -cells(j) else cells(j))
              j += 1
            }
            bits.append(if (wk > 0) '1' else '0')
            k += 1
          }
          bits.toString
  }

  case class ResizedMedia(doc_id: Long, resized_len: Int, resized_md5: String)

  /** Resize: recognized images get a REAL nearest-neighbor downscale by
    * `stride` over pixels (output = row-major RGB of the ⌈w/stride⌉ ×
    * ⌈h/stride⌉ image); other payloads keep every `stride`-th byte (the
    * resampler stub). Schema, batch shape, and downstream metadata are
    * identical either way. */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
             stride: Int = 4): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          val out = decodeImage(bytes) match {
            case Some(img) =>
              val w2 = (img.width + stride - 1) / stride
              val h2 = (img.height + stride - 1) / stride
              val o = new Array[Byte](w2 * h2 * 3)
              var y = 0
              while (y < h2) {
                var x = 0
                while (x < w2) {
                  val s = ((y * stride) * img.width + x * stride) * 3
                  val d = (y * w2 + x) * 3
                  o(d) = img.rgb(s); o(d + 1) = img.rgb(s + 1); o(d + 2) = img.rgb(s + 2)
                  x += 1
                }
                y += 1
              }
              o
            case None => Array.range(0, bytes.length, stride).map(bytes(_))
          }
          ResizedMedia(id, out.length, md.digest(out).map("%02x".format(_)).mkString)
        }
      }
  }

  /** Frame sampling over a binary payload treated as fixed-size frames
    * (a video decoder stub): every `stride`-th 256-byte frame, fingerprinted
    * with md5. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameSize: Int = 256, stride: Int = 4): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, bytes) =>
          val nFrames = math.ceil(bytes.length.toDouble / frameSize).toInt
          (0 until nFrames).filter(_ % stride == 0).map { f =>
            val from = f * frameSize
            val until = math.min(from + frameSize, bytes.length)
            val hex = md.digest(java.util.Arrays.copyOfRange(bytes, from, until))
              .map("%02x".format(_)).mkString
            MediaFrame(id, f, hex)
          }
        }
      }
  }
}
