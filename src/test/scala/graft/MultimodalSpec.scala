package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf001, "documents")
    .withColumn("payload", col("text").cast("binary"))

  test("feature extraction: dim rows per doc, normalized histogram sums to ~1") {
    val feats = Multimodal.extractFeatures(docs.limit(20), "doc_id", "payload", dim = 16)
    val byDoc = feats.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("feat_value").as("s"))
      .collect()
    assert(byDoc.length == 20)
    byDoc.foreach { r =>
      assert(r.getAs[Long]("n") == 16)
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9)
    }
  }

  test("frame sampling: stride-4 indices, md5 matches whole-payload slices") {
    val frames = Multimodal.sampleFrames(docs.limit(5), "doc_id", "payload").collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    // cross-check one fingerprint against a direct computation
    val d0 = docs.limit(5).select("doc_id", "text").as[(Long, String)].collect().head
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(d0._2.getBytes("UTF-8").take(256)).map("%02x".format(_)).mkString
    assert(frames.filter(f => f.doc_id == d0._1 && f.frame_idx == 0).head.frame_md5 == expect)
  }

  test("binary payload round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString + "/out"
    docs.select("doc_id", "payload").limit(10).write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    assert(back.count() == 10)
  }

  /** Hand-built 4×2 uncompressed 24-bit BMP: top row (255,0,0) (0,255,0)
    * (0,0,255) (255,255,255), bottom row (0,0,0) (64,64,64) (128,128,128)
    * (192,192,192); stored bottom-up, BGR, rows already 4-byte aligned. */
  private def tinyBmp: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + 24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + 24)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel offset
    bb.putInt(40).putInt(4).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(24).putInt(0).putInt(0).putInt(0).putInt(0)
    def px(r: Int, g: Int, b: Int): Unit = // disk order is BGR
      bb.put(b.toByte).put(g.toByte).put(r.toByte)
    // bottom row first (bottom-up storage)
    px(0, 0, 0); px(64, 64, 64); px(128, 128, 128); px(192, 192, 192)
    px(255, 0, 0); px(0, 255, 0); px(0, 0, 255); px(255, 255, 255)
    bb.array()
  }

  private def tinyPpm: Array[Byte] = {
    val header = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII")
    val pixels = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30).map(_.toByte)
    header ++ pixels
  }

  test("real BMP decode: dimensions, top-down RGB order, comment-tolerant PPM") {
    val bmp = Multimodal.decodeImage(tinyBmp).get
    assert(bmp.width == 4 && bmp.height == 2)
    // first decoded pixel must be the TOP-left (255,0,0), despite
    // bottom-up BGR storage
    assert((bmp.rgb(0) & 0xff, bmp.rgb(1) & 0xff, bmp.rgb(2) & 0xff) == ((255, 0, 0)))
    assert((bmp.rgb(21) & 0xff, bmp.rgb(22) & 0xff, bmp.rgb(23) & 0xff) == ((192, 192, 192)))
    val ppm = Multimodal.decodeImage(tinyPpm).get
    assert(ppm.width == 2 && ppm.height == 2)
    assert((ppm.rgb(9) & 0xff, ppm.rgb(10) & 0xff, ppm.rgb(11) & 0xff) == ((10, 20, 30)))
    // garbage and truncations stay None, never garbage pixels
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(tinyBmp.take(40)).isEmpty)
    assert(Multimodal.decodeImage(tinyPpm.take(10)).isEmpty)
  }

  /** Hand-built 2×2 non-interlaced 8-bit PNG, deflated with the JDK's
    * own Deflater and CRC'd properly: row 0 carries filter 0 (None),
    * row 1 filter 2 (Up) — so the unfilter path is actually exercised —
    * and the IDAT stream is split across TWO chunks to exercise
    * concatenation. Pixels: (255,0,0) (0,255,0) / (0,0,255) (10,20,30). */
  private def tinyPng(colorType: Int): Array[Byte] = {
    val bpp = if (colorType == 2) 3 else 4
    val px = Array(Array(255, 0, 0), Array(0, 255, 0), Array(0, 0, 255), Array(10, 20, 30))
    val rows = Array.tabulate(2, 2 * bpp) { (y, x) =>
      val p = px(y * 2 + x / bpp)
      (if (x % bpp < 3) p(x % bpp) else 128).toByte // alpha = 128 when RGBA
    }
    val sc = new java.io.ByteArrayOutputStream()
    sc.write(0); sc.write(rows(0)) // filter None
    sc.write(2) // filter Up: stored byte = cur - up
    for (x <- 0 until 2 * bpp) sc.write((rows(1)(x) - rows(0)(x)) & 0xff)
    val defl = new java.util.zip.Deflater()
    defl.setInput(sc.toByteArray); defl.finish()
    val buf = new Array[Byte](1024)
    val comp = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) { val n = defl.deflate(buf); comp.write(buf, 0, n) }
    defl.end()
    def chunk(ty: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(ty.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(ty.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val cz = comp.toByteArray
    val (c1, c2) = cz.splitAt(cz.length / 2)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", c1) ++ chunk("IDAT", c2) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("real PNG decode: RGB and RGBA, Up-filtered row, split IDAT, hostile headers") {
    val wantRgb = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30).map(_.toByte)
    for (ct <- Seq(2, 6)) {
      val img = Multimodal.decodeImage(tinyPng(ct)).get
      assert(img.width == 2 && img.height == 2, s"colorType $ct")
      assert(img.rgb.toSeq == wantRgb.toSeq, s"colorType $ct: ${img.rgb.mkString(",")}")
    }
    // truncations and garbage stay None, never garbage pixels
    val png = tinyPng(2)
    assert(Multimodal.decodeImage(png.take(20)).isEmpty)
    assert(Multimodal.decodeImage(png.dropRight(15)).isEmpty) // mid-IDAT cut
    // a declared-huge header (2^24 square ≈ 800 GB raster) must return
    // None before allocating anything
    val huge = png.clone()
    huge(16) = 1; huge(20) = 1 // width, height high bytes → 2^24
    assert(Multimodal.decodeImage(huge).isEmpty)
    // corrupt deflate stream → None via inflate accounting
    val corrupt = png.clone()
    corrupt(41) = (corrupt(41) ^ 0x55).toByte
    assert(Multimodal.decodeImage(corrupt).isEmpty ||
      Multimodal.decodeImage(corrupt).get.rgb.length == 12) // wrong pixels ok, crash not
  }

  /** JDK-encoded baseline JPEG: solid color, so the lossy round trip
    * can be asserted within a tolerance. */
  private def tinyJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out), "JDK must ship a JPEG encoder")
    out.toByteArray
  }

  test("real JPEG decode via the JDK codec: dims, lossy tolerance, hostile bytes") {
    val bytes = tinyJpeg(6, 4, 0x4080C0)
    assert(bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte, "JPEG magic expected")
    val img = Multimodal.decodeImage(bytes).get
    assert(img.width == 6 && img.height == 4)
    assert(img.rgb.length == 6 * 4 * 3)
    // a solid color survives the lossy round trip within JPEG tolerance
    val (r, g, b) = (img.rgb(0) & 0xff, img.rgb(1) & 0xff, img.rgb(2) & 0xff)
    assert(math.abs(r - 0x40) <= 8 && math.abs(g - 0x80) <= 8 && math.abs(b - 0xC0) <= 8,
      s"lossy drift too large: ($r,$g,$b)")
    // magic-prefixed junk: None, never a throw; a truncated entropy
    // stream may decode partially on some readers — the contract is
    // None-or-well-formed, never a crash (DecoderProps fuzzes this)
    assert(Multimodal.decodeImage(Array(0xFF, 0xD8, 0xFF, 0x00).map(_.toByte)).isEmpty)
    val trunc = Multimodal.decodeImage(bytes.take(bytes.length / 2))
    assert(trunc.forall(i => i.rgb.length == i.width * i.height * 3))
  }

  test("PNG payloads take the real feature/resize path through Spark") {
    val df = Seq((1L, tinyPng(2)), (2L, "plain bytes".getBytes)).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload", dim = 4)
      .collect().groupBy(_.doc_id)
    // luminance bins of the 4 known pixels: lums 76,149,29,18 →
    // bins (lum*4/256): 1, 2, 0, 0 — normalized by 4 pixels
    val got = feats(1L).sortBy(_.feat_idx).map(_.feat_value)
    assert(got.toSeq == Seq(2 / 4.0, 1 / 4.0, 1 / 4.0, 0.0), got.mkString(","))
    assert(math.abs(feats(2L).map(_.feat_value).sum - 1.0) < 1e-9) // stub preserved
    // resize stride 2 on 2×2 → 1×1: the top-left pixel survives
    val rz = Multimodal.resize(df, "doc_id", "payload", stride = 2)
      .collect().map(r => r.doc_id -> r).toMap
    assert(rz(1L).resized_len == 3)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array(255, 0, 0).map(_.toByte)).map("%02x".format(_)).mkString
    assert(rz(1L).resized_md5 == expectMd5)
  }

  /** Hand-built RIFF/WAVE PCM16: canonical 44-byte header + LE samples. */
  private def tinyWav(channels: Int, samples: Seq[Seq[Int]]): Array[Byte] = {
    val dataLen = 2 * channels * samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(8000).putInt(8000 * 2 * channels).putShort((2 * channels).toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(frame => frame.foreach(s => bb.putShort(s.toShort)))
    bb.array()
  }

  test("real WAV decode: mono samples, stereo integer mix, windowed energy") {
    val mono = tinyWav(1, Seq(Seq(100), Seq(-200), Seq(32767), Seq(-32768)))
    val a = Multimodal.decodeWav(mono).get
    assert(a.sampleRate == 8000)
    assert(a.samples.toSeq == Seq(100, -200, 32767, -32768))
    // stereo mixes channels in exact integer arithmetic
    val st = tinyWav(2, Seq(Seq(100, 200), Seq(-100, -301)))
    assert(Multimodal.decodeWav(st).get.samples.toSeq == Seq(150, -200))
    // garbage and truncations fall to None (callers stub), never garbage
    assert(Multimodal.decodeWav("not audio at all - too short".getBytes).isEmpty)
    assert(Multimodal.decodeWav(mono.dropRight(3)).isEmpty)
    // the Spark path: real WAV → real samples; text → byte stub
    val df = Seq((1L, mono), (2L, "abc".getBytes)).toDF("doc_id", "payload")
    val win = Multimodal.audioEnergy(df, "doc_id", "payload", window = 2)
      .collect().groupBy(_.doc_id)
    val w1 = win(1L).sortBy(_.window_idx)
    assert(w1.map(_.energy).toSeq ==
      Seq(100L * 100 + 200L * 200, 32767L * 32767 + 32768L * 32768))
    assert(w1.forall(_.n_samples == 2))
    // stub: unsigned bytes as samples — 'a'²+'b'² then 'c'²
    val w2 = win(2L).sortBy(_.window_idx)
    assert(w2.map(_.energy).toSeq == Seq(97L * 97 + 98L * 98, 99L * 99))
    assert(w2.map(_.n_samples).toSeq == Seq(2L, 1L))
  }

  test("clipping profile: real WAV rails vs byte stub, run length, empty drop") {
    // |int16| >= 120*256 = 30720 counts as clipped on the real path;
    // 32767, -32768, 31000 clip (the NEGATIVE rail via abs), 100 does not,
    // and the longest run must span the consecutive trio
    val mono = tinyWav(1, Seq(Seq(100), Seq(32767), Seq(-32768), Seq(31000), Seq(-200)))
    val df = Seq((1L, mono), (2L, "xyza".getBytes), (3L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val out = Multimodal.clipProfile(df, "doc_id", "payload", clipAmp = 120)
      .collect().map(p => p.doc_id -> p).toMap
    assert(!out.contains(3L), "empty payloads drop (the oracle's length>0 filter)")
    val wav = out(1L)
    assert(wav.n_samples == 5 && wav.n_clipped == 3 && wav.longest_clip_run == 3)
    assert(wav.max_amp == 32768)
    assert(wav.clip_rate == 3.0 / 5)
    // stub: 'x'=120 'y'=121 'z'=122 clip, 'a'=97 does not; run = 3
    val stub = out(2L)
    assert(stub.n_samples == 4 && stub.n_clipped == 3 && stub.longest_clip_run == 3)
    assert(stub.max_amp == 122 && stub.clip_rate == 3.0 / 4)
  }

  test("recognized images take the real feature/resize path through Spark") {
    val df = Seq((1L, tinyBmp), (2L, "plain bytes".getBytes)).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload", dim = 4)
      .collect().groupBy(_.doc_id)
    // BMP: luminance bins of the 8 known pixels, normalized by PIXELS.
    // BT.601 lums: 76,149,29,255 / 0,64,128,192 → bins (lum*4/256):
    // {29,0}→0, {76,64}→1, {149,128}→2, {255,192}→3 — two each
    val expect = Array(2, 2, 2, 2).map(_ / 8.0)
    val got = feats(1L).sortBy(_.feat_idx).map(_.feat_value)
    assert(got.toSeq == expect.toSeq, got.mkString(","))
    // the stub path still normalizes by byte length
    assert(math.abs(feats(2L).map(_.feat_value).sum - 1.0) < 1e-9)
    // resize: stride 2 on the 4×2 BMP → 2×1 RGB = 6 bytes, top-left and
    // top-third pixels survive
    val rz = Multimodal.resize(df, "doc_id", "payload", stride = 2)
      .collect().map(r => r.doc_id -> r).toMap
    assert(rz(1L).resized_len == 6)
    val expectBytes = Array(255, 0, 0, 0, 0, 255).map(_.toByte)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expectBytes).map("%02x".format(_)).mkString
    assert(rz(1L).resized_md5 == expectMd5)
  }

  test("aHash: identical images collide, inverted images differ, stub replays byte grid") {
    // invert = swap dark and bright pixels; the 8x8 cell means flip sides
    // of the global mean, so the real-path hash must change
    val inverted = {
      val b = tinyBmp.clone()
      var i = 54
      while (i < b.length) { b(i) = (255 - (b(i) & 0xff)).toByte; i += 1 }
      b
    }
    val df = Seq((1L, tinyBmp), (2L, tinyBmp), (3L, inverted),
        (4L, "plain stub payload".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val h = Multimodal.aHash(df, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r.ahash).toMap
    h.values.foreach(fp => assert(fp.length == 64 && fp.forall(c => c == '0' || c == '1')))
    assert(h(1L) == h(2L), "identical images must hash identically")
    assert(h(1L) != h(3L), "inverted image must hash differently")
    // stub path: replay the 64-cell byte-grid rule in plain Scala
    val bytes = "plain stub payload".getBytes("US-ASCII").map(_ & 0xff)
    val n = bytes.length.toLong
    val cells = (0 until 64).map { i =>
      (i * n / 64).toInt until ((i + 1) * n / 64).toInt }.map(_.map(bytes(_).toLong).sum)
    val total = cells.sum
    val expect = (0 until 64).map { i =>
      val len = (i + 1) * n / 64 - i * n / 64
      if (cells(i) * n > total * len) '1' else '0'
    }.mkString
    assert(h(4L) == expect, "stub hash must replay the byte-grid rule exactly")
  }

  test("dHash: brightness-shift invariant on images, stub replays the 65-cell gradient") {
    // a 9×1 grayscale ramp fills one pixel per dHash grid column, so all
    // 8 row-0 comparisons are between occupied cells (a 4-px-wide image
    // would leave every other column empty)
    def ramp(vals: Seq[Int]): Array[Byte] =
      "P6\n9 1\n255\n".getBytes("US-ASCII") ++
        vals.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toArray
    val up = ramp(10 to 170 by 20)
    // +10 to every pixel (no saturation below 245): every cell mean
    // shifts equally, so each left-vs-right comparison — and the dHash —
    // is unchanged, while aHash's global-mean threshold bits need not be
    val brightened = ramp((10 to 170 by 20).map(_ + 10))
    val mirrored = ramp((10 to 170 by 20).reverse) // all gradients flip
    val df = Seq((1L, up), (2L, brightened), (3L, mirrored),
        (4L, "plain stub payload".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val h = Multimodal.dHash(df, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r.dhash).toMap
    h.values.foreach(fp => assert(fp.length == 64 && fp.forall(c => c == '0' || c == '1')))
    assert(h(1L) == h(2L), "uniform brightness shift must not change dHash")
    assert(h(1L) != h(3L), "mirrored image must change dHash")
    // rising ramp: all 8 grid-row-0 neighbor comparisons are 'brighter';
    // falling ramp: none (empty grid rows 1-7 contribute '0's in both)
    assert(h(1L).take(8) == "11111111" && h(1L).drop(8).forall(_ == '0'), h(1L))
    assert(h(3L).forall(_ == '0'), h(3L))
    // stub path: replay the 65-cell neighbor-gradient rule in plain Scala
    val bytes = "plain stub payload".getBytes("US-ASCII").map(_ & 0xff)
    val n = bytes.length.toLong
    val cells = (0 until 65).map { i =>
      (i * n / 65).toInt until ((i + 1) * n / 65).toInt }.map(_.map(bytes(_).toLong).sum)
    val lens = (0 until 65).map(i => (i + 1) * n / 65 - i * n / 65)
    val expect = (0 until 64).map { i =>
      if (cells(i + 1) * lens(i) > cells(i) * lens(i + 1)) '1' else '0'
    }.mkString
    assert(h(4L) == expect, "stub dHash must replay the gradient rule exactly")
  }

  test("spectralHash: WHT signs, equal-cell brightness invariance, stub replay") {
    // 16×8 image → every 8×8 grid cell holds exactly 2 pixels, so a
    // uniform +10 shift adds 30·npx·Σ_j(−1)^popcount(j∧k) = 0 to every
    // k≠0 coefficient — the documented invariance precondition
    def img(vals: Seq[Int]): Array[Byte] =
      s"P6\n16 8\n255\n".getBytes("US-ASCII") ++
        vals.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toArray
    // DECREASING ramps: a linear pattern's WHT lives in the single-bit
    // coefficients (k ∈ {1,2,4} for horizontal, {8,16,32} for vertical),
    // positive only when the ramp decreases — disjoint sign patterns
    val patt = (0 until 128).map(i => 20 + (15 - i % 16) * 10) // horizontal, max 170
    val shifted = patt.map(_ + 10)
    val vertical = (0 until 128).map(i => 20 + (7 - i / 16) * 20)
    val df = Seq((1L, img(patt)), (2L, img(shifted)), (3L, img(vertical)),
        (4L, "plain stub payload".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val h = Multimodal.spectralHash(df, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r.shash).toMap
    h.values.foreach(fp => assert(fp.length == 32 && fp.forall(c => c == '0' || c == '1')))
    assert(h(1L) == h(2L), "uniform brightness shift must not change the WHT signs")
    assert(h(1L) != h(3L), "a different spectral structure must change the hash")
    // stub path: replay the WHT sign rule in plain Scala over byte cells
    val bytes = "plain stub payload".getBytes("US-ASCII").map(_ & 0xff)
    val n = bytes.length.toLong
    val cells = (0 until 64).map { i =>
      (i * n / 64).toInt until ((i + 1) * n / 64).toInt }.map(_.map(bytes(_).toLong).sum)
    val expect = (1 to 32).map { k =>
      val wk = (0 until 64).map(j =>
        if (java.lang.Long.bitCount(j & k) % 2 == 1) -cells(j) else cells(j)).sum
      if (wk > 0) '1' else '0'
    }.mkString
    assert(h(4L) == expect, "stub spectral hash must replay the WHT exactly")
  }
}
