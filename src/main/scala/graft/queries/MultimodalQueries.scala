package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata. The container has no image/audio codecs, so
  * the "decode" is a deterministic structural stub (byte length, content
  * md5, frame count at a fixed 256-byte fake frame size) — but the
  * Spark-side shape is real: binary columns, per-row metadata extraction in
  * codegen, and (in `graft.multimodal`) partition-batched feature
  * extraction via `mapPartitions`.
  *
  * The binary payload here is the utf-8 encoding of `documents.text`
  * (DuckDB's md5/octet_length over the same utf-8 bytes agree exactly).
  */
object MultimodalQueries {

  val entries: Seq[Entry] = Seq(

    entry("q_mm_meta",
      """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS content_md5,
        |  CAST(ceil(octet_length(encode(text))/256.0) AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_md5"),
          ceil(length(col("payload")) / lit(256.0)).cast("long").as("n_frames"))
        .orderBy(col("doc_id"))
    },

    // ---- Partition-batched feature extraction (mapPartitions — the
    // Scala twin of mapInPandas): decode stub → 16-bin byte histogram,
    // normalized. Exact int counts, one double division — the DuckDB
    // oracle recomputes the identical histogram character-wise (payloads
    // here are pure-ASCII text bytes, asserted by q_mm_meta's lengths).
    entry("q_mm_features",
      """WITH chars AS (SELECT doc_id, [ascii(c) % 16 for c in regexp_extract_all(text, '.')] cls,
        |                      octet_length(encode(text)) n FROM documents)
        |SELECT doc_id, k AS feat_idx,
        |  CAST(len(list_filter(cls, x -> x = k)) AS DOUBLE) / n AS feat_value
        |FROM chars CROSS JOIN generate_series(0, 15) g(k)
        |ORDER BY doc_id, feat_idx""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.extractFeatures(
          Tables(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", dim = 16)
        .toDF()
        .orderBy(col("doc_id"), col("feat_idx"))
    },

    // ---- Resize (resampler stub): keep every 4th payload byte, report
    // the new length + content fingerprint. The oracle rebuilds the same
    // byte-stride slice character-wise (ASCII ⇒ chars == bytes).
    entry("q_mm_resize",
      """WITH r AS (SELECT doc_id,
        |    array_to_string([substr(text, i, 1) for i in generate_series(1, length(text), 4)], '') rz
        |  FROM documents)
        |SELECT doc_id, length(rz) AS resized_len, md5(rz) AS resized_md5
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.resize(
          Tables(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", stride = 4)
        .toDF()
        .orderBy(col("doc_id"))
    },

    // ---- Windowed audio energy: Σ sample² per 256-sample window, exact
    // int64 end-to-end. Real RIFF/WAVE PCM16 payloads decode for real
    // (graft.multimodal.Multimodal.decodeWav — MultimodalSpec drives
    // hand-built mono/stereo WAVs through this path); these synthetic
    // text payloads take the unsigned-byte stub. The oracle is PURELY
    // character-based (window count from length(text), slices from
    // substr — never a chars-here/bytes-there mix), while the stub
    // windows over the payload BYTES; the two agree iff chars == bytes,
    // and that ASCII invariant is ENFORCED by the assert_true filter
    // below — a future non-ASCII corpus fails this query loudly instead
    // of silently diverging the engines window-count-first.
    entry("q_mm_audio_energy",
      """WITH w AS (SELECT doc_id, unnest(generate_series(0, CAST(ceil(length(text)/256.0) AS INT) - 1)) window_idx, text FROM documents)
        |SELECT doc_id, window_idx,
        |  CAST(length(substr(text, window_idx*256 + 1, 256)) AS BIGINT) n_samples,
        |  CAST(list_sum([ascii(c)*ascii(c) for c in regexp_extract_all(substr(text, window_idx*256 + 1, 256), '.')]) AS BIGINT) energy
        |FROM w ORDER BY doc_id, window_idx""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.audioEnergy(
          Tables(s, dir, "documents")
            // loud ASCII gate: assert_true RAISES on the first row where
            // chars != bytes (and returns NULL otherwise, so the filter
            // keeps every row) — the invariant the char-based oracle and
            // the byte-based stub both stand on
            .filter(assert_true(length(col("text")) === octet_length(col("text")),
              lit("q_mm_audio_energy requires an ASCII corpus: chars != bytes")).isNull)
            .withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", window = 256)
        .toDF()
        .orderBy(col("doc_id"), col("window_idx"))
    },

    // ---- Windowed SILENCE detection (VAD stub over the same byte-as-
    // sample contract as q_mm_audio_energy): a 64-sample window is
    // silent when ≥1/5 of its samples sit below amplitude 64 (spaces/
    // punctuation in the ASCII stub), and the profile reports counts,
    // the longest consecutive silent run (the segmentation signal) and
    // the active ratio — the trim/segment audit before transcription.
    // The oracle replays the char-level thresholding and derives the
    // longest run from the flags string ('1'/'0' per window, max run =
    // longest '1'-block after splitting on '0' — pure string ops, no
    // recursion); the stub counts the same windows imperatively per
    // partition batch. Same ASCII chars==bytes gate as the energy op.
    entry("q_mm_silence",
      """WITH w AS (SELECT doc_id, text, CAST(ceil(length(text)/64.0) AS INT) nw FROM documents WHERE length(text) > 0),
        | f AS (SELECT doc_id, nw, [CASE WHEN 5*len(list_filter([ascii(c) for c in regexp_extract_all(substr(text, wi*64 + 1, 64), '.')], x -> x < 64))
        |          >= length(substr(text, wi*64 + 1, 64)) THEN '1' ELSE '0' END
        |        for wi in generate_series(0, nw - 1)] flags FROM w),
        | r AS (SELECT doc_id, nw, len(list_filter(flags, x -> x = '1')) ns,
        |         list_max([len(x) for x in string_split(array_to_string(flags, ''), '0')]) run FROM f)
        |SELECT doc_id, CAST(nw AS BIGINT) n_windows, CAST(ns AS BIGINT) n_silent,
        |  CAST(run AS BIGINT) longest_silence, CAST(nw - ns AS DOUBLE)/nw active_ratio
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.silenceProfile(
          Tables(s, dir, "documents")
            .filter(length(col("text")) > 0)
            .filter(assert_true(length(col("text")) === octet_length(col("text")),
              lit("q_mm_silence requires an ASCII corpus: chars != bytes")).isNull)
            .withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", window = 64)
        .toDF()
        .orderBy(col("doc_id"))
    },

    // ---- CLIPPING detection (rail-hitting audit, same byte-as-sample
    // stub contract as the energy/silence pair): clipped = amplitude ≥
    // 120 ('x' and above in the ASCII stub; real WAVs compare |int16| ≥
    // 120·256), with the LONGEST consecutive clipped run as the
    // distortion tell that separates true clipping from one hot sample.
    // The oracle replays the per-character thresholding and derives the
    // run from the flags string (max '1'-block after splitting on '0' —
    // the q_mm_silence string idiom); exact integers, one final double
    // rate. Same ASCII chars==bytes gate.
    entry("q_mm_clipping",
      """WITH c AS (SELECT doc_id, [ascii(x) for x in regexp_extract_all(text, '.')] amps
        |           FROM documents WHERE length(text) > 0),
        | f AS (SELECT doc_id, len(amps) n_samples,
        |    len(list_filter(amps, x -> x >= 120)) n_clipped,
        |    list_max(amps) max_amp,
        |    list_max([len(y) for y in string_split(array_to_string(
        |      [CASE WHEN x >= 120 THEN '1' ELSE '0' END for x in amps], ''), '0')]) run
        |  FROM c)
        |SELECT doc_id, CAST(n_samples AS BIGINT) n_samples,
        |  CAST(n_clipped AS BIGINT) n_clipped, CAST(max_amp AS BIGINT) max_amp,
        |  CAST(run AS BIGINT) longest_clip_run,
        |  CAST(n_clipped AS DOUBLE)/n_samples clip_rate
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.clipProfile(
          Tables(s, dir, "documents")
            .filter(length(col("text")) > 0)
            .filter(assert_true(length(col("text")) === octet_length(col("text")),
              lit("q_mm_clipping requires an ASCII corpus: chars != bytes")).isNull)
            .withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", clipAmp = 120)
        .toDF()
        .orderBy(col("doc_id"))
    },

    // ---- Frame sampling (video-decoder stub): 256-byte frames, every 4th
    // sampled, md5-fingerprinted — mapPartitions batch shape again; the
    // oracle slices the same bytes with substr (ASCII ⇒ chars == bytes).
    entry("q_mm_frame_sample",
      """WITH fr AS (SELECT doc_id, unnest(generate_series(0, CAST(ceil(octet_length(encode(text))/256.0) AS INT) - 1)) frame_idx, text FROM documents)
        |SELECT doc_id, frame_idx, md5(substr(text, frame_idx*256 + 1, 256)) frame_md5
        |FROM fr WHERE frame_idx % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.sampleFrames(
          Tables(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", frameSize = 256, stride = 4)
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // ---- Perceptual-hash (aHash) image near-dup pairs — the IMAGE twin
    // of q_dedup_simhash: 64-bit average-hash per payload (real 8×8
    // luminance grid for recognized images, byte-grid stub otherwise —
    // [[graft.multimodal.Multimodal.aHash]]; MultimodalSpec drives the
    // real path with hand-built BMPs), then pigeonhole candidate
    // generation on the four 16-bit quarters and exact bit_count Hamming
    // verify. Recall contract, stated honestly: a pair mismatching ≤ 3
    // quarters MUST agree on one (full recall up to Hamming 3, and for
    // any concentrated mismatch pattern); a pair whose 4-12 differing
    // bits spread across ALL four quarters is missed — the same
    // recall/cost trade LSH banding makes, tightened in production by
    // more/narrower bands. The quarter join is an equi-join, never
    // all-pairs at scale, and the oracle replays the identical rule so
    // the gate checks the algorithm as specified. The oracle
    // replays the byte-grid hash character-wise over the ASCII payloads
    // and the same quarter-match + Hamming filter. Because the oracle
    // indexes CHARACTERS while [[Multimodal.aHash]] hashes UTF-8 BYTES,
    // BOTH engines restrict the text-stub gate to ASCII payloads
    // (chars == bytes ⇔ length == octet_length) with the same filter —
    // so the contract holds, not just happens to hold, on a corpus with
    // multi-byte characters; non-ASCII payloads take the real image
    // path, which MultimodalSpec pins with hand-built BMPs.
    entry("q_mm_ahash_dedup",
      """WITH d AS (SELECT doc_id, text, length(text) n FROM documents
        |        WHERE length(text) > 0 AND length(text) = octet_length(encode(text))),
        | c AS (SELECT doc_id, n, [COALESCE(list_sum([ascii(substr(text, CAST(p AS INT), 1))
        |          for p in generate_series((i*n)//64 + 1, ((i+1)*n)//64)]), 0)
        |        for i in generate_series(0, 63)] cells FROM d),
        | t AS (SELECT doc_id, n, cells, list_sum(cells) total FROM c),
        | f AS (SELECT doc_id, array_to_string([CASE WHEN cells[i+1] * n > total * (((i+1)*n)//64 - (i*n)//64)
        |          THEN '1' ELSE '0' END for i in generate_series(0, 63)], '') fp FROM t),
        | fm AS MATERIALIZED (SELECT doc_id, fp FROM f),
        | bands AS MATERIALIZED (SELECT doc_id, i band, substr(fp, (i-1)*16 + 1, 16) bk
        |          FROM fm, generate_series(1, 4) t(i)),
        | cand AS (SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
        |          FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
        | p AS (SELECT a_id, b_id,
        |         len(list_filter(generate_series(1, 64), i -> substr(fa.fp, i, 1) != substr(fb.fp, i, 1))) hamming
        |       FROM cand JOIN fm fa ON cand.a_id = fa.doc_id JOIN fm fb ON cand.b_id = fb.doc_id)
        |SELECT a_id, b_id, CAST(hamming AS INT) hamming FROM p WHERE hamming <= 12
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val f = Multimodal.aHash(
          Tables(s, dir, "documents")
            .filter(length(col("text")) > 0 &&
              length(col("text")) === octet_length(col("text")))
            .transform(Tables.spread(_, col("doc_id")))
            .withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload")
        .toDF()
        .withColumn("hi", expr("CAST(conv(substring(ahash, 1, 32), 2, 10) AS BIGINT)"))
        .withColumn("lo", expr("CAST(conv(substring(ahash, 33, 32), 2, 10) AS BIGINT)"))
        .select((1 to 4).map(k =>
          expr(s"CAST(conv(substring(ahash, ${16 * k - 15}, 16), 2, 10) AS BIGINT)").as(s"b$k"))
          :+ col("doc_id") :+ col("hi") :+ col("lo"): _*)
        .persist()
      val a = f.toDF(f.columns.map(_ + "_a"): _*)
      val b = f.toDF(f.columns.map(_ + "_b"): _*)
      // Hamming filter BEFORE the distinct: the 16-bit band key space
      // (65,536 values) saturates once the corpus passes ~10⁵ docs, so
      // candidate multiplicity grows quadratically in bucket occupancy —
      // the sf100 gate measured the old distinct-then-filter order
      // shuffling the FULL candidate set (billions of rows, >50 GB of
      // shuffle, out of disk at 5M docs). Filtering first is the same
      // result (filter and distinct commute) but the distinct's exchange
      // now carries only true near-dup pairs: the candidate explosion
      // stays pipeline-internal (join output → map-side filter), never
      // hitting a shuffle or disk. The residual cost is the per-candidate
      // bit_count CPU — the honest price of 16-bit bands at this scale;
      // production narrows it by hashing to >64 bits and banding wider.
      (1 to 4).map(k =>
          a.join(b, col(s"b${k}_a") === col(s"b${k}_b") && col("doc_id_a") < col("doc_id_b")))
        .reduce(_ unionByName _)
        .select(col("doc_id_a").as("a_id"), col("doc_id_b").as("b_id"),
          expr("CAST(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b) AS INT)").as("hamming"))
        .filter(col("hamming") <= 12)
        .distinct()
        .orderBy(col("a_id"), col("b_id"))
    },

    // ---- dHash fingerprints + exact-fingerprint buckets: the gradient
    // twin of q_mm_ahash_dedup (bit = right neighbor of a 65-cell grid
    // strictly brighter — invariant under monotone brightness shifts
    // where aHash flips wholesale). Gate shape: fingerprint every
    // ASCII-payload document (the stub contract — see
    // [[graft.multimodal.Multimodal.dHash]]; real images take the 8×9
    // pixel-grid path, spec-pinned), then bucket-count exact dhash
    // matches — the grouping is on the 64-bit fingerprint itself, one
    // map-side-combined aggregate joined back AQE-sized; no pairwise
    // anything. The oracle replays the byte-cell arithmetic
    // character-wise (cells are consecutive ranges, bit i compares cell
    // i+1 vs cell i cross-multiplied — exact integers in both engines).
    entry("q_mm_dhash",
      """WITH d AS (SELECT doc_id, text, length(text) n FROM documents
        |        WHERE length(text) > 0 AND length(text) = octet_length(encode(text))),
        | c AS (SELECT doc_id, n, [COALESCE(list_sum([ascii(substr(text, CAST(p AS INT), 1))
        |          for p in generate_series((i*n)//65 + 1, ((i+1)*n)//65)]), 0)
        |        for i in generate_series(0, 64)] cells,
        |       [((i+1)*n)//65 - (i*n)//65 for i in generate_series(0, 64)] lens FROM d),
        | f AS (SELECT doc_id, array_to_string([CASE WHEN cells[i+2] * lens[i+1] > cells[i+1] * lens[i+2]
        |          THEN '1' ELSE '0' END for i in generate_series(0, 63)], '') dhash FROM c),
        | g AS (SELECT dhash dh, COUNT(*) n_same FROM f GROUP BY dhash)
        |SELECT f.doc_id, f.dhash, g.n_same
        |FROM f JOIN g ON f.dhash = g.dh ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val f = Multimodal.dHash(
          Tables(s, dir, "documents")
            .filter(length(col("text")) > 0 &&
              length(col("text")) === octet_length(col("text")))
            .transform(Tables.spread(_, col("doc_id")))
            .withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload")
        .toDF()
      val g = f.groupBy(col("dhash").as("dh")).agg(count(lit(1)).as("n_same"))
      f.join(g, col("dhash") === col("dh"))
        .select(col("doc_id"), col("dhash"), col("n_same"))
        .orderBy(col("doc_id"))
    },

    // ---- SPECTRAL fingerprint buckets: pHash's idea with the DCT
    // replaced by an exact-int64 Walsh–Hadamard transform (±1
    // butterflies, no cosine table — so the oracle replays every
    // coefficient bit-for-bit where a DCT's doubles could not). The
    // 32-bit fingerprint is the SIGN pattern of coefficients 1..32 over
    // the 64-cell byte grid — global structure (periodicity, mass
    // balance) where aHash/dHash see local cells — bucketed exactly like
    // q_mm_dhash: one map-side-combined aggregate on the fingerprint,
    // joined back AQE-sized, no pairwise anything. Real images transform
    // the 8×8 luminance cell sums (spec-pinned, incl. the equal-cell
    // brightness-shift invariance); ASCII payloads replay char-wise.
    entry("q_mm_spectral",
      """WITH d AS (SELECT doc_id, text, length(text) n FROM documents
        |        WHERE length(text) > 0 AND length(text) = octet_length(encode(text))),
        | c AS (SELECT doc_id, [COALESCE(list_sum([ascii(substr(text, CAST(p AS INT), 1))
        |          for p in generate_series((i*n)//64 + 1, ((i+1)*n)//64)]), 0)
        |        for i in generate_series(0, 63)] cells FROM d),
        | f AS (SELECT doc_id, array_to_string([CASE WHEN list_sum([cells[j+1] *
        |          (1 - 2 * (bit_count(CAST(j AS BIGINT) & k) % 2))
        |          for j in generate_series(0, 63)]) > 0 THEN '1' ELSE '0' END
        |        for k in generate_series(1, 32)], '') shash FROM c),
        | g AS (SELECT shash sh, COUNT(*) n_same FROM f GROUP BY shash)
        |SELECT f.doc_id, f.shash, g.n_same
        |FROM f JOIN g ON f.shash = g.sh ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val f = Multimodal.spectralHash(
          Tables(s, dir, "documents")
            .filter(length(col("text")) > 0 &&
              length(col("text")) === octet_length(col("text")))
            .transform(Tables.spread(_, col("doc_id")))
            .withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload")
        .toDF()
      val g = f.groupBy(col("shash").as("sh")).agg(count(lit(1)).as("n_same"))
      f.join(g, col("shash") === col("sh"))
        .select(col("doc_id"), col("shash"), col("n_same"))
        .orderBy(col("doc_id"))
    }
  )
}
