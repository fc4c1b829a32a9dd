package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, content fingerprinting — the
  * per-document feature extraction a training-data pipeline runs before
  * filtering/dedup.
  *
  * Every query is a narrow per-row map (higher-order functions, no UDF, no
  * shuffle except the final presentation ORDER BY) — at 100 TB these are
  * scan-bound and embarrassingly parallel.
  */
object TextQueries {

  /** Shared SQL-fragment generators for q_char_stats — ONE definition of
    * the bucket list and the ssq/nz/max formulas so the oracle and the
    * Spark plan cannot drift (only the per-count BIGINT cast differs,
    * and that stays inline at the two use sites). */
  private object CharStats {
    val buckets: Seq[String] = ('a' to 'z').map(_.toString) :+ " "
    val cols: Seq[String] = buckets.indices.map(i => s"c$i")
    val sumAll: String = cols.mkString(" + ")
    val ssq: String = (cols :+ "oth").map(c => s"$c * $c").mkString(" + ")
    val nz: String =
      (cols :+ "oth").map(c => s"CASE WHEN $c > 0 THEN 1 ELSE 0 END").mkString(" + ")
    val mx: String = s"greatest(${(cols :+ "oth").mkString(", ")})"
  }

  private val stopEn = Seq("the", "of", "and", "is", "to")
  private val stopDe = Seq("der", "die", "das", "und", "ist")
  private val stopEs = Seq("el", "la", "los", "es", "y")
  private val stopFr = Seq("le", "la", "les", "est", "et")

  val entries: Seq[Entry] = Seq(

    // ---- Token counting: whitespace tokens + a BPE-ish regex pre-tokenizer
    // (letter runs / digit runs / single punctuation).
    entry("q_token_count",
      """SELECT doc_id, len(regexp_split_to_array(text,'\s+')) AS n_ws,
        |  len(regexp_extract_all(text,'[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(wsTokens("text")).as("n_ws"),
          size(regexTokens("text")).as("n_bpe"))
        .orderBy(col("doc_id"))
    },

    // ---- Quality scoring: length, stopword ratio, alphabetic ratio,
    // average token length — exact int counts with one final double
    // division each, so both engines produce identical doubles.
    entry("q_text_quality",
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(text,'\s+') toks FROM documents)
        |SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)/len(toks) AS stopword_ratio,
        |  CAST(length(regexp_replace(text,'[^a-z]','','g')) AS DOUBLE)/length(text) AS alpha_ratio,
        |  CAST(length(text)-len(toks)+1 AS DOUBLE)/len(toks) AS avg_token_len
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("toks", wsTokens("text"))
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          size(col("toks")).as("n_tokens"),
          (markerCount("toks", Seq("the", "a", "of", "and", "to", "in", "is")).cast("double")
            / size(col("toks"))).as("stopword_ratio"),
          (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
            / length(col("text"))).as("alpha_ratio"),
          ((length(col("text")) - size(col("toks")) + lit(1)).cast("double")
            / size(col("toks"))).as("avg_token_len"))
        .orderBy(col("doc_id"))
    },

    // ---- Language ID: marker-word voting with a deterministic argmax
    // tiebreak (en > de > es > fr), 'und' when no marker hits.
    entry("q_lang_id",
      """WITH t AS (SELECT doc_id, lang, regexp_split_to_array(text,'\s+') toks FROM documents),
        | c AS (SELECT doc_id, lang,
        |   len(list_filter(toks, x -> x IN ('the','of','and','is','to'))) c_en,
        |   len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) c_de,
        |   len(list_filter(toks, x -> x IN ('el','la','los','es','y'))) c_es,
        |   len(list_filter(toks, x -> x IN ('le','la','les','est','et'))) c_fr
        |  FROM t)
        |SELECT doc_id, lang, c_en, c_de, c_es, c_fr,
        |  CASE WHEN c_en = 0 AND c_de = 0 AND c_es = 0 AND c_fr = 0 THEN 'und'
        |       WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
        |       WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
        |       WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END pred_lang
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("toks", wsTokens("text"))
        .select(col("doc_id"), col("lang"),
          markerCount("toks", stopEn).as("c_en"),
          markerCount("toks", stopDe).as("c_de"),
          markerCount("toks", stopEs).as("c_es"),
          markerCount("toks", stopFr).as("c_fr"))
        .withColumn("pred_lang",
          when(col("c_en") === 0 && col("c_de") === 0 && col("c_es") === 0 && col("c_fr") === 0, "und")
            .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es") && col("c_en") >= col("c_fr"), "en")
            .when(col("c_de") >= col("c_es") && col("c_de") >= col("c_fr"), "de")
            .when(col("c_es") >= col("c_fr"), "es")
            .otherwise("fr"))
        .orderBy(col("doc_id"))
    },

    // ---- The END-TO-END curation pipeline (the composite every LLM
    // training-data run executes): feature extraction (tokens, alpha
    // ratio, language vote) → quality + language filters → exact dedup
    // keyed on the 60-bit int64 md5-prefix of the text
    // ([[graft.functions.TextFunctions.md5Prefix64Sql]] — the shuffle
    // carries an 8-byte hash, not the document body and not the 32-char
    // md5 hex string this used to group on: 4× fewer shuffle bytes, the
    // 100 TB-relevant choice, with the oracle replaying the identical
    // hex→int arithmetic so a collision cannot diverge the engines) →
    // per-language corpus stats from exact integer sums. Everything
    // before the dedup is a narrow map; the only shuffles are the
    // hash-dedup and the final tiny aggregation.
    entry("q_curation_pipeline",
      s"""WITH t AS (SELECT doc_id, text, regexp_split_to_array(text,'\\s+') toks FROM documents),
        | s AS (SELECT doc_id, text, len(toks) n_tokens,
        |    length(regexp_replace(text,'[^a-z]','','g')) n_alpha, length(text) n_chars,
        |    len(list_filter(toks, x -> x IN ('the','of','and','is','to'))) c_en,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) c_de,
        |    len(list_filter(toks, x -> x IN ('el','la','los','es','y'))) c_es,
        |    len(list_filter(toks, x -> x IN ('le','la','les','est','et'))) c_fr
        |  FROM t),
        | l AS (SELECT *, CASE WHEN c_en=0 AND c_de=0 AND c_es=0 AND c_fr=0 THEN 'und'
        |    WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
        |    WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
        |    WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END pred_lang FROM s),
        | flt AS (SELECT * FROM l WHERE n_tokens >= 20 AND CAST(n_alpha AS DOUBLE)/n_chars > 0.5),
        | ded AS (SELECT ${md5Prefix64Oracle("text")} h, MIN(doc_id) doc_id, MIN(pred_lang) pred_lang,
        |    MIN(n_tokens) n_tokens, MIN(n_alpha) n_alpha, MIN(n_chars) n_chars
        |  FROM flt GROUP BY 1)
        |SELECT pred_lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS DOUBLE)/COUNT(*) AS avg_tokens,
        |  CAST(SUM(n_alpha) AS DOUBLE)/SUM(n_chars) AS alpha_ratio
        |FROM ded GROUP BY pred_lang ORDER BY pred_lang""".stripMargin) { (s, dir) =>
      val scored = Tables(s, dir, "documents")
        .withColumn("toks", wsTokens("text"))
        .select(col("doc_id"), col("text"),
          size(col("toks")).as("n_tokens"),
          length(regexp_replace(col("text"), "[^a-z]", "")).as("n_alpha"),
          length(col("text")).as("n_chars"),
          markerCount("toks", stopEn).as("c_en"),
          markerCount("toks", stopDe).as("c_de"),
          markerCount("toks", stopEs).as("c_es"),
          markerCount("toks", stopFr).as("c_fr"))
        .withColumn("pred_lang",
          when(col("c_en") === 0 && col("c_de") === 0 && col("c_es") === 0 && col("c_fr") === 0, "und")
            .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es") && col("c_en") >= col("c_fr"), "en")
            .when(col("c_de") >= col("c_es") && col("c_de") >= col("c_fr"), "de")
            .when(col("c_es") >= col("c_fr"), "es")
            .otherwise("fr"))
        .filter(col("n_tokens") >= 20 &&
          col("n_alpha").cast("double") / col("n_chars") > 0.5)
      scored
        .groupBy(md5Prefix64("text").as("h"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("pred_lang")).as("pred_lang"),
          min(col("n_tokens")).as("n_tokens"), min(col("n_alpha")).as("n_alpha"),
          min(col("n_chars")).as("n_chars"))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
          (sum(col("n_alpha")).cast("double") / sum(col("n_chars"))).as("alpha_ratio"))
        .orderBy(col("pred_lang"))
    },

    // ---- TF-IDF top-3 terms per document. Cross-engine exactness: libm
    // ln() differs in the last ulp across engines, so the score is the
    // raw rational tf·N/df evaluated as ONE double division of exact
    // int64s (identical in both engines); ln(N/df) is monotone in it, so
    // the ranking is the classic tf-idf ranking. Deterministic tie-break
    // on the term. Scale: one shuffle on (doc, term) for tf, one
    // term-keyed df aggregate joined back UNHINTED — the df frame is
    // VOCABULARY-sized (one row per distinct token: billions of types in
    // a web corpus, the heavy tail q_freq_spectrum exists to audit), so
    // a forced broadcast would OOM exactly at scale; AQE measures it
    // small here and picks the broadcast itself, and at 100 TB the plan
    // degrades gracefully to a shuffled equi-join on the term key (the
    // q_boilerplate / q_unigram_surprisal treatment). Only the 1-row
    // corpus count N keeps an explicit hint — bounded by construction.
    entry("q_tfidf",
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | tf AS (SELECT doc_id, term, COUNT(*) tf FROM t GROUP BY 1, 2),
        | df AS (SELECT term, COUNT(DISTINCT doc_id) df FROM t GROUP BY 1),
        | n AS (SELECT COUNT(*) n FROM documents),
        | s AS (SELECT tf.doc_id, tf.term, CAST(tf.tf * n.n AS DOUBLE)/df.df AS score
        |       FROM tf JOIN df USING (term) CROSS JOIN n),
        | r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |         ORDER BY score DESC, term) rn FROM s)
        |SELECT doc_id, rn, term, score FROM r WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val t = docs.select(col("doc_id"), explode(tokens("text")).as("term"))
      val tf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = t.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
      tf.join(df, "term")
        .crossJoin(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("rn"))
    },

    // ---- Corpus n-gram statistics: top-5 bigrams per language by count,
    // deterministic tie-break (count DESC, bigram ASC) — the frequency
    // table behind contamination checks, n-gram LM baselines, and boiler-
    // plate detection. Shape at 100 TB: explode is a narrow map, the count
    // aggregates map-side into (lang, bigram) partials, and the top-k
    // window runs per-lang AFTER the heavy reduction — rows entering the
    // window = distinct bigrams, not corpus tokens.
    entry("q_ngram_stats",
      """WITH t AS (SELECT lang, string_split(text,' ') toks FROM documents
        |           WHERE len(string_split(text,' ')) >= 2),
        | b AS (SELECT lang, unnest([array_to_string(toks[i:i+1],' ')
        |        for i in generate_series(1, len(toks)-1)]) bg FROM t),
        | c AS (SELECT lang, bg, COUNT(*) AS n FROM b GROUP BY 1,2),
        | r AS (SELECT lang, bg, n, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bg ASC) rn FROM c)
        |SELECT lang, CAST(rn AS BIGINT) AS rn, bg AS bigram, n
        |FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram").asc)
      Tables(s, dir, "documents")
        // the table is one parquet file → one input partition; the
        // tokenize+explode map is the heavy phase, so spread it first
        .transform(Tables.spread(_))
        .withColumn("toks", tokens("text"))
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(1, size(toks)-1), i -> concat(toks[i-1], ' ', toks[i]))"))
          .as("bigram"))
        .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("rn"), col("bigram"), col("n"))
        .orderBy(col("lang"), col("rn"))
    },

    // ---- Intra-document repetition (the Gopher-rule quality signal):
    // fraction of duplicate bigrams within each document — high ratios
    // mark boilerplate/spam for the pretraining filter. Pure narrow map
    // (exact int counts, one double division), flag at 5%.
    entry("q_rep_ratio",
      """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents
        |           WHERE len(string_split(text,' ')) >= 2),
        | b AS (SELECT doc_id, [array_to_string(toks[i:i+1],' ')
        |        for i in generate_series(1, len(toks)-1)] bgs FROM t)
        |SELECT doc_id, CAST(len(bgs) AS BIGINT) AS n_bigrams,
        |  CAST(len(bgs) - len(list_distinct(bgs)) AS BIGINT) AS n_dup,
        |  CAST(len(bgs) - len(list_distinct(bgs)) AS DOUBLE) / len(bgs) AS dup_ratio,
        |  (CAST(len(bgs) - len(list_distinct(bgs)) AS DOUBLE) / len(bgs)) > 0.05 AS flagged
        |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("toks", tokens("text"))
        .filter(size(col("toks")) >= 2)
        .withColumn("bgs", expr(
          "transform(sequence(1, size(toks)-1), i -> concat(toks[i-1], ' ', toks[i]))"))
        .withColumn("n_bigrams", size(col("bgs")).cast("long"))
        .withColumn("n_dup", (size(col("bgs")) - size(array_distinct(col("bgs")))).cast("long"))
        .withColumn("dup_ratio", col("n_dup").cast("double") / col("n_bigrams"))
        .select(col("doc_id"), col("n_bigrams"), col("n_dup"), col("dup_ratio"),
          (col("dup_ratio") > 0.05).as("flagged"))
        .orderBy(col("doc_id"))
    },

    // ---- Token-distribution ENTROPY per document — the classic
    // low-diversity filter (template/boilerplate docs concentrate mass on
    // few token types; near-random noise spreads it): H measured in the
    // repo's integer-log2 convention (floor-log2 via bit length, the
    // q_unigram_surprisal trick) so every intermediate is EXACT int64
    // arithmetic and the final doubles come from single divisions of
    // identical integers — bit-reproducible across engines where a true
    // -Σ p·log2 p would drift on float summation order.
    //   ent_bits = n·⌊log2 n⌋ − Σ_type c·⌊log2 c⌋   (0 ≤ entropy ≤ ⌊log2 n⌋)
    // plus the type-token ratio, the other standard diversity signal.
    // Scale shape: per-doc explode is narrow, the (doc, type) count is
    // ONE map-side-combined shuffle keyed on (doc_id, tok), the per-doc
    // rollup reuses the same key prefix, and output is one row per doc.
    entry("q_token_entropy",
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
        | c AS (SELECT doc_id, tok, COUNT(*) n FROM t GROUP BY 1, 2),
        | d AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) n_tokens,
        |    CAST(COUNT(*) AS BIGINT) n_types,
        |    CAST(SUM(n * (length(bin(n)) - 1)) AS BIGINT) cbits FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types,
        |  CAST(n_tokens * (length(bin(n_tokens)) - 1) - cbits AS BIGINT) AS ent_bits,
        |  CAST(n_tokens * (length(bin(n_tokens)) - 1) - cbits AS DOUBLE) / n_tokens AS entropy,
        |  CAST(n_types AS DOUBLE) / n_tokens AS ttr,
        |  (CAST(n_tokens * (length(bin(n_tokens)) - 1) - cbits AS DOUBLE) / n_tokens) < 4.0 AS flagged
        |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(tokens("text")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("n") * expr("CAST(length(bin(n)) - 1 AS BIGINT)")).as("cbits"))
      d.select(col("doc_id"), col("n_tokens"), col("n_types"),
          (col("n_tokens") * expr("CAST(length(bin(n_tokens)) - 1 AS BIGINT)")
            - col("cbits")).as("ent_bits"))
        .withColumn("entropy", col("ent_bits").cast("double") / col("n_tokens"))
        .withColumn("ttr", col("n_types").cast("double") / col("n_tokens"))
        .withColumn("flagged", col("entropy") < 4.0)
        .orderBy(col("doc_id"))
    },

    // ---- Corpus mixing: per-source epoch multipliers (upsample chosen
    // sources N×) — the "data recipe" op every pretraining corpus build
    // runs. The weights are a tiny dim table broadcast to every executor
    // (no shuffle of the 100 TB fact side); repetition is a narrow
    // explode(sequence(1, mult)) so output rows stream straight to the
    // writer. Fractional multipliers compose with q_det_sample's
    // hash-bucket filter (e.g. 2.5× = 2 copies + the v<8 half-sample).
    entry("q_data_mixture",
      """WITH w(source, mult) AS (VALUES ('src0', 3), ('src1', 2)),
        | m AS (SELECT d.doc_id, d.source, COALESCE(w.mult, 1) AS mult
        |       FROM documents d LEFT JOIN w USING (source)),
        | r AS (SELECT doc_id, source, mult, unnest(generate_series(1, mult)) AS copy_id FROM m)
        |SELECT doc_id, CAST(copy_id AS BIGINT) AS copy_id, source, CAST(mult AS BIGINT) AS mult
        |FROM r ORDER BY doc_id, copy_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Seq(("src0", 3L), ("src1", 2L)).toDF("source", "mult")
      Tables(s, dir, "documents").select(col("doc_id"), col("source"))
        .join(broadcast(w), Seq("source"), "left")
        .withColumn("mult", coalesce(col("mult"), lit(1L)))
        .withColumn("copy_id", explode(sequence(lit(1L), col("mult"))))
        .select(col("doc_id"), col("copy_id"), col("source"), col("mult"))
        .orderBy(col("doc_id"), col("copy_id"))
    },

    // ---- Document fingerprinting: whole-content md5 plus the minimum
    // 5-gram-shingle md5 (a 1-function MinHash — robust to small edits).
    entry("q_doc_fingerprint",
      """WITH t AS (SELECT doc_id, string_split(text,' ') toks, text FROM documents),
        | s AS (SELECT doc_id, text,
        |   [array_to_string(toks[i:i+4],' ') for i in generate_series(1, greatest(len(toks)-4,1))] sh FROM t)
        |SELECT doc_id, md5(text) fp, list_aggregate([md5(x) for x in sh],'min') min_shingle_fp
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("toks", tokens("text"))
        .withColumn("sh", expr(
          "transform(sequence(1, greatest(size(toks)-4, 1)), i -> array_join(slice(toks, i, 5), ' '))"))
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"),
          expr("array_min(transform(sh, x -> md5(x)))").as("min_shingle_fp"))
        .orderBy(col("doc_id"))
    },

    // ---- Inverted index build: token → document frequency, total term
    // frequency, and the head of the sorted posting list — the core
    // retrieval structure behind decontamination lookups and corpus search.
    // Shape at 100 TB: explode is a narrow map; both aggregations key on
    // the term and combine map-side, so shuffle volume is the vocabulary
    // (tiny vs corpus); posting lists stay bounded (head-10) so no single
    // stop-word term can blow up a reducer — full posting lists for
    // rare terms would instead partition by (term, doc-range) buckets.
    entry("q_inverted_index",
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | d AS (SELECT DISTINCT term, doc_id FROM t),
        | tf AS (SELECT term, COUNT(*) tf FROM t GROUP BY 1),
        | p AS (SELECT term, COUNT(*) df,
        |         array_to_string(list(doc_id ORDER BY doc_id)[1:10], ',') AS posting_head
        |       FROM d GROUP BY 1)
        |SELECT p.term, p.df, tf.tf, p.posting_head
        |FROM p JOIN tf USING (term) ORDER BY term""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(tokens("text")).as("term"))
      val tf = t.groupBy(col("term")).agg(count(lit(1)).as("tf"))
      val p = t.distinct()
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          array_join(slice(sort_array(collect_set(col("doc_id"))), 1, 10), ",")
            .as("posting_head"))
      p.join(tf, "term")
        .select(col("term"), col("df"), col("tf"), col("posting_head"))
        .orderBy(col("term"))
    },

    // ---- Exact heavy hitters: global top-20 tokens with corpus share —
    // the frequency audit run before stop-word filtering or vocabulary
    // truncation. The count aggregates map-side into per-term partials
    // (shuffle = vocabulary size); the total is one extra scalar reduced
    // from the SAME partials (no second corpus pass) and broadcast back;
    // share is a single double division of exact int64s. Only the
    // distinct-term table enters the rank window.
    entry("q_heavy_hitters",
      """WITH t AS (SELECT unnest(string_split(text,' ')) term FROM documents),
        | c AS (SELECT term, COUNT(*) n FROM t GROUP BY 1),
        | tot AS (SELECT CAST(SUM(n) AS BIGINT) s FROM c),
        | r AS (SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) rk FROM c)
        |SELECT rk, term, n, CAST(n AS DOUBLE)/(SELECT s FROM tot) AS share
        |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "documents")
        .select(explode(tokens("text")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
      val tot = c.agg(sum(col("n")).as("s"))
      topKRanked(c, 20, "rk", col("n").desc, col("term").asc)
        .crossJoin(broadcast(tot))
        .select(col("rk"), col("term"), col("n"),
          (col("n").cast("double") / col("s")).as("share"))
        .orderBy(col("rk"))
    },

    // ---- Sketch-first heavy hitters: a Misra–Gries summary (capacity
    // 256, see graft.functions.Sketches) narrows the corpus to ≤256
    // candidate tokens WITHOUT shuffling per-token rows — partial sketches
    // build map-side and only k-entry maps cross the wire — then one exact
    // pass counts just the candidates (broadcast semi-join) and takes the
    // top-20. MG guarantees every token with true count > N/(k+1) is a
    // candidate, so the result is EXACTLY the true top-20 whenever the
    // 20th count clears that line (trivially true here; at 100 TB pick k
    // ≈ 10–100× the target rank) — which is why the oracle is the plain
    // exact top-20: the sketch must be invisible in the answer.
    entry("q_heavy_hitters_sketch",
      """WITH t AS (SELECT unnest(string_split(text,' ')) term FROM documents),
        | c AS (SELECT term, COUNT(*) n FROM t GROUP BY 1),
        | r AS (SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) rk FROM c)
        |SELECT rk, term, n FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin) { (s, dir) =>
      import graft.functions.Sketches
      val t = Tables(s, dir, "documents")
        .select(explode(tokens("text")).as("term"))
      val cands = t.agg(Sketches.misraGries(256)(col("term")).as("mg"))
        .select(explode(map_keys(col("mg"))).as("term"))
      val exact = t.join(broadcast(cands), "term")
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
      topKRanked(exact, 20, "rk", col("n").desc, col("term").asc)
        .select(col("rk"), col("term"), col("n"))
        .orderBy(col("rk"))
    },

    // ---- GUARANTEE-AUDITED AUTO heavy hitters ([[graft.functions
    // .Robust.heavyHitters]], Mode.Auto forced onto its sketch path):
    // the round-14 front door that makes the MG sketch SAFE to default
    // to — after the sketch's candidate-confirm pass it checks the k-th
    // candidate count against the N/(capacity+1) detection line (both
    // already computed) and ESCALATES to the exact vocabulary count
    // when the precondition is void, instead of returning arbitrary
    // survivors. The answer is therefore ALWAYS the exact top-20, which
    // is exactly why this query is hash-gateable where the raw sketch
    // twin's exactness is conditional: on this corpus the audit passes
    // and the result ships from the sketch path (one MG aggregation +
    // one candidate-bounded confirm, per-token rows never shuffle); on
    // a frequency-flattened corpus (the sf1 shard lake, RobustSpec's
    // flat case) the same call pays the one vocabulary shuffle Exact
    // would have paid anyway. Scale shape: count + MG partials + a
    // 20-row driver collect for the audit — O(vocabulary) state only on
    // the escalation path.
    entry("q_heavy_hitters_auto",
      """WITH t AS (SELECT unnest(string_split(text,' ')) term FROM documents),
        | c AS (SELECT term, COUNT(*) n FROM t GROUP BY 1),
        | r AS (SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) rk FROM c)
        |SELECT rk, term, n FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir, "documents")
        .select(explode(tokens("text")).as("term"))
      // maxExactRows = 0 forces the sketch+audit path at every scale the
      // gate runs — the oracle checks the audit, not the lucky case
      graft.functions.Robust.heavyHitters(t, "term", topK = 20,
          graft.functions.Robust.Mode.Auto(maxExactRows = 0), capacity = 256)
        .orderBy(col("rk"))
    },

    // ---- Sketch-guarantee audit: the Misra–Gries contract above is
    // conditional — the sketch's top-20 is exactly the true top-20 only
    // while the 20th count clears the detection line N/(k+1). This query
    // makes the precondition ITSELF a first-class, exactly-checkable
    // output (run it beside any sketch-first rollout; alert when
    // guarantee_holds flips false — the one sf1-replay mismatch in
    // COVERAGE.md was exactly this precondition going void on a
    // frequency-flattened corpus). All integer arithmetic: N and the
    // 20th count are exact int64s from the same one-shuffle count
    // aggregate as q_heavy_hitters; the threshold is integer DIV; the
    // comparison is int-exact on both engines. Scale shape: one
    // vocabulary-keyed count (map-side partials), one 20-row top-k, two
    // 1-row frames crossed — nothing beyond q_heavy_hitters' cost.
    entry("q_heavy_hitters_guarantee",
      """WITH t AS (SELECT unnest(string_split(text,' ')) term FROM documents),
        | c AS (SELECT term, COUNT(*) n FROM t GROUP BY 1),
        | tot AS (SELECT CAST(SUM(n) AS BIGINT) nt FROM c),
        | r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term) rk FROM c),
        | t20 AS (SELECT CAST(MIN(n) AS BIGINT) count20 FROM r WHERE rk <= 20)
        |SELECT nt AS n_tokens, nt // 257 AS mg_threshold, count20,
        |  count20 > nt // 257 AS guarantee_holds
        |FROM tot, t20""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "documents")
        .select(explode(tokens("text")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
      val tot = c.agg(sum(col("n")).cast("long").as("nt"))
      val t20 = topKRanked(c, 20, "rk", col("n").desc, col("term").asc)
        .agg(min(col("n")).as("count20"))
      tot.crossJoin(broadcast(t20))
        .select(col("nt").as("n_tokens"),
          expr("nt DIV 257").as("mg_threshold"),
          col("count20"),
          (col("count20") > expr("nt DIV 257")).as("guarantee_holds"))
    },

    // ---- Out-of-vocabulary rate: tokenizer-coverage analysis against a
    // frequency-derived vocabulary (top-25 tokens here; a real run
    // broadcasts the released tokenizer vocab). Per-language corpus OOV
    // rate is ONE double division of exact int64 totals, and "high-OOV
    // docs" compares 2·oov > n in integers — no per-doc double ratios are
    // ever summed (order-dependent) or compared (ulp-fragile). Shape: the
    // vocab is tiny and broadcast, the left join is map-side, and both
    // aggregations combine partials map-side.
    entry("q_oov_rate",
      """WITH t AS (SELECT doc_id, lang, unnest(string_split(text,' ')) term FROM documents),
        | vocab AS (SELECT term FROM (
        |    SELECT term, COUNT(*) n, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) rk
        |    FROM t GROUP BY term) WHERE rk <= 25),
        | d AS (SELECT t.doc_id, t.lang, COUNT(*) n_tok,
        |         COUNT(CASE WHEN v.term IS NULL THEN 1 END) n_oov
        |       FROM t LEFT JOIN vocab v ON t.term = v.term GROUP BY 1,2)
        |SELECT lang, COUNT(*) n_docs,
        |  CAST(SUM(n_oov) AS BIGINT) total_oov, CAST(SUM(n_tok) AS BIGINT) total_tok,
        |  CAST(CAST(SUM(n_oov) AS BIGINT) AS DOUBLE)/CAST(SUM(n_tok) AS BIGINT) AS oov_rate,
        |  COUNT(CASE WHEN 2*n_oov > n_tok THEN 1 END) AS n_high_oov_docs
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(tokens("text")).as("term"))
      val vocab = t.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc).limit(25)
        .select(col("term").as("v_term"))
      val d = t.join(broadcast(vocab), col("term") === col("v_term"), "left")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tok"),
          count(when(col("v_term").isNull, 1)).as("n_oov"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_oov")).as("total_oov"), sum(col("n_tok")).as("total_tok"),
          (sum(col("n_oov")).cast("double") / sum(col("n_tok"))).as("oov_rate"),
          count(when(lit(2) * col("n_oov") > col("n_tok"), 1)).as("n_high_oov_docs"))
        .orderBy(col("lang"))
    },

    // ---- Token co-occurrence: top-15 unordered token pairs by the number
    // of documents containing both — the PMI/embedding-context building
    // block. The pair explosion runs AFTER per-document distinct AND two
    // prunes that BOUND the per-doc quadratic (a raw distinct-vocab
    // self-join explodes 10¹⁰ pairs on one 100k-distinct-token document):
    // (1) min document frequency 3 — the rare-type heavy tail that
    // dominates per-doc vocabulary contributes only pairs with
    // n_docs ≤ df < 3, which can never rank, so real PMI pipelines drop
    // it first; (2) a hard per-doc cap of the 256 highest-df terms
    // (deterministic (df desc, term asc) order — a doc-bounded window),
    // so the pair space per document is ≤ C(256,2) BY CONFIGURATION.
    // The df frame joins back unhinted (vocabulary-sized — AQE
    // broadcasts it while small, shuffles at corpus scale); the
    // self-join is equi-keyed on doc_id (co-partitioned hash join) and
    // the pair counts reduce map-side before the tiny top-k. The oracle
    // replays both prunes.
    entry("q_cooccurrence",
      """WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | dfq AS (SELECT term, COUNT(*) df FROM t GROUP BY 1 HAVING COUNT(*) >= 3),
        | cp AS (SELECT doc_id, term FROM (
        |    SELECT t.doc_id, t.term, ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY d.df DESC, t.term) rn FROM t JOIN dfq d USING (term)) WHERE rn <= 256),
        | pr AS (SELECT a.term ta, b.term tb, COUNT(*) n_docs
        |        FROM cp a JOIN cp b ON a.doc_id = b.doc_id AND a.term < b.term GROUP BY 1,2),
        | r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, ta, tb) rk FROM pr)
        |SELECT rk, ta, tb, n_docs FROM r WHERE rk <= 15 ORDER BY rk""".stripMargin) { (s, dir) =>
      // NOT checkpointed (r18, measured): unlike q_pmi_pairs (THREE
      // consumers incl. an eager count), this t has two readers whose
      // shared distinct exchange is already reused; the sf10 ladder read
      // 16.2 s un-checkpointed vs 20.9 s checkpointed (min-of-2).
      val t = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id"))) // single-file scan → spread the pair loop
        .select(col("doc_id"), explode(tokens("text")).as("term"))
        .distinct()
      val dfq = t.groupBy(col("term").as("df_term")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3)
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df").desc, col("term").asc)
      val cp = t.join(dfq, col("term") === col("df_term"))
        .withColumn("rn", row_number().over(byDoc))
        .filter(col("rn") <= 256)
        .select(col("doc_id"), col("term"))
      val a = cp.toDF("doc_id", "ta") // fresh names: self-join
      val b = cp.toDF("b_doc_id", "tb")
      val pr = a.join(b, col("doc_id") === col("b_doc_id") && col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_docs"))
      topKRanked(pr, 15, "rk", col("n_docs").desc, col("ta").asc, col("tb").asc)
        .select(col("rk"), col("ta"), col("tb"), col("n_docs"))
        .orderBy(col("rk"))
    },

    // ---- PMI association pairs: top-15 token pairs by pointwise mutual
    // information LIFT (N·n_xy)/(df_x·df_y) with a min-support floor —
    // where q_cooccurrence ranks by raw co-count (surfacing stopword
    // pairs), PMI lift surfaces the SPECIFICALLY associated pairs
    // (named-entity collocations, templated phrases), the signal behind
    // phrase mining and embedding-context weighting. Candidate
    // discipline inherited from q_cooccurrence verbatim (df floor +
    // per-doc top-256 cap bound the per-doc quadratic). Exactness: lift
    // numerator and denominator are exact int64 products widened to
    // decimal(38,0)/HUGEINT (N·n_xy passes int64 at web scale) and the
    // rank orders by the ONE double division both engines compute from
    // identical integers, tie-broken totally.
    entry("q_pmi_pairs",
      """WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | nn AS (SELECT COUNT(DISTINCT doc_id) nd FROM t),
        | dfq AS (SELECT term, COUNT(*) df FROM t GROUP BY 1 HAVING COUNT(*) >= 3),
        | cp AS (SELECT doc_id, term, df FROM (
        |    SELECT t.doc_id, t.term, d.df, ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY d.df DESC, t.term) rn FROM t JOIN dfq d USING (term)) WHERE rn <= 256),
        | pr AS (SELECT a.term ta, b.term tb, a.df dfa, b.df dfb, COUNT(*) n_docs
        |        FROM cp a JOIN cp b ON a.doc_id = b.doc_id AND a.term < b.term
        |        GROUP BY 1,2,3,4 HAVING COUNT(*) >= 3),
        | sc AS (SELECT ta, tb, n_docs,
        |          CAST(CAST((SELECT nd FROM nn) AS HUGEINT) * n_docs AS DOUBLE)
        |            / CAST(CAST(dfa AS HUGEINT) * dfb AS DOUBLE) lift FROM pr),
        | r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, ta, tb) rk FROM sc)
        |SELECT rk, ta, tb, n_docs, lift FROM r WHERE rk <= 15 ORDER BY rk""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      // checkpoint the (doc_id, term) distinct frame: nn, dfq and the
      // capped candidate join all consume it — without the checkpoint the
      // tokenize→explode→distinct lineage (a full corpus re-tokenization)
      // runs three times in one query (registry-released after the query).
      // r19 two-scale re-test (the r18 ladder method): WITHOUT the
      // checkpoint sf10 29.5 s vs 27.9 s with, sf0.1 2.00 vs 2.02 —
      // KEPT (no scale where removal wins)
      val t = graft.functions.Checkpoints.lazyLocal(
        Tables(s, dir, "documents")
          .transform(Tables.spread(_, col("doc_id"))) // single-file scan → spread the pair loop
          .select(col("doc_id"), explode(tokens("text")).as("term"))
          .distinct())
      val nn = t.agg(countDistinct(col("doc_id")).as("nd"))
      val dfq = t.groupBy(col("term").as("df_term")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3)
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df").desc, col("term").asc)
      val cp = t.join(dfq, col("term") === col("df_term"))
        .withColumn("rn", row_number().over(byDoc))
        .filter(col("rn") <= 256)
        .select(col("doc_id"), col("term"), col("df"))
      val a = cp.toDF("doc_id", "ta", "dfa")
      val b = cp.toDF("b_doc_id", "tb", "dfb")
      val pr = a.join(b, col("doc_id") === col("b_doc_id") && col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"), col("dfa"), col("dfb"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 3)
      val sc = pr.crossJoin(broadcast(nn))
        .select(col("ta"), col("tb"), col("n_docs"),
          ((col("nd").cast(dec) * col("n_docs")).cast("double")
            / (col("dfa").cast(dec) * col("dfb")).cast("double")).as("lift"))
      topKRanked(sc, 15, "rk", col("lift").desc, col("ta").asc, col("tb").asc)
        .select(col("rk"), col("ta"), col("tb"), col("n_docs"), col("lift"))
        .orderBy(col("rk"))
    },

    // ---- Incremental INVERTED-INDEX maintenance: merge a materialized
    // index's per-term statistics with a delta batch's instead of
    // rebuilding from history — the q_incr_agg_maintain pattern applied
    // to the retrieval index (at 100 TB the nightly crawl must UPDATE
    // tf/df/doc-length stats, not re-tokenize the lake). Correct because
    // the split is doc-disjoint (doc_id mod 4), so df (a count of
    // DISTINCT docs per term) merges by plain addition — the one
    // index statistic that is NOT mergeable under overlapping doc sets —
    // and tf totals are re-aggregable sums. The oracle is the one-pass
    // rebuild: partial+merge must be bit-identical to it. Scale shape:
    // each side reduces map-side to its term-keyed summary; the merge
    // shuffles only the two vocabulary-sized summaries, never documents.
    entry("q_index_maintain",
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | tf AS (SELECT doc_id, term, COUNT(*) tf FROM t GROUP BY 1,2),
        | x AS (SELECT term, COUNT(*) df, CAST(SUM(tf) AS BIGINT) tf_total FROM tf GROUP BY 1),
        | r AS (SELECT term, df, tf_total,
        |         ROW_NUMBER() OVER (ORDER BY tf_total DESC, term) rk FROM x)
        |SELECT rk, term, df, tf_total FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin) { (s, dir) =>
      def side(pred: org.apache.spark.sql.Column) =
        Tables(s, dir, "documents").filter(pred)
          .select(col("doc_id"), explode(tokens("text")).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      val materialized = side(col("doc_id") % 4 =!= 0) // "yesterday's" index
      val delta = side(col("doc_id") % 4 === 0)        // today's crawl
      val merged = materialized.unionByName(delta)
        .groupBy(col("term"))
        .agg(sum(col("df")).as("df"), sum(col("tf_total")).as("tf_total"))
      topKRanked(merged, 20, "rk", col("tf_total").desc, col("term").asc)
        .select(col("rk"), col("term"), col("df"), col("tf_total"))
        .orderBy(col("rk"))
    },

    // ---- Corpus-LM surprisal scoring: per-document mean unigram
    // surprisal in whole bits — the frequency-weighted "how unusual is
    // this document under the corpus's own unigram LM" quality signal
    // (the cheap stand-in for perplexity filtering; rare-token-heavy docs
    // surface for review, boilerplate-heavy docs score near zero).
    // Exactness: surprisal = floor(log2(N DIV cnt)) computed WITHOUT
    // libm as length(bin(x)) - 1 — pure integer in both engines (Spark's
    // log2 is ln(x)/ln(2), which rounds UP to an exact integer at inputs
    // like 2^48-1 where a correctly-rounded log2 does not, so a
    // double-based floor would diverge exactly at the 10^14-token
    // corpus sizes this engine targets) — so the summed bits are exact
    // int64 and the one double division happens at presentation. Shape:
    // one vocab-sized
    // aggregate (map-side combined), the (doc, token, n) frame joins the
    // frequency table on the token key (AQE broadcasts a small vocab),
    // then one doc_id-keyed aggregate; the corpus is scanned twice
    // (frequency pass + join pass), never self-joined.
    entry("q_unigram_surprisal",
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
        | dt AS (SELECT doc_id, tok, COUNT(*) n FROM t GROUP BY 1,2),
        | f AS (SELECT tok, CAST(SUM(n) AS BIGINT) cnt FROM dt GROUP BY 1),
        | tot AS (SELECT CAST(SUM(cnt) AS BIGINT) tn FROM f),
        | s AS (SELECT dt.doc_id, dt.n,
        |         CAST(length(bin((SELECT tn FROM tot) // f.cnt)) - 1 AS BIGINT) sur
        |       FROM dt JOIN f USING (tok))
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) n_tokens,
        |  CAST(SUM(n * sur) AS BIGINT) sur_bits,
        |  CAST(SUM(n * sur) AS DOUBLE) / SUM(n) mean_surprisal,
        |  CAST(COALESCE(SUM(CASE WHEN sur >= 10 THEN n END), 0) AS BIGINT) n_rare
        |FROM s GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // checkpointed (r18, measured at two scales): the per-(doc, token)
      // tf frame is read by both the vocab rollup and the scoring join.
      // Unlike the bigram twin (whose bigger tf frame made the
      // checkpoint a net loss — see q_bigram_surprisal), the unigram
      // frame is small enough that storing beats the deduped recompute:
      // sf0.1 A/B 1.50 → 1.22 s, sf10 ladder min-of-4 ~11.0 → ~9.0 s.
      val dt = graft.functions.Checkpoints.lazyLocal(
        Tables(s, dir, "documents")
          .transform(Tables.spread(_, col("doc_id")))
          .select(col("doc_id"), explode(tokens("text")).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n")))
      // the DATA-REDUCED (vocab-sized) frame stays checkpointed: the
      // total and the join both re-read it; registry-managed so the
      // harness drops it after materialization
      val f = graft.functions.Checkpoints.lazyLocal(
        dt.groupBy(col("tok")).agg(sum(col("n")).as("cnt")))
      val tot = f.agg(sum(col("cnt")).as("tn"))
      dt.join(f, "tok").crossJoin(broadcast(tot))
        .withColumn("sur", expr("CAST(length(bin(tn DIV cnt)) - 1 AS BIGINT)"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(col("n") * col("sur")).as("sur_bits"),
          (sum(col("n") * col("sur")).cast("double") / sum(col("n"))).as("mean_surprisal"),
          coalesce(sum(when(col("sur") >= 10, col("n"))), lit(0L)).as("n_rare"))
        .orderBy(col("doc_id"))
    },

    // ---- Vocabulary frequency spectrum: token types and occurrences per
    // frequency OCTAVE (floor(log2(count)) buckets) — the corpus-health
    // Zipf audit: a natural corpus slopes smoothly down the octaves, a
    // template-generated or deduplicated-to-death one shows cliffs. Pure
    // integer counts into ≤ ~40 cells (floor-log2 as length(bin(x)) - 1,
    // no libm — see q_unigram_surprisal); one vocab aggregate, map-side
    // combined, nothing else.
    entry("q_freq_spectrum",
      """WITH t AS (SELECT unnest(string_split(text,' ')) tok FROM documents),
        | f AS (SELECT tok, COUNT(*) cnt FROM t GROUP BY 1)
        |SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) octave,
        |  COUNT(*) n_types, CAST(SUM(cnt) AS BIGINT) n_tokens
        |FROM f GROUP BY 1 ORDER BY octave""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(explode(tokens("text")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(expr("CAST(length(bin(cnt)) - 1 AS BIGINT)").as("octave"))
        .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_tokens"))
        .orderBy(col("octave"))
    },

    // ---- Sequence packing: docs packed in doc_id order into contiguous
    // 512-token context windows (tokens attributed to the window a doc
    // STARTS in; docs crossing a boundary counted as spanning) — the
    // token-budget planning table behind training-batch assembly. The
    // prefix sum is [[graft.functions.Ranking.withGlobalRunningSum]]:
    // value-bucketed per-partition running sums + driver offsets from
    // the bounded counts pass — a distributed scan, NO single-reducer
    // cumulative window even at 10⁹ documents.
    entry("q_seq_packing",
      """WITH t AS (SELECT doc_id, len(string_split(text,' ')) n_tok FROM documents),
        | c AS (SELECT doc_id, n_tok, CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS BIGINT) cum FROM t),
        | w AS (SELECT doc_id, n_tok, (cum - n_tok) // 512 ws, (cum - 1) // 512 we FROM c)
        |SELECT ws AS window_id, COUNT(*) n_docs, CAST(SUM(n_tok) AS BIGINT) n_tokens,
        |  COUNT(CASE WHEN we > ws THEN 1 END) n_spanning
        |FROM w GROUP BY 1 ORDER BY window_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), size(tokens("text")).cast("long").as("n_tok"))
      graft.functions.Ranking.withGlobalRunningSum(t, col("n_tok"),
          col("doc_id"), primaryAsc = true, Seq(col("doc_id")), "cum")
        .withColumn("ws", expr("(cum - n_tok) DIV 512"))
        .withColumn("we", expr("(cum - 1) DIV 512"))
        .groupBy(col("ws").as("window_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          count(when(col("we") > col("ws"), 1)).as("n_spanning"))
        .orderBy(col("window_id"))
    },

    // ---- BPE-style vocabulary induction
    // ([[graft.functions.BpeVocab.fit]]): 5 merges learned by
    // count-adjacent-pairs → driver argmax (deterministic (freq desc,
    // pair asc) tie-break) → greedy leftmost merge rewrite — the
    // tokenizer-training loop every LLM data pipeline runs before
    // anything else. Merges are BATCHED (batch = 5): each rewrite pass
    // applies every top pair whose symbols don't interact, under a
    // selection proven ≡ the sequential merge table (BpeSpec), so a
    // realistic 32k-merge vocabulary costs ~32k/batch corpus passes,
    // not 32k. Per round the corpus shuffles only vocabulary-sized
    // aggregate partials and the rewrite is a narrow array fold;
    // iteration state is checkpointed KMeans-style. No DuckDB oracle —
    // an iterative argmax is not SQL-expressible — so the driver
    // rows-only gate applies and BpeSpec carries the contract (round 1
    // ≡ an independent pair recount with the q_ngram_stats
    // tokenization; batched ≡ sequential; token totals strictly
    // decrease; merged pairs vanish from adjacency; repartition-
    // invariant).
    entryNoOracle("q_bpe_vocab") { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), tokens("text").as("toks"))
      val fit = graft.functions.BpeVocab.fit(docs, rounds = 5, batch = 5)
      // the merge table is plain driver data — drop the corpus
      // checkpoint immediately (this query never reads it)
      fit.release()
      import s.implicits._
      fit.merges.toDF()
        .select(col("step").cast("long").as("step"), col("left"),
          col("right"), col("pair_freq"))
        .orderBy(col("step"))
    },

    // ---- BPE tokenizer ENCODE ([[graft.functions.BpeVocab.encode]]) —
    // the inference twin of q_bpe_vocab's fit: learn a 5-merge table,
    // then apply it to the corpus in step order and report per-document
    // compression (token counts before/after, merged-symbol count,
    // ratio). The merge table is model parameters (plan literals), so
    // the encode is a pure chain of narrow per-row rewrites — zero
    // corpus shuffles beyond the presentation sort; at 100 TB this is
    // the scan-bound pass every training run executes after fit. No
    // DuckDB oracle (the table is data-dependent driver state from an
    // iterative argmax). A recursive-CTE replay was evaluated and
    // rejected (round 14): a SINGLE-round fit (pair counts on the raw
    // corpus → ranked disjoint-prefix selection → one composed rewrite)
    // IS plain-SQL-expressible, and the observed 5-merge tables at
    // sf0.01/sf0.1/sf1 happen to be single-round — but the fit's
    // CONTRACT is multi-round (the batch selection keeps only the
    // strict-gap disjoint prefix and re-counts the REWRITTEN corpus for
    // the remainder), and a recursive CTE cannot express the per-round
    // global pair count: SQL forbids aggregation over the recursive
    // working table (DuckDB included). An oracle correct only for
    // corpora where one batch happens to suffice would silently diverge
    // the first time a tie lands on the cut — rows-only gate; BpeSpec proves
    // encode(docs, fit.merges) ≡ fit's final corpus bit-for-bit, and
    // the compression accounting carries its own conservation law:
    // n_absorbed (embedded spaces across encoded symbols, counted from
    // the token CONTENTS) must equal n_before − n_after at any merge
    // depth (QueryInvariantSpec).
    entryNoOracle("q_bpe_encode") { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), tokens("text").as("toks"))
      val fit = graft.functions.BpeVocab.fit(docs, rounds = 5, batch = 5)
      fit.release() // the query re-encodes from the raw corpus below
      graft.functions.BpeVocab.encode(
          docs.withColumn("n_before", size(col("toks")).cast("long")), fit.merges)
        .select(col("doc_id"), col("n_before"),
          size(col("toks")).cast("long").as("n_after"),
          // r19: Σ_tok (size(split(tok,' ')) − 1) ≡ total embedded spaces
          // ≡ spaces in the separator-free concatenation — two codegen
          // string passes instead of an interpreted per-token aggregate
          // lambda (QueryInvariantSpec's conservation law still pins it)
          (length(array_join(col("toks"), ""))
            - length(translate(array_join(col("toks"), ""), " ", "")))
            .cast("long").as("n_absorbed"),
          (size(col("toks")).cast("double") / col("n_before")).as("compression"))
        .orderBy(col("doc_id"))
    },

    // ---- BOILERPLATE detection (C4-style line dedup adapted to
    // newline-free token streams): chop each document into fixed 3-token
    // pseudo-sentences, count how many DISTINCT documents each one
    // appears in, and flag chunks shared by ≥ 3 docs as boilerplate —
    // headers, footers, navigation chrome, license blurbs in real
    // corpora. Per-doc output: chunk count, boilerplate count, ratio (a
    // curation filter input alongside q_text_quality). Scale shape: one
    // narrow chunk explosion; chunks are HASHED to int64 (md5-prefix,
    // the same engine-portable family decontamination and the MinHash
    // bases use) before anything wide, so the (hash → distinct docs)
    // aggregate and the join back carry 8-byte keys instead of 3-token
    // strings; the shared-chunk index joins back with NO explicit
    // broadcast hint — at this scale AQE measures it small and picks
    // the broadcast itself, at 100 TB the unhinted plan degrades
    // gracefully to a shuffled equi-join (same reasoning as
    // q_fk_integrity). The corpus is never self-joined. Keys are 60-bit
    // ([[graft.functions.TextFunctions.md5Prefix64Sql]]) — the birthday
    // bound stays negligible even at 10^13 distinct chunks, unlike a
    // 32-bit prefix, and the oracle replays the identical hex→int
    // arithmetic so even a collision (which would merge two chunks' doc
    // counts) cannot diverge the engines.
    entry("q_boilerplate",
      """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
        | c AS (SELECT doc_id, unnest([array_to_string(toks[i*3+1:i*3+3],' ')
        |        for i in generate_series(0, CAST(ceil(len(toks)/3.0) AS INT)-1)]) chunk FROM t),
        | h AS (SELECT doc_id, list_sum([(strpos('0123456789abcdef', substr(md5(chunk), j, 1)) - 1)
        |        * CAST(pow(16, 15-j) AS BIGINT) for j in generate_series(1,15)]) ch FROM c),
        | b AS (SELECT ch FROM h GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 3),
        | s AS (SELECT h.doc_id, COUNT(*) n_chunks,
        |         COUNT(CASE WHEN b.ch IS NOT NULL THEN 1 END) n_boiler
        |       FROM h LEFT JOIN b USING (ch) GROUP BY 1)
        |SELECT doc_id, n_chunks, n_boiler,
        |  CAST(n_boiler AS DOUBLE)/n_chunks AS boiler_ratio
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), tokens("text").as("toks"))
        .select(col("doc_id"), explode(expr(
          // size=0 guard: Spark's sequence(0,-1) yields [0,-1] (descending)
          // where DuckDB's generate_series(0,-1) is empty — unreachable
          // today (split() never returns []) but clamped so a tokenizer
          // change can't silently diverge the engines
          "CASE WHEN size(toks) < 1 THEN CAST(array() AS ARRAY<STRING>) " +
            "ELSE transform(sequence(0, CAST(ceil(size(toks)/3.0) AS INT) - 1), " +
            "i -> array_join(slice(toks, i*3 + 1, 3), ' ')) END")).as("chunk"))
        .select(col("doc_id"), md5Prefix64("chunk").as("ch"))
      val boiler = c.groupBy(col("ch").as("b_ch"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3)
        .select(col("b_ch"))
      c.join(boiler, col("ch") === col("b_ch"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("b_ch").isNotNull, 1)).as("n_boiler"))
        .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
          (col("n_boiler").cast("double") / col("n_chunks")).as("boiler_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- Boilerplate REMOVAL — the transformation the detection above
    // feeds (C4 drops the shared lines; we drop the shared chunks and
    // reassemble what remains in original order). Reassembly is
    // inherently doc-local, so the per-doc collect_list is bounded by a
    // single document's length — never corpus-shaped state; the shared-
    // chunk index is int64 HASHES (md5-prefix, as in q_boilerplate — the
    // chunk TEXT rides only on the doc-local side for reassembly) and
    // joins back unhinted (AQE broadcasts it while it measures small).
    // Documents whose every chunk is boilerplate surface with
    // cleaned_chars = 0 rather than vanishing.
    entry("q_boilerplate_clean",
      """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
        | ch AS (SELECT doc_id, [array_to_string(toks[i*3+1:i*3+3],' ')
        |        for i in generate_series(0, CAST(ceil(len(toks)/3.0) AS INT)-1)] chunks FROM t),
        | c AS (SELECT doc_id, generate_subscripts(chunks,1) pos, unnest(chunks) chunk FROM ch),
        | hh AS (SELECT doc_id, pos, chunk, list_sum([(strpos('0123456789abcdef', substr(md5(chunk), j, 1)) - 1)
        |        * CAST(pow(16, 15-j) AS BIGINT) for j in generate_series(1,15)]) chash FROM c),
        | b AS (SELECT chash FROM hh GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 3),
        | kept AS (SELECT hh.doc_id, hh.pos, hh.chunk FROM hh LEFT JOIN b USING (chash) WHERE b.chash IS NULL),
        | agg AS (SELECT doc_id, COUNT(*) n_kept,
        |           length(array_to_string(list(chunk ORDER BY pos), ' ')) cleaned_chars
        |         FROM kept GROUP BY 1),
        | tot AS (SELECT doc_id, COUNT(*) n_chunks FROM hh GROUP BY 1)
        |SELECT tot.doc_id, tot.n_chunks,
        |  COALESCE(agg.n_kept, 0) AS n_kept,
        |  CAST(COALESCE(agg.cleaned_chars, 0) AS BIGINT) AS cleaned_chars
        |FROM tot LEFT JOIN agg ON tot.doc_id = agg.doc_id
        |ORDER BY tot.doc_id""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), tokens("text").as("toks"))
        .select(col("doc_id"), posexplode(expr(
          // size=0 guard: Spark's sequence(0,-1) yields [0,-1] (descending)
          // where DuckDB's generate_series(0,-1) is empty — unreachable
          // today (split() never returns []) but clamped so a tokenizer
          // change can't silently diverge the engines
          "CASE WHEN size(toks) < 1 THEN CAST(array() AS ARRAY<STRING>) " +
            "ELSE transform(sequence(0, CAST(ceil(size(toks)/3.0) AS INT) - 1), " +
            "i -> array_join(slice(toks, i*3 + 1, 3), ' ')) END")).as(Seq("pos", "chunk")))
        .withColumn("chash", md5Prefix64("chunk"))
      val boiler = c.groupBy(col("chash").as("b_ch"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3)
        .select(col("b_ch"))
      val kept = c.join(boiler, col("chash") === col("b_ch"), "left_anti")
      val agg = kept.groupBy(col("doc_id").as("a_doc"))
        .agg(count(lit(1)).as("n_kept"),
          length(array_join(expr(
            "transform(array_sort(collect_list(struct(pos, chunk))), t -> t.chunk)"),
            " ")).cast("long").as("cleaned_chars"))
      val tot = c.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      tot.join(agg, col("doc_id") === col("a_doc"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("cleaned_chars"), lit(0L)).as("cleaned_chars"))
        .orderBy(col("doc_id"))
    },

    // ---- Bigram (conditional) LM surprisal — the 2-gram upgrade of
    // q_unigram_surprisal: per document, mean whole-bit surprisal of
    // each bigram under the corpus's own bigram LM, where
    // sur(l,r) = floor(log2(cnt(l·)/cnt(l,r))) — "given the left token,
    // how surprising is the right one" — a strictly sharper
    // perplexity-filter stand-in than the unigram score (word-salad
    // documents score HIGH here even when their unigrams are common).
    // Exactness: floor-log2 as length(bin(x))-1 over an exact integer
    // division — no libm (see q_unigram_surprisal for why a double log2
    // diverges at corpus scale). Shape: per-doc bigram counts shuffle on
    // (doc, l, r); the bigram frequency table is vocab²-bounded (bigram
    // TYPES, not tokens), checkpointed once and re-read by its own
    // left-marginal aggregate and the join back — both joins UNHINTED
    // (the frequency side is vocabulary-sized; AQE broadcasts it while
    // small, shuffles at corpus scale); one doc_id-keyed final
    // aggregate. The corpus is scanned once.
    entry("q_bigram_surprisal",
      """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
        | b AS (SELECT doc_id, unnest([{'l': toks[i], 'r': toks[i+1]} for i in generate_series(1, len(toks)-1)]) p
        |       FROM t WHERE len(toks) >= 2),
        | dt AS (SELECT doc_id, p.l l, p.r r, COUNT(*) n FROM b GROUP BY 1,2,3),
        | f AS (SELECT l, r, CAST(SUM(n) AS BIGINT) cnt FROM dt GROUP BY 1,2),
        | m AS (SELECT l, CAST(SUM(cnt) AS BIGINT) mtot FROM f GROUP BY 1),
        | s AS (SELECT dt.doc_id, dt.n, CAST(length(bin(m.mtot // f.cnt)) - 1 AS BIGINT) sur
        |       FROM dt JOIN f USING (l, r) JOIN m USING (l))
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) n_bigrams, CAST(SUM(n*sur) AS BIGINT) sur_bits,
        |  CAST(SUM(n*sur) AS DOUBLE)/SUM(n) mean_surprisal,
        |  CAST(COALESCE(SUM(CASE WHEN sur >= 8 THEN n END),0) AS BIGINT) n_rare
        |FROM s GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // NOT checkpointed (r18, measured): exchange reuse already shares
      // dt's (doc, l, r) aggregate between its two readers; the sf10
      // ladder read 37.0 s un-checkpointed vs 45.8 s checkpointed
      // (min-of-2) — the tf-shaped materialization costs more than the
      // deduped recompute at scale.
      val dt = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), tokens("text").as("toks"))
        .select(col("doc_id"), explode(expr(
          // size < 2 guard: sequence(1, 0) DESCENDS where "no bigrams" is meant
          "CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRUCT<l: STRING, r: STRING>>) " +
            "ELSE transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i-1] AS l, toks[i] AS r)) END")).as("p"))
        .groupBy(col("doc_id"), col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("n"))
      // checkpoint the DATA-REDUCED bigram frequency frame: its own
      // left-marginal aggregate and the join back both re-read it
      // (registry-managed — the harness drops it after materialization)
      val f = graft.functions.Checkpoints.lazyLocal(
        dt.groupBy(col("l"), col("r")).agg(sum(col("n")).as("cnt")))
      val m = f.groupBy(col("l")).agg(sum(col("cnt")).as("mtot"))
      dt.join(f, Seq("l", "r")).join(m, Seq("l"))
        .withColumn("sur", expr("CAST(length(bin(mtot DIV cnt)) - 1 AS BIGINT)"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_bigrams"),
          sum(col("n") * col("sur")).as("sur_bits"),
          (sum(col("n") * col("sur")).cast("double") / sum(col("n"))).as("mean_surprisal"),
          coalesce(sum(when(col("sur") >= 8, col("n"))), lit(0L)).as("n_rare"))
        .orderBy(col("doc_id"))
    },

    // ---- DSIR-style importance weights (data selection with importance
    // resampling, Xie et al. 2023): score every document by how much its
    // hashed-bigram distribution looks like a TARGET slice (here sources
    // src0-src3 — a curated "high-quality" list; production points at a
    // reference corpus) versus the general pool — the data-recipe op
    // behind targeted pretraining mixtures. Per-bigram importance is
    // computed in integer BITS (the q_unigram_surprisal idiom:
    // floor-log2 via length(bin(n)) − 1 of the add-1-smoothed inverse
    // rates — no libm, engines agree bit-for-bit): dsir_bits =
    // Σ n·(surprisal_general − surprisal_target); positive = closer to
    // the target. Scale shape: one corpus pass builds the per-doc hashed
    // bigram counts (8-byte md5-prefix keys, the repo-wide family); BOTH
    // distribution counts come out of ONE vocab-sized aggregation
    // (conditional sum for the target slice), checkpointed and re-read
    // by the unhinted join back (AQE broadcasts the vocab frame while it
    // measures small, shuffles at 100 TB); the scoring join + per-doc
    // aggregate are map-side combinable.
    entry("q_dsir_weights",
      s"""WITH t AS (SELECT doc_id, source, string_split(text,' ') toks FROM documents),
        | bg AS (SELECT doc_id, source, unnest([${md5Prefix64Oracle("toks[i] || ' ' || toks[i+1]")}
        |          for i in generate_series(1, len(toks)-1)]) g
        |        FROM t WHERE len(toks) >= 2),
        | dt AS (SELECT doc_id, source, g, COUNT(*) n FROM bg GROUP BY 1,2,3),
        | vc AS (SELECT g, CAST(SUM(n) AS BIGINT) cg,
        |          CAST(COALESCE(SUM(CASE WHEN source IN ('src0','src1','src2','src3') THEN n END), 0) AS BIGINT) ct
        |        FROM dt GROUP BY 1),
        | tots AS (SELECT COUNT(*) v, CAST(SUM(cg) AS BIGINT) ng, CAST(SUM(ct) AS BIGINT) nt FROM vc),
        | sc AS (SELECT dt.doc_id, dt.source, dt.n,
        |          CAST(length(bin((tots.nt + tots.v) // (vc.ct + 1))) - 1 AS BIGINT) st,
        |          CAST(length(bin((tots.ng + tots.v) // (vc.cg + 1))) - 1 AS BIGINT) sg
        |        FROM dt JOIN vc USING (g) CROSS JOIN tots)
        |SELECT doc_id, source, source IN ('src0','src1','src2','src3') is_target,
        |  CAST(SUM(n) AS BIGINT) n_bigrams, CAST(SUM(n*(sg - st)) AS BIGINT) dsir_bits,
        |  CAST(SUM(n*(sg - st)) AS DOUBLE)/SUM(n) mean_bits
        |FROM sc GROUP BY 1,2,3 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val targets = Seq("src0", "src1", "src2", "src3")
      // NOT checkpointed (r18, measured): dt's double consumption is
      // already deduplicated by exchange reuse (its (doc, source, g)
      // aggregate exchange is an identical subtree under both readers),
      // so a checkpoint only adds a serialization barrier — sf10 ladder
      // min-of-2 read 29.4 s un-checkpointed vs 38.6 s checkpointed.
      val dt = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), col("source"), tokens("text").as("toks"))
        .select(col("doc_id"), col("source"), explode(expr(
          // size < 2 guard: sequence(1, 0) DESCENDS where "no bigrams" is meant
          "CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<BIGINT>) " +
            "ELSE transform(sequence(1, size(toks) - 1), " +
            s"i -> ${md5Prefix64Sql("concat(toks[i-1], ' ', toks[i])")}) END")).as("g"))
        .groupBy(col("doc_id"), col("source"), col("g"))
        .agg(count(lit(1)).as("n"))
      // ONE vocab-sized frame carries both distributions (general count
      // + conditional target count) — checkpointed: the totals row and
      // the scoring join both re-read it (registry-managed)
      val vc = graft.functions.Checkpoints.lazyLocal(
        dt.groupBy(col("g")).agg(sum(col("n")).as("cg"),
          coalesce(sum(when(col("source").isInCollection(targets), col("n"))), lit(0L)).as("ct")))
      val tots = vc.agg(count(lit(1)).as("v"), sum(col("cg")).as("ng"), sum(col("ct")).as("nt"))
      dt.join(vc, "g").crossJoin(broadcast(tots))
        .withColumn("st", expr("CAST(length(bin((nt + v) DIV (ct + 1))) - 1 AS BIGINT)"))
        .withColumn("sg", expr("CAST(length(bin((ng + v) DIV (cg + 1))) - 1 AS BIGINT)"))
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("n")).as("n_bigrams"),
          sum(col("n") * (col("sg") - col("st"))).as("dsir_bits"),
          (sum(col("n") * (col("sg") - col("st"))).cast("double") / sum(col("n"))).as("mean_bits"))
        .select(col("doc_id"), col("source"),
          col("source").isInCollection(targets).as("is_target"),
          col("n_bigrams"), col("dsir_bits"), col("mean_bits"))
        .orderBy(col("doc_id"))
    },

    // ---- Boolean AND-retrieval over the inverted index (the search
    // twin of q_inverted_index): for each query = a conjunctive term
    // list, the documents containing EVERY term, reported as per-query
    // match counts + hit-token mass (query 3 deliberately names a term
    // absent from the corpus — the zero-match row must survive the left
    // join). Scale shape: the query list is USER INPUT — bounded by
    // configuration, the one side that legitimately keeps an explicit
    // broadcast hint — so the corpus-side term filter is a map-side hash
    // join (the scan streams, only matching postings shuffle); the
    // all-terms test is count-distinct-per-(query, doc) vs the query's
    // term count, never an N-way self-join.
    entry("q_bool_retrieval",
      """WITH q(query_id, term) AS (VALUES (1, 'spark'), (1, 'window'), (1, 'hash'),
        |    (2, 'slow'), (2, 'fast'), (2, 'merge'), (3, 'spark'), (3, 'zzznotaterm')),
        | qn AS (SELECT query_id, COUNT(*) nt FROM q GROUP BY 1),
        | t AS (SELECT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | dt AS (SELECT doc_id, term, COUNT(*) n FROM t GROUP BY 1,2),
        | j AS (SELECT q.query_id, dt.doc_id, dt.n FROM dt JOIN q ON dt.term = q.term),
        | md AS (SELECT j.query_id, j.doc_id, COUNT(*) np, CAST(SUM(j.n) AS BIGINT) hits
        |        FROM j GROUP BY 1,2),
        | ok AS (SELECT md.query_id, md.doc_id, md.hits FROM md
        |        JOIN qn ON md.query_id = qn.query_id AND md.np = qn.nt)
        |SELECT qn.query_id, CAST(qn.nt AS BIGINT) n_terms, COUNT(ok.doc_id) n_docs,
        |  CAST(COALESCE(SUM(ok.hits), 0) AS BIGINT) n_hit_tokens,
        |  MIN(ok.doc_id) first_doc
        |FROM qn LEFT JOIN ok ON qn.query_id = ok.query_id
        |GROUP BY 1, 2 ORDER BY qn.query_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val q = Seq((1L, "spark"), (1L, "window"), (1L, "hash"),
          (2L, "slow"), (2L, "fast"), (2L, "merge"), (3L, "spark"), (3L, "zzznotaterm"))
        .toDF("query_id", "term")
      val qn = q.groupBy(col("query_id")).agg(count(lit(1)).as("nt"))
      val dt = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(tokens("text")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("n"))
      // broadcast(q)/broadcast(qn) are configuration-bounded: the user's
      // query list, never data-proportional
      val md = dt.join(broadcast(q), "term")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("np"), sum(col("n")).as("hits"))
      val ok = md.join(broadcast(qn.toDF("k_qid", "k_nt")),
          col("query_id") === col("k_qid") && col("np") === col("k_nt"))
        .select(col("query_id").as("o_qid"), col("doc_id"), col("hits"))
      qn.join(ok, col("query_id") === col("o_qid"), "left")
        .groupBy(col("query_id"), col("nt"))
        .agg(count(col("doc_id")).as("n_docs"),
          coalesce(sum(col("hits")), lit(0L)).as("n_hit_tokens"),
          min(col("doc_id")).as("first_doc"))
        .select(col("query_id"), col("nt").cast("long").as("n_terms"),
          col("n_docs"), col("n_hit_tokens"), col("first_doc"))
        .orderBy(col("query_id"))
    },

    // ---- Mixture RESAMPLING — executing a mixture plan (q_data_mixture
    // computes shares; this op enforces target ones): per-language keep
    // rates applied by DETERMINISTIC hash gating — keep a doc iff
    // md5-prefix-hash(doc_id) mod 100 < rate(lang) — the standard
    // reproducible down-sampler (no RNG, no seed drift across retries /
    // engines / partitionings; the identical doc set survives any
    // re-run). Pure narrow map + one tiny aggregate; the oracle replays
    // the hash arithmetic, so the gate checks the SAMPLE ITSELF, not
    // just its size.
    entry("q_mixture_resample",
      s"""WITH d AS (SELECT lang, len(string_split(text,' ')) n_tok,
        |    ${md5Prefix64Oracle("CAST(doc_id AS VARCHAR)")} % 100 h,
        |    CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 80 WHEN 'es' THEN 90 WHEN 'fr' THEN 70 ELSE 100 END rate
        |  FROM documents)
        |SELECT lang, COUNT(*) n_before,
        |  CAST(COUNT(CASE WHEN h < rate THEN 1 END) AS BIGINT) n_after,
        |  CAST(SUM(n_tok) AS BIGINT) tok_before,
        |  CAST(COALESCE(SUM(CASE WHEN h < rate THEN n_tok END), 0) AS BIGINT) tok_after,
        |  CAST(COUNT(CASE WHEN h < rate THEN 1 END) AS DOUBLE)/COUNT(*) realized_rate
        |FROM d GROUP BY 1 ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("lang"), size(tokens("text")).cast("long").as("n_tok"),
          (md5Prefix64("CAST(doc_id AS STRING)") % 100).as("h"),
          expr("CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 80 WHEN 'es' THEN 90 " +
            "WHEN 'fr' THEN 70 ELSE 100 END").as("rate"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_before"),
          count(when(col("h") < col("rate"), 1)).as("n_after"),
          sum(col("n_tok")).as("tok_before"),
          coalesce(sum(when(col("h") < col("rate"), col("n_tok"))), lit(0L)).as("tok_after"),
          (count(when(col("h") < col("rate"), 1)).cast("double") / count(lit(1)))
            .as("realized_rate"))
        .orderBy(col("lang"))
    },

    // ---- Temperature-scaled mixture weights — the OTHER way training
    // mixtures get built (q_data_mixture/q_mixture_resample take rates as
    // GIVEN; this DERIVES them): sample sources proportional to
    // n_docs^α, the classic temperature reweighting that upsamples small
    // sources without letting the biggest source dominate. α = 0.5 is
    // deliberate: sqrt is correctly rounded in IEEE-754, so both engines
    // compute bit-identical weights (a general pow(x, 0.7) is NOT
    // cross-engine exact). The normalizer Σw is summed in FORCED ORDER —
    // a running sum over ORDER BY source, then MAX over the running
    // column (all w > 0, so the max IS the final prefix) — because a
    // plain SUM over doubles is free to reassociate differently per
    // engine/partitioning; every downstream double op then has identical
    // operands on both sides. Scale shape: the corpus reduces map-side
    // to |sources| rows; the windows run on that configuration-bounded
    // frame (the single-partition window warning is about a ~5-row
    // frame). Outputs: weight, share, a 10k-doc allocation, and the
    // effective epochs each source repeats under that allocation — the
    // number a mixture designer actually reads.
    entry("q_mixture_temperature",
      """WITH s AS (SELECT source, COUNT(*) n_docs,
        |      CAST(SUM(len(string_split(text,' '))) AS BIGINT) n_tok
        |    FROM documents GROUP BY 1),
        | w AS (SELECT source, n_docs, n_tok, sqrt(CAST(n_docs AS DOUBLE)) w FROM s),
        | r AS (SELECT *, SUM(w) OVER (ORDER BY source
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) rsum FROM w),
        | t AS (SELECT *, MAX(rsum) OVER () z FROM r)
        |SELECT source, n_docs, n_tok, w, w/z AS share,
        |  CAST(floor(w/z * 10000) AS BIGINT) AS alloc_docs,
        |  (w/z * 10000) / n_docs AS epochs
        |FROM t ORDER BY source""".stripMargin) { (s, dir) =>
      val byS = Tables(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(size(tokens("text"))).as("n_tok"))
        .withColumn("w", sqrt(col("n_docs").cast("double")))
      val run = Window.orderBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy()
      byS.withColumn("rsum", sum(col("w")).over(run))
        .withColumn("z", max(col("rsum")).over(whole))
        .select(col("source"), col("n_docs"), col("n_tok"), col("w"),
          (col("w") / col("z")).as("share"),
          floor(col("w") / col("z") * 10000).cast("long").as("alloc_docs"),
          ((col("w") / col("z") * 10000) / col("n_docs")).as("epochs"))
        .orderBy(col("source"))
    },

    // ---- Deterministic k-fold split audit — the train/validation
    // assignment every fine-tune/eval pipeline needs to be REPRODUCIBLE:
    // fold = md5-prefix-hash('fold_' || doc_id) mod 5 (salted so the
    // fold hash is independent of q_mixture_resample's sampling hash),
    // reported as per-(fold, lang) doc and token balance. Narrow map +
    // one tiny aggregate; the oracle replays the hash, gating the
    // ASSIGNMENT itself.
    entry("q_fold_split",
      s"""WITH d AS (SELECT lang, len(string_split(text,' ')) n_tok,
        |    CAST(${md5Prefix64Oracle("'fold_' || CAST(doc_id AS VARCHAR)")} % 5 AS BIGINT) fold FROM documents)
        |SELECT fold, lang, COUNT(*) n_docs, CAST(SUM(n_tok) AS BIGINT) n_tokens
        |FROM d GROUP BY 1,2 ORDER BY fold, lang""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("lang"), size(tokens("text")).cast("long").as("n_tok"),
          (md5Prefix64("concat('fold_', CAST(doc_id AS STRING))") % 5).as("fold"))
      d.groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("fold"), col("lang"))
    },

    // ---- Curriculum bucketing: split the corpus into 4 equal-count
    // training phases by document length (short → long — the classic
    // length curriculum), with per-phase token budgets. The quartile
    // assignment is [[graft.functions.Ranking.withGlobalNtile]] — the
    // value-bucketed distributed NTILE (local ranks + driver offsets
    // from the bounded counts pass), so phase assignment never funnels
    // the corpus through one reducer the way `NTILE() OVER (ORDER BY …)`
    // does; the oracle states the same split declaratively with the
    // single-reducer window DuckDB can afford at oracle scale.
    entry("q_curriculum",
      """WITH d AS (SELECT doc_id, len(string_split(text,' ')) n_tok FROM documents),
        | r AS (SELECT doc_id, n_tok, NTILE(4) OVER (ORDER BY n_tok, doc_id) phase FROM d)
        |SELECT phase, COUNT(*) n_docs, MIN(n_tok) min_tok, MAX(n_tok) max_tok,
        |  CAST(SUM(n_tok) AS BIGINT) n_tokens,
        |  CAST(SUM(n_tok) AS DOUBLE)/COUNT(*) mean_tok
        |FROM r GROUP BY 1 ORDER BY phase""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), size(tokens("text")).cast("long").as("n_tok"))
      graft.functions.Ranking.withGlobalNtile(d, 4,
          col("n_tok"), primaryAsc = true, Seq(col("n_tok"), col("doc_id")), "phase")
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"), min(col("n_tok")).as("min_tok"),
          max(col("n_tok")).as("max_tok"), sum(col("n_tok")).as("n_tokens"),
          (sum(col("n_tok")).cast("double") / count(lit(1))).as("mean_tok"))
        .orderBy(col("phase"))
    },

    // ---- Budget-capped corpus selection: per source, keep documents in
    // quality order (alphabetic ratio DESC, doc_id tie-break) while the
    // cumulative token count stays within a 1000-token budget — the
    // "best docs under a token quota" selection every data-recipe build
    // runs per source/domain. The oracle states it as the obvious
    // per-source cumulative window; the Spark plan is the SCALABLE
    // two-pass refinement of that window (per-group twin of the Ranking
    // module's value-bucketed design): (1) bucket quality into ≤257
    // floor(q·256) cells and aggregate (source × bucket) token sums — a
    // CONFIGURATION-bounded frame (sources are a curated list, never
    // corpus-proportional), so its cumulative window and the join back
    // (broadcast) are free; (2) buckets that fit entirely under the
    // budget keep every doc with NO per-doc window at all, buckets past
    // it drop every doc, and only the ONE boundary bucket per source
    // (~1/256 of a source, recursable in production) runs a per-doc
    // running sum. Bucket-then-(q, doc_id) order refines global
    // (q, doc_id) order because the bucket is a monotone function of q,
    // so the kept set is EXACTLY the oracle window's. Exactness: q is
    // one double division of exact ints and floor(q·256) one IEEE
    // multiply — bit-identical in both engines; all sums are int64.
    entry("q_token_budget",
      """WITH d AS (SELECT doc_id, source, len(string_split(text,' ')) n_tok,
        |    CAST(length(regexp_replace(text,'[^a-z]','','g')) AS DOUBLE)/length(text) q
        |  FROM documents),
        | c AS (SELECT *, CAST(SUM(n_tok) OVER (PARTITION BY source
        |          ORDER BY q DESC, doc_id) AS BIGINT) cum FROM d)
        |SELECT source, COUNT(*) n_docs, CAST(SUM(n_tok) AS BIGINT) tok_total,
        |  COUNT(CASE WHEN cum <= 1000 THEN 1 END) n_kept,
        |  CAST(COALESCE(SUM(CASE WHEN cum <= 1000 THEN n_tok END), 0) AS BIGINT) tok_kept,
        |  CAST(COALESCE(SUM(CASE WHEN cum <= 1000 THEN n_tok END), 0) AS DOUBLE)/1000 budget_util
        |FROM c GROUP BY 1 ORDER BY source""".stripMargin) { (s, dir) =>
      val budget = 1000L
      // checkpointed (r18, measured): the doc-level quality/size frame
      // costs a tokenize + regex strip per document and is consumed by
      // the bucket aggregate AND the join back; the frame is narrow
      // (5 columns, one row per doc), so storing it wins decisively —
      // sf10 ladder 9.0 → 5.5 s (min-of-2)
      val d = graft.functions.Checkpoints.lazyLocal(
        Tables(s, dir, "documents")
          .transform(Tables.spread(_, col("doc_id")))
          .select(col("doc_id"), col("source"),
            size(tokens("text")).cast("long").as("n_tok"),
            (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
              / length(col("text"))).as("q"))
          .withColumn("qb", floor(col("q") * 256).cast("int")))
      // pass 1: the (source × quality-bucket) token sums — bounded frame
      val wb = Window.partitionBy(col("source")).orderBy(col("qb").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val b = d.groupBy(col("source"), col("qb"))
        .agg(sum(col("n_tok")).as("bt"))
        .withColumn("cum_before", coalesce(sum(col("bt")).over(wb), lit(0L)))
        .withColumnRenamed("source", "b_src").withColumnRenamed("qb", "b_qb")
      // pass 2: join the bounded bucket frame back; only the boundary
      // bucket needs a per-doc running sum
      val dd = d.join(broadcast(b),
        col("source") === col("b_src") && col("qb") === col("b_qb"))
      val full = dd.filter(col("cum_before") + col("bt") <= budget)
        .withColumn("keep", lit(true))
      val dropped = dd.filter(col("cum_before") >= budget)
        .withColumn("keep", lit(false))
      val wdoc = Window.partitionBy(col("source"))
        .orderBy(col("q").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundary = dd
        .filter(col("cum_before") < budget && col("cum_before") + col("bt") > budget)
        .withColumn("keep", col("cum_before") + sum(col("n_tok")).over(wdoc) <= budget)
      full.unionByName(boundary.select(full.columns.map(col): _*))
        .unionByName(dropped)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"),
          count(when(col("keep"), 1)).as("n_kept"),
          coalesce(sum(when(col("keep"), col("n_tok"))), lit(0L)).as("tok_kept"),
          (coalesce(sum(when(col("keep"), col("n_tok"))), lit(0L)).cast("double")
            / budget).as("budget_util"))
        .orderBy(col("source"))
    },

    // ---- PII scrubbing / redaction audit: count deny-pattern matches
    // per document and measure the redacted text — the scrub-and-account
    // pass every compliance-bound corpus build runs before release. The
    // deny pattern here is a literal alternation over terms present in
    // the synthetic corpus (this corpus contains no digits or @-forms,
    // so email/phone regexes would gate nothing); production swaps in
    // the usual email/phone/SSN patterns — the PLAN is identical: one
    // codegen'd narrow map over the scan (regexp_extract_all +
    // regexp_replace), zero shuffles before the final presentation sort,
    // embarrassingly parallel at 100 TB. The alternation-of-literals
    // pattern means Java regex and RE2 agree exactly; counts are exact
    // ints and the ratio one double division.
    entry("q_pii_scrub",
      """WITH d AS (SELECT doc_id, length(text) chars_before,
        |    len(regexp_extract_all(text, 'customer|vector')) n_hits,
        |    length(regexp_replace(text, 'customer|vector', '[REDACTED]', 'g')) chars_after
        |  FROM documents)
        |SELECT doc_id, CAST(n_hits AS BIGINT) n_hits, chars_before, chars_after,
        |  n_hits > 0 AS flagged,
        |  CAST(chars_after - chars_before AS DOUBLE)/chars_before AS growth
        |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("chars_before"),
          size(regexp_extract_all(col("text"), lit("customer|vector"), lit(0)))
            .cast("long").as("n_hits"),
          length(regexp_replace(col("text"), "customer|vector", "[REDACTED]"))
            .as("chars_after"))
        .select(col("doc_id"), col("n_hits"), col("chars_before"), col("chars_after"),
          (col("n_hits") > 0).as("flagged"),
          ((col("chars_after") - col("chars_before")).cast("double")
            / col("chars_before")).as("growth"))
        .orderBy(col("doc_id"))
    },

    // ---- BM25 ranked retrieval (the scoring twin of q_bool_retrieval):
    // per query, the top-3 documents under Okapi BM25 saturation
    // (k1 = 1.2, b = 0.75) with the RATIONAL idf surrogate
    // (N − df + ½)/(df + ½) in place of its logarithm — ln() differs in
    // the last ulp across engines (the q_tfidf treatment). Exactness
    // contract: both BM25 factors are cleared of fractional literals
    // (×2 for the idf halves, ×20·Σdl for the saturation — a bare `0.5`
    // parses as DECIMAL in both engines with DIFFERENT scale rules, a
    // divergence measured at 8 nano-units in testing), so each factor is
    // one division of exact int64s, the per-term score two IEEE divides
    // + one multiply written with identical text in both engines, then
    // QUANTIZED to nano-units (floor ×1e9 → int64) so the per-document
    // SUM over matched terms is an ORDER-FREE integer sum — double
    // addition is non-associative, and aggregation order differs across
    // engines, so summing raw doubles would hash-mismatch. Scale shape:
    // tf/dl are the inverted-index aggregates (term- and doc-keyed map-
    // side partials); the query list is configuration-bounded USER INPUT
    // → broadcast; df is vocabulary-sized but is semi-joined down to the
    // query's terms BEFORE its broadcast, so the hint is bounded by the
    // query, not the corpus; the rank window partitions by query over
    // candidate docs only (docs sharing ≥1 term), after full reduction.
    entry("q_bm25",
      s"""WITH q(query_id, term) AS (VALUES (1, 'spark'), (1, 'window'), (2, 'hash'),
        |    (2, 'merge'), (3, 'vector'), (3, 'fast')),
        | t AS (SELECT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | tf AS (SELECT doc_id, term, COUNT(*) tf FROM t GROUP BY 1,2),
        | dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) dl FROM tf GROUP BY 1),
        | n AS (SELECT COUNT(*) nd, CAST(SUM(dl) AS BIGINT) sd FROM dl),
        | df AS (SELECT term, COUNT(*) df FROM tf GROUP BY 1),
        | sc AS (SELECT q.query_id, tf.doc_id,
        |     CAST(floor(1000000000 * ((CAST(2 * nd - 2 * df + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE)) * (CAST(22 * tf AS DOUBLE) * CAST(sd AS DOUBLE) / (CAST(10 * sd AS DOUBLE) * CAST(tf AS DOUBLE) + CAST(3 * sd AS DOUBLE) + CAST(9 * dl AS DOUBLE) * CAST(nd AS DOUBLE))))) AS BIGINT) s
        |   FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term
        |   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n),
        | agg AS (SELECT query_id, doc_id, COUNT(*) n_terms, CAST(SUM(s) AS BIGINT) score_n
        |         FROM sc GROUP BY 1,2),
        | r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |         ORDER BY score_n DESC, doc_id) rn FROM agg)
        |SELECT query_id, CAST(rn AS BIGINT) rn, doc_id, score_n, n_terms
        |FROM r WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      val q = Seq((1L, "spark"), (1L, "window"), (2L, "hash"),
          (2L, "merge"), (3L, "vector"), (3L, "fast"))
        .toDF("query_id", "term")
      val t = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(tokens("text")).as("term"))
      // doc lengths, corpus totals, df AND the score join all consume the
      // tf aggregate — checkpoint it so the tokenize+explode (the
      // dominant cost) runs ONCE, not once per consumer.
      // r19 two-scale re-test: WITHOUT it sf10 16.1 s vs 10.4 s with,
      // sf0.1 1.52 vs 1.67 (noise) — KEPT (sf10 says exchange reuse does
      // NOT dedup this subtree across the broadcast-nested consumers)
      val tf = graft.functions.Checkpoints.lazyLocal(
        t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val n = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sd"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // shrink the vocabulary-sized df frame to the query's terms before
      // hinting — bounded by the query list, never the corpus
      val dfq = df.join(broadcast(q.select(col("term")).distinct()), "term")
      tf.join(broadcast(q), "term")
        .join(broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(n))
        .withColumn("s", expr("CAST(floor(1000000000 * ((CAST(2 * nd - 2 * df + 1 AS DOUBLE) " +
          "/ CAST(2 * df + 1 AS DOUBLE)) * (CAST(22 * tf AS DOUBLE) * CAST(sd AS DOUBLE) " +
          "/ (CAST(10 * sd AS DOUBLE) * CAST(tf AS DOUBLE) + CAST(3 * sd AS DOUBLE) " +
          "+ CAST(9 * dl AS DOUBLE) * CAST(nd AS DOUBLE))))) AS BIGINT)"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_n"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("score_n").desc, col("doc_id").asc)).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("query_id"), col("rn"), col("doc_id"), col("score_n"), col("n_terms"))
        .orderBy(col("query_id"), col("rn"))
    },

    // ---- RETRIEVAL EVALUATION harness: P@3, P@10 and MRR of the exact
    // q_bm25 ranking against a deterministic relevance oracle (relevant =
    // docs matching ALL of the query's terms — the conjunctive subset BM25
    // should surface first). This is the op an LLM-retrieval pipeline runs
    // CONTINUOUSLY — index or scorer changes gate on eval metrics, not
    // eyeballs. Exactness: the integer-rational BM25 score is shared with
    // q_bm25 verbatim; the metrics are exact int hit counts with single
    // double divisions (P@k = hits/k, MRR = max over hits of 1/rank — the
    // same division in both engines). Scale shape inherits q_bm25 (one
    // checkpointed tf pass, query-bounded broadcasts, the rank window
    // over candidate docs only); the relevance set is candidate-bounded
    // (a subset of scored pairs), joined back on (query, doc).
    entry("q_retrieval_eval",
      s"""WITH q(query_id, term) AS (VALUES (1, 'spark'), (1, 'window'), (2, 'hash'),
        |    (2, 'merge'), (3, 'vector'), (3, 'fast')),
        | qn AS (SELECT query_id, COUNT(DISTINCT term) qsize FROM q GROUP BY 1),
        | t AS (SELECT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | tf AS (SELECT doc_id, term, COUNT(*) tf FROM t GROUP BY 1,2),
        | dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) dl FROM tf GROUP BY 1),
        | n AS (SELECT COUNT(*) nd, CAST(SUM(dl) AS BIGINT) sd FROM dl),
        | df AS (SELECT term, COUNT(*) df FROM tf GROUP BY 1),
        | sc AS (SELECT q.query_id, tf.doc_id,
        |     CAST(floor(1000000000 * ((CAST(2 * nd - 2 * df + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE)) * (CAST(22 * tf AS DOUBLE) * CAST(sd AS DOUBLE) / (CAST(10 * sd AS DOUBLE) * CAST(tf AS DOUBLE) + CAST(3 * sd AS DOUBLE) + CAST(9 * dl AS DOUBLE) * CAST(nd AS DOUBLE))))) AS BIGINT) s
        |   FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term
        |   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n),
        | agg AS (SELECT query_id, doc_id, COUNT(*) n_terms, CAST(SUM(s) AS BIGINT) score_n
        |         FROM sc GROUP BY 1,2),
        | rel AS (SELECT agg.query_id, agg.doc_id FROM agg JOIN qn USING (query_id)
        |         WHERE agg.n_terms = qn.qsize),
        | nrel AS (SELECT query_id, COUNT(*) n_relevant FROM rel GROUP BY 1),
        | r AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
        |         ORDER BY score_n DESC, doc_id) rn FROM agg),
        | j AS (SELECT r.query_id, r.rn,
        |         CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END hit
        |       FROM r LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
        |       WHERE r.rn <= 10)
        |SELECT j.query_id,
        |  CAST(COALESCE(MAX(nrel.n_relevant), 0) AS BIGINT) AS n_relevant,
        |  CAST(COALESCE(SUM(CASE WHEN rn <= 3 THEN hit END), 0) AS BIGINT) AS hits3,
        |  CAST(SUM(hit) AS BIGINT) AS hits10,
        |  CAST(COALESCE(SUM(CASE WHEN rn <= 3 THEN hit END), 0) AS DOUBLE) / 3 AS p_at_3,
        |  COALESCE(MAX(CASE WHEN hit = 1 THEN CAST(1 AS DOUBLE) / rn END), 0.0) AS mrr
        |FROM j LEFT JOIN nrel ON j.query_id = nrel.query_id
        |GROUP BY j.query_id ORDER BY j.query_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val q = Seq((1L, "spark"), (1L, "window"), (2L, "hash"),
          (2L, "merge"), (3L, "vector"), (3L, "fast"))
        .toDF("query_id", "term")
      val qn = q.groupBy(col("query_id").as("qn_qid"))
        .agg(countDistinct(col("term")).as("qsize"))
      val t = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(tokens("text")).as("term"))
      // r19 two-scale re-test of this tf checkpoint (inherits q_bm25's
      // shape): WITHOUT it sf10 20.7 s vs 11.7 s with, sf0.1 2.43 vs
      // 2.13 — KEPT at both scales
      val tf = graft.functions.Checkpoints.lazyLocal(
        t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val n = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sd"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val dfq = df.join(broadcast(q.select(col("term")).distinct()), "term")
      val agg = tf.join(broadcast(q), "term")
        .join(broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(n))
        .withColumn("s", expr("CAST(floor(1000000000 * ((CAST(2 * nd - 2 * df + 1 AS DOUBLE) " +
          "/ CAST(2 * df + 1 AS DOUBLE)) * (CAST(22 * tf AS DOUBLE) * CAST(sd AS DOUBLE) " +
          "/ (CAST(10 * sd AS DOUBLE) * CAST(tf AS DOUBLE) + CAST(3 * sd AS DOUBLE) " +
          "+ CAST(9 * dl AS DOUBLE) * CAST(nd AS DOUBLE))))) AS BIGINT)"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_n"))
        .persist() // ranked AND relevance-filtered below
      val rel = agg.join(broadcast(qn), col("query_id") === col("qn_qid"))
        .filter(col("n_terms") === col("qsize"))
        .select(col("query_id").as("r_qid"), col("doc_id").as("r_doc"))
      val nrel = rel.groupBy(col("r_qid")).agg(count(lit(1)).as("n_relevant"))
      val ranked = agg
        .withColumn("rn", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("score_n").desc, col("doc_id").asc)).cast("long"))
        .filter(col("rn") <= 10)
      ranked
        .join(rel, col("query_id") === col("r_qid") && col("doc_id") === col("r_doc"), "left")
        .withColumn("hit", when(col("r_doc").isNotNull, 1L).otherwise(0L))
        .groupBy(col("query_id"))
        .agg(coalesce(sum(when(col("rn") <= 3, col("hit"))), lit(0L)).as("hits3"),
          sum(col("hit")).as("hits10"),
          (coalesce(sum(when(col("rn") <= 3, col("hit"))), lit(0L)).cast("double") / 3)
            .as("p_at_3"),
          coalesce(max(when(col("hit") === 1, lit(1.0).cast("double") / col("rn"))), lit(0.0))
            .as("mrr"))
        .join(nrel, col("query_id") === col("r_qid"), "left")
        .select(col("query_id"),
          coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
          col("hits3"), col("hits10"), col("p_at_3"), col("mrr"))
        .orderBy(col("query_id"))
    },

    // ---- RAG / context-window chunking: split each document into
    // overlapping character chunks (width 120, stride 90 → 30-char
    // overlap so no boundary sentence is lost), the corpus-preparation
    // pass behind retrieval indexing and fixed-window training examples.
    // Chunk count is exact int arithmetic (ceil-div of the tail), the
    // chunk itself one substring — a pure narrow generator (sequence +
    // explode), ZERO shuffles before the presentation sort;
    // embarrassingly parallel at 100 TB, output rows ≈ corpus_chars/90.
    entry("q_chunking",
      """WITH d AS (SELECT doc_id, text, length(text) n FROM documents),
        | c AS (SELECT doc_id, text, n,
        |    unnest(generate_series(0, (greatest(n - 120, 0) + 89) // 90)) i FROM d)
        |SELECT doc_id, CAST(i AS BIGINT) chunk_id, i * 90 + 1 AS chunk_start,
        |  substr(text, i * 90 + 1, 120) AS chunk,
        |  length(substr(text, i * 90 + 1, 120)) AS chunk_len,
        |  i = (greatest(n - 120, 0) + 89) // 90 AS is_last
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), length(col("text")).as("n"))
        .select(col("doc_id"), col("text"), col("n"),
          explode(expr("sequence(0, (greatest(n - 120, 0) + 89) DIV 90)")).as("i"))
        .select(col("doc_id"), col("i").cast("long").as("chunk_id"),
          (col("i") * 90 + 1).as("chunk_start"),
          expr("substring(text, i * 90 + 1, 120)").as("chunk"),
          length(expr("substring(text, i * 90 + 1, 120)")).as("chunk_len"),
          (col("i") === expr("(greatest(n - 120, 0) + 89) DIV 90")).as("is_last"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ---- Character-histogram quality stats: per-document alphabet
    // diversity via GINI IMPURITY (1 − Σpᵢ²) over the 28-bucket char
    // histogram (a–z, space, other) plus distinct-bucket count and the
    // top-bucket ratio — the keyboard-mash / repeated-char spam signal
    // (entropy's rational twin: −Σp·ln p needs ln, which differs in the
    // last ulp across engines; collision impurity is the same filter
    // axis as exact ints + ONE double division). The histogram comes
    // from 28 length(replace(...)) count expressions — no explode, no
    // shuffle, one codegen'd narrow map over the scan; embarrassingly
    // parallel at 100 TB.
    entry("q_char_stats", {
      import CharStats._
      val defs = buckets.zip(cols).map { case (ch, nm) =>
        s"(length(text) - length(replace(text, '$ch', ''))) $nm" }.mkString(", ")
      s"""WITH h AS (SELECT doc_id, length(text) n, $defs FROM documents),
        | h2 AS (SELECT *, n - ($sumAll) oth FROM h)
        |SELECT doc_id, n AS n_chars,
        |  CAST($nz AS BIGINT) AS n_buckets,
        |  1 - CAST($ssq AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini,
        |  CAST($mx AS DOUBLE) / n AS top_ratio
        |FROM h2 ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import CharStats._
      // counts and n widened to int64 on the Spark side (DuckDB's length()
      // is already BIGINT): c*c on a 50k-char document overflows int32
      val defs = buckets.zip(cols).map { case (ch, nm) =>
        s"CAST(length(text) - length(replace(text, '$ch', '')) AS BIGINT) AS $nm" }
      Tables(s, dir, "documents")
        .selectExpr(Seq("doc_id", "CAST(length(text) AS BIGINT) AS n") ++ defs: _*)
        .withColumn("oth", expr(s"n - ($sumAll)"))
        .selectExpr("doc_id", "n AS n_chars",
          s"CAST($nz AS BIGINT) AS n_buckets",
          s"1 - CAST($ssq AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini",
          s"CAST($mx AS DOUBLE) / n AS top_ratio")
        .orderBy(col("doc_id"))
    },

    // ---- Deterministic epoch shuffle + shard packing: the training-
    // order pass — each epoch is an independent pseudo-random permutation
    // of the corpus, realized WITHOUT RNG state as hash-ordering (the
    // q_mixture_resample determinism contract: identical order on any
    // re-run / engine / partitioning). Shard = hash mod 8, position =
    // rank of the hash within the shard; at 100 TB the shard count is
    // set so one window partition IS one output shard file (the window
    // never sees more than a shard's worth of rows), and the hash is the
    // shuffle key — no global sort ever materializes the full epoch.
    entry("q_epoch_shuffle",
      s"""WITH ep AS (SELECT unnest([0, 1]) epoch),
        | a AS (SELECT d.doc_id, ep.epoch,
        |    CAST(${md5Prefix64Oracle("concat('ep', CAST(epoch AS VARCHAR), ':', CAST(doc_id AS VARCHAR))")} AS BIGINT) h
        |  FROM documents d CROSS JOIN ep)
        |SELECT epoch, h % 8 AS shard,
        |  ROW_NUMBER() OVER (PARTITION BY epoch, h % 8 ORDER BY h, doc_id) pos,
        |  doc_id, h
        |FROM a ORDER BY epoch, shard, pos""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(expr("array(0, 1)")).as("epoch"))
        .withColumn("h", md5Prefix64("concat('ep', CAST(epoch AS STRING), ':', CAST(doc_id AS STRING))"))
        .withColumn("shard", col("h") % 8)
        .withColumn("pos", row_number().over(Window
          .partitionBy(col("epoch"), col("shard"))
          .orderBy(col("h").asc, col("doc_id").asc)).cast("long"))
        .select(col("epoch"), col("shard"), col("pos"), col("doc_id"), col("h"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    },

    // ---- Feature-hashing (hashing-trick) collision audit: map each
    // document's distinct terms into a 256-bucket hashed feature space
    // and measure the collision load — the dimensioning study run before
    // committing a hashed vectorizer (too-small D silently merges
    // features; this query IS the "is D big enough" answer). Hash =
    // the engine-portable 60-bit md5 prefix mod D. Scale shape: one
    // explode + one (doc, term) distinct shuffle + one doc-keyed
    // aggregate, all map-side combined; no vocabulary frame, no join —
    // the hashing trick's whole point is vocabulary-free feature
    // engineering, and the audit inherits that.
    entry("q_feature_hashing",
      s"""WITH t0 AS (SELECT doc_id, unnest(string_split(text,' ')) term FROM documents),
        | t AS (SELECT DISTINCT doc_id, term FROM t0),
        | h AS (SELECT doc_id, term,
        |    CAST(${md5Prefix64Oracle("term")} AS BIGINT) % 256 b FROM t),
        | a AS (SELECT doc_id, COUNT(*) n_terms, COUNT(DISTINCT b) n_buckets FROM h GROUP BY 1)
        |SELECT doc_id, n_terms, n_buckets, n_terms - n_buckets AS n_collisions,
        |  CAST(n_terms - n_buckets AS DOUBLE) / n_terms AS collision_rate
        |FROM a ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(tokens("text")).as("term"))
        .distinct()
        .withColumn("b", md5Prefix64("term") % 256)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), countDistinct(col("b")).as("n_buckets"))
        .select(col("doc_id"), col("n_terms"), col("n_buckets"),
          (col("n_terms") - col("n_buckets")).as("n_collisions"),
          ((col("n_terms") - col("n_buckets")).cast("double") / col("n_terms"))
            .as("collision_rate"))
        .orderBy(col("doc_id"))
    },

    // ---- Deterministic weighted sampling without replacement (the
    // rational Efraimidis–Spirakis variant): 20 documents drawn with
    // probability increasing in token count, via priority = hash/weight
    // ascending — the canonical u^(1/w) key needs ln/pow, so the
    // surrogate keeps the monotone-in-(hash, weight) selection while
    // staying ONE double division of exact ints (the q_tfidf argument);
    // like every sampler here it is RNG-free — identical sample on any
    // re-run, engine, or partitioning. Scale shape: narrow map +
    // TakeOrderedAndProject (per-partition heads, never a global sort);
    // the rank window runs over the 20 survivors only.
    entry("q_weighted_sample",
      s"""WITH d AS (SELECT doc_id, len(string_split(text,' ')) n_tok,
        |    CAST(${md5Prefix64Oracle("CAST(doc_id AS VARCHAR)")} AS BIGINT) h FROM documents),
        | p AS (SELECT doc_id, n_tok, CAST(h AS DOUBLE)/n_tok pri FROM d),
        | r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pri, doc_id) rn FROM p)
        |SELECT CAST(rn AS BIGINT) rn, doc_id, n_tok, pri
        |FROM r WHERE rn <= 20 ORDER BY rn""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), size(tokens("text")).cast("long").as("n_tok"),
          md5Prefix64("CAST(doc_id AS STRING)").as("h"))
        .select(col("doc_id"), col("n_tok"),
          (col("h").cast("double") / col("n_tok")).as("pri"))
      topKRanked(d, 20, "rn", col("pri").asc, col("doc_id").asc)
        .select(col("rn").cast("long").as("rn"), col("doc_id"), col("n_tok"), col("pri"))
        .orderBy(col("rn"))
    },

    // ---- Empirical-CDF quantile normalization: map each document's
    // length onto its within-language percentile (percent_rank over a
    // STRICT total order, so ties resolve deterministically and the
    // score is the exact (rank−1)/(n−1) integer division in both
    // engines) — the threshold-free feature normalization that makes
    // quality cutoffs comparable across languages ("drop the bottom
    // decile per lang" instead of one absolute length bar). Scale
    // shape: ONE window shuffle keyed on lang; at corpus scale a
    // dominant language exceeds one partition and production swaps in
    // the value-bucketed rank machinery of `functions.Ranking` (the
    // q_curriculum treatment) — the contract stays this exact window.
    entry("q_quantile_normalize",
      """WITH t AS (SELECT doc_id, lang, length(text) n_chars FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) pct
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), length(col("text")).as("n_chars"))
        .withColumn("pct", percent_rank().over(Window.partitionBy(col("lang"))
          .orderBy(col("n_chars").asc, col("doc_id").asc)))
        .orderBy(col("doc_id"))
    },

    // ---- HLL sketch union (Apache DataSketches, Spark-native): per-
    // source approx-distinct token counts via `hll_sketch_agg`, plus a
    // corpus-wide `__ALL__` row whose sketch is the `hll_union_agg`
    // MERGE of the per-source sketches — the second mergeable-sketch
    // demonstration beside q_minhash_union (HLL buckets merge by MAX:
    // associative/commutative/idempotent, so the union is partitioning-
    // free and EXACTLY equals the sketch built over the whole corpus in
    // one pass — the invariant spec asserts that equality, not just a
    // tolerance). Rows-only gate: DuckDB's approx_count_distinct is a
    // different estimator family, so there is no SQL oracle; the spec
    // pins per-source estimates within HLL's published error envelope
    // of the exact distinct counts. Scale shape: sketches reduce map-
    // side to lgK=12 registers (~2.5 KB each) per source — the
    // vocabulary never shuffles.
    entryNoOracle("q_hll_tokens") { (s, dir) =>
      val t = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("source"), explode(tokens("text")).as("term"))
      val per = t.groupBy(col("source")).agg(expr("hll_sketch_agg(term, 12)").as("sk"))
      val perOut = per.select(col("source"),
        expr("hll_sketch_estimate(sk)").as("est_distinct"))
      val union = per.agg(expr("hll_union_agg(sk, true)").as("usk"))
        .select(lit("__ALL__").as("source"),
          expr("hll_sketch_estimate(usk)").as("est_distinct"))
      perOut.unionByName(union).orderBy(col("source"))
    },

    // ---- Pareto skyline (dominance-based selection): per language, the
    // documents NOT dominated in (token count, vocabulary richness) —
    // "q dominates p" iff q is ≥ on both axes and > on at least one —
    // the multi-objective keep-set behind data selection when no single
    // quality scalar exists (identical points never dominate each
    // other, so exact ties all survive). The naive test is O(n²); the
    // 2-D skyline reduces to: p survives iff its richness equals its
    // length-group maximum AND strictly exceeds the running maximum over
    // all STRICTLY LONGER groups. Scale shape: docs reduce map-side to
    // distinct (lang, length) groups before the running-max window (the
    // q_ks_drift distinct-value-space trick — the window never sees the
    // corpus), and one (lang, length)-keyed join back gates the docs.
    entry("q_skyline",
      """WITH d AS (SELECT doc_id, lang, len(string_split(text,' ')) a,
        |            len(list_distinct(string_split(text,' '))) b FROM documents),
        | g AS (SELECT lang, a, MAX(b) mb FROM d GROUP BY 1, 2),
        | s AS (SELECT lang, a, mb, MAX(mb) OVER (PARTITION BY lang ORDER BY a DESC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) mstrict FROM g),
        | k AS (SELECT lang, a, mb FROM s WHERE mstrict IS NULL OR mb > mstrict)
        |SELECT d.lang AS lang, d.doc_id, d.a AS n_tok, d.b AS n_distinct
        |FROM d JOIN k ON d.lang = k.lang AND d.a = k.a AND d.b = k.mb
        |ORDER BY d.lang, n_tok DESC, doc_id""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .withColumn("toks", tokens("text"))
        .select(col("doc_id"), col("lang"),
          size(col("toks")).cast("long").as("a"),
          size(array_distinct(col("toks"))).cast("long").as("b"))
      val g = d.groupBy(col("lang"), col("a")).agg(max(col("b")).as("mb"))
      val w = Window.partitionBy(col("lang")).orderBy(col("a").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val k = g.withColumn("mstrict", max(col("mb")).over(w))
        .filter(col("mstrict").isNull || col("mb") > col("mstrict"))
        .select(col("lang").as("k_lang"), col("a").as("k_a"), col("mb"))
      d.join(k, col("lang") === col("k_lang") && col("a") === col("k_a")
          && col("b") === col("mb"))
        .select(col("lang"), col("doc_id"), col("a").as("n_tok"), col("b").as("n_distinct"))
        .orderBy(col("lang"), col("n_tok").desc, col("doc_id"))
    },

    // ---- TOKENIZER FERTILITY: per-language tokens-per-word and
    // chars-per-token over the BPE-ish pre-tokenizer (the q_token_count
    // regex family) — the multilingual balance dial: languages whose
    // fertility is high are over-charged tokens per unit of content, so
    // mixture weights built on raw token counts silently under-sample
    // them (the XLM-R/NLLB sampling correction). Scale shape: one
    // documents scan with per-doc integer counts, then a map-side-
    // combined aggregate on the (bounded) language key — no joins, no
    // windows. Exactness: integer sums with one final double division
    // per ratio (double/double, both engines divide the same exact
    // integers).
    entry("q_tokenizer_fertility",
      """WITH t AS (SELECT lang, length(text) n_chars,
        |   len(regexp_split_to_array(text,'\s+')) n_ws,
        |   len(regexp_extract_all(text,'[a-z]+|[0-9]+|[^a-z0-9\s]')) n_bpe FROM documents)
        |SELECT lang, CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_bpe) AS DOUBLE)/CAST(SUM(n_ws) AS DOUBLE) AS fertility,
        |  CAST(SUM(n_chars) AS DOUBLE)/CAST(SUM(n_bpe) AS DOUBLE) AS chars_per_token
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id"))) // single-file scan → spread the regex pass
        .select(col("lang"), length(col("text")).cast("long").as("c"),
          size(wsTokens("text")).cast("long").as("w"),
          size(regexTokens("text")).cast("long").as("b"))
        .groupBy(col("lang"))
        .agg(sum(col("w")).as("ws_tokens"), sum(col("b")).as("bpe_tokens"),
          sum(col("c")).as("n_chars"),
          (sum(col("b")).cast("double") / sum(col("w")).cast("double")).as("fertility"),
          (sum(col("c")).cast("double") / sum(col("b")).cast("double")).as("chars_per_token"))
        .orderBy(col("lang"))
    },

    // ---- HAPAX-LEGOMENA rate: per document, the share of its tokens
    // that occur exactly once in the WHOLE corpus — the cheap garbage /
    // typo / random-string detector (OCR noise and boilerplate IDs are
    // hapax-dense; clean prose is not), the corpus-frequency complement
    // of q_oov_rate's fixed-vocabulary view. Scale shape: the exploded
    // (doc, token) frame is token-hash-partitioned once and reused for
    // all three aggregates; corpus term counts map-side combine down to
    // VOCABULARY size (Heaps' law — sublinear in corpus bytes), and the
    // hapax subset joins back token-keyed, AQE-sized (broadcast here;
    // shuffled equi-join at 100 TB where the hapax tail is itself huge).
    // No corpus-wide window anywhere. Exactness: pure integer counts,
    // one final double division.
    entry("q_hapax",
      """WITH x AS (SELECT doc_id, unnest(regexp_extract_all(text,'[a-z]+|[0-9]+|[^a-z0-9\s]')) tok FROM documents),
        | tc AS (SELECT tok, COUNT(*) n FROM x GROUP BY tok),
        | per AS (SELECT doc_id, COUNT(*) n_tokens, COUNT(DISTINCT tok) n_types FROM x GROUP BY doc_id),
        | ph AS (SELECT x.doc_id, COUNT(*) n_hapax FROM x JOIN tc ON x.tok = tc.tok AND tc.n = 1 GROUP BY x.doc_id)
        |SELECT per.doc_id, per.n_tokens, per.n_types,
        |  COALESCE(ph.n_hapax, 0) AS n_hapax,
        |  CAST(COALESCE(ph.n_hapax, 0) AS DOUBLE)/per.n_tokens AS hapax_ratio
        |FROM per LEFT JOIN ph ON per.doc_id = ph.doc_id ORDER BY per.doc_id""".stripMargin) { (s, dir) =>
      val x = Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(regexTokens("text")).as("tok"))
        .persist() // reused by all three aggregates below; Bench clears per-query
      val hapax = x.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .filter(col("n") === 1).select(col("tok"))
      val per = x.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_types"))
      val ph = x.join(hapax, Seq("tok"))
        .groupBy(col("doc_id").as("h_doc")).agg(count(lit(1)).as("n_hapax"))
      per.join(ph, col("doc_id") === col("h_doc"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
          (coalesce(col("n_hapax"), lit(0L)).cast("double") / col("n_tokens")).as("hapax_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- TOKEN BURSTINESS (Fano factor): for the 20 highest-count
    // tokens, the variance-to-mean ratio of per-document counts WITH the
    // zero documents counted — Fano ≈ 1 is Poisson scatter (function
    // words), Fano ≫ 1 is bursty topical clumping; a "stopword" with
    // high Fano is a template artifact, a content word with Fano ≈ 1 is
    // boilerplate smeared everywhere — the distributional complement of
    // plain frequency. Exactness: Fano = (D·Σn² − (Σn)²) / (D·Σn) with
    // every term an exact int64 (zeros enter only through D, never
    // materialized) and ONE final double division. Shape: one explode →
    // (tok, doc) map-side-combined counts → one vocab-sized aggregate;
    // the top-20 window runs over distinct-token rows (WindowGroupLimit
    // prunes map-side) — nothing corpus-wide.
    entry("q_burstiness",
      """WITH nd AS (SELECT COUNT(*) d FROM documents),
        | t AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
        | dt AS (SELECT tok, doc_id, COUNT(*) n FROM t GROUP BY 1,2),
        | a AS (SELECT tok, CAST(SUM(n) AS BIGINT) s, CAST(SUM(n*n) AS BIGINT) ssq,
        |         COUNT(*) df FROM dt GROUP BY tok),
        | r AS (SELECT tok, s, ssq, df, ROW_NUMBER() OVER (ORDER BY s DESC, tok) rn FROM a)
        |SELECT CAST(rn AS BIGINT) AS rank, tok, s AS n_total, df,
        |  CAST(CAST((SELECT d FROM nd) AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s AS DOUBLE)
        |    / CAST(CAST((SELECT d FROM nd) AS HUGEINT) * s AS DOUBLE) AS fano
        |FROM r WHERE rn <= 20 ORDER BY rank""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val nd = docs.agg(count(lit(1)).as("d"))
      val a = docs
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(tokens("text")).as("tok"))
        .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("n"))
        .groupBy(col("tok"))
        .agg(sum(col("n")).as("s"), sum(col("n") * col("n")).as("ssq"),
          count(lit(1)).as("df"))
      a.withColumn("rn", row_number().over(Window.orderBy(col("s").desc, col("tok").asc)))
        .filter(col("rn") <= 20)
        .crossJoin(broadcast(nd))
        .select(col("rn").cast("long").as("rank"), col("tok"),
          col("s").as("n_total"), col("df"),
          // decimal(38,0)/HUGEINT products: s > 3e9 (any multi-billion-
          // token corpus) overflows s*s in raw int64
          ((col("d").cast("decimal(19,0)") * col("ssq").cast("decimal(19,0)")
              - col("s").cast("decimal(19,0)") * col("s").cast("decimal(19,0)")).cast("double")
            / (col("d").cast("decimal(19,0)") * col("s").cast("decimal(19,0)")).cast("double"))
            .as("fano"))
        .orderBy(col("rank"))
    },

    // ---- VOCABULARY GROWTH (Heaps'-law audit): distinct token types
    // seen after the first m documents, at 10 doc-count milestones — the
    // curve that says whether a tokenizer's vocabulary budget will
    // saturate or keep growing (sublinear = healthy prose; near-linear =
    // an ID/noise-ridden corpus). The exact cumulative-distinct trick:
    // each type contributes at its FIRST document (one vocab-sized
    // min-aggregate), first-occurrences bucket into milestones (one
    // map-side-combined count), and the cumulative sum runs over the 10
    // milestone rows — never a corpus-wide running-distinct state. The
    // corpus is scanned once.
    entry("q_vocab_growth",
      """WITH nd AS (SELECT COUNT(*) n FROM documents),
        | t AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
        | fo AS (SELECT tok, MIN(doc_id) first_doc FROM t GROUP BY tok),
        | b AS (SELECT GREATEST(LEAST(CAST(CEIL(CAST(first_doc * 10 AS DOUBLE) / (SELECT n FROM nd)) AS BIGINT), 10), 1) m
        |       FROM fo),
        | g AS (SELECT m, COUNT(*) new_types FROM b GROUP BY m)
        | SELECT ms.m AS milestone, (SELECT n FROM nd) * ms.m // 10 AS docs_through,
        |  CAST(COALESCE(g.new_types, 0) AS BIGINT) AS new_types,
        |  CAST(SUM(COALESCE(g.new_types, 0)) OVER (ORDER BY ms.m) AS BIGINT) AS vocab_size
        |FROM (SELECT unnest(generate_series(1, 10)) m) ms
        |LEFT JOIN g ON g.m = ms.m ORDER BY milestone""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val nd = docs.agg(count(lit(1)).as("n"))
      val fo = docs
        .transform(Tables.spread(_, col("doc_id")))
        .select(col("doc_id"), explode(tokens("text")).as("tok"))
        .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      val g = fo.crossJoin(broadcast(nd))
        .withColumn("m", // clamp into [1,10]: ids outside the dense range land in an end bucket
          greatest(least(ceil(col("first_doc").cast("double") * 10 / col("n")).cast("long"), lit(10L)), lit(1L)))
        .groupBy(col("m")).agg(count(lit(1)).as("new_types"))
      val ms = s.range(1, 11).toDF("milestone")
      ms.crossJoin(broadcast(nd))
        .join(g, col("milestone") === col("m"), "left")
        .select(col("milestone"), col("n"), col("new_types"))
        .withColumn("docs_through", expr("n * milestone DIV 10"))
        .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
        .withColumn("vocab_size",
          sum(col("new_types")).over(Window.orderBy(col("milestone"))))
        .select(col("milestone"), col("docs_through"), col("new_types"), col("vocab_size"))
        .orderBy(col("milestone"))
    },

    // ---- SPAN-CORRUPTION example generation (the T5/UL2 denoising
    // objective): mask a deterministic 2-token span at every 7th token
    // position, emit the INPUT (spans replaced by <X0>, <X1>, …
    // sentinels) and the TARGET (each sentinel followed by the tokens it
    // hides) — the training-example constructor that turns a curated
    // corpus into seq2seq denoising pairs. Determinism: span placement
    // is positional (production salts with the doc hash — q_det_sample's
    // md5 gating composes here), so both engines build byte-identical
    // strings. Scale shape: pure per-row array expressions inside
    // whole-stage codegen — no explode, no shuffle before the
    // presentation sort; embarrassingly parallel at 100 TB.
    entry("q_span_corruption",
      """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
        | m AS (SELECT doc_id, toks, len(toks) n,
        |   array_to_string(list_filter([CASE WHEN (i-1)%7 = 0
        |       THEN '<X' || CAST((i-1)//7 AS VARCHAR) || '>'
        |       WHEN (i-1)%7 = 1 THEN NULL ELSE toks[i] END
        |     for i in generate_series(1, len(toks))], x -> x IS NOT NULL), ' ') input_text,
        |   array_to_string(['<X' || CAST(k AS VARCHAR) || '> ' || toks[7*k+1] ||
        |       CASE WHEN 7*k+2 <= len(toks) THEN ' ' || toks[7*k+2] ELSE '' END
        |     for k in generate_series(0, (len(toks)-1)//7)], ' ') target_text,
        |   len(list_filter([i for i in generate_series(1, len(toks))], i -> (i-1)%7 < 2)) n_masked
        |  FROM t)
        |SELECT doc_id, input_text, target_text,
        |  CAST(n_masked AS BIGINT) AS n_masked,
        |  CAST(n_masked AS DOUBLE)/n AS mask_ratio
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .withColumn("toks", tokens("text"))
        .select(col("doc_id"),
          expr("array_join(filter(transform(toks, (t, i) -> CASE WHEN i % 7 = 0 " +
            "THEN concat('<X', CAST(i DIV 7 AS STRING), '>') " +
            "WHEN i % 7 = 1 THEN NULL ELSE t END), x -> x IS NOT NULL), ' ')")
            .as("input_text"),
          expr("array_join(transform(sequence(0, CAST((size(toks)-1) DIV 7 AS INT)), " +
            "k -> concat('<X', CAST(k AS STRING), '> ', toks[7*k], " +
            "CASE WHEN 7*k+1 < size(toks) THEN concat(' ', toks[7*k+1]) ELSE '' END)), ' ')")
            .as("target_text"),
          expr("CAST(size(filter(transform(toks, (t, i) -> i % 7), r -> r < 2)) AS BIGINT)")
            .as("n_masked"),
          expr("CAST(size(filter(transform(toks, (t, i) -> i % 7), r -> r < 2)) AS DOUBLE) " +
            "/ size(toks)").as("mask_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- DATASET CARD: the one-page corpus summary every released
    // training set ships with (docs, tokens, chars, language/source
    // breadth, exact-dup ratio, length envelope) as a (metric, value)
    // report — ONE full scan computing every statistic in a single
    // aggregate (the COUNT(DISTINCT md5) rides the same pass), then a
    // codegen'd stack() unpivot of the 1-row frame. All values are exact
    // integers presented as doubles (< 2^53, lossless) with the two
    // ratios divided once — bit-identical in both engines. At 100 TB:
    // one corpus pass, partial aggregation everywhere, the distinct-hash
    // count shuffles 16-byte digests (use the HLL twin q_hll_tokens for
    // the estimate-only variant).
    entry("q_dataset_card",
      """WITH s AS (SELECT COUNT(*) n_docs,
        |    CAST(SUM(length(text)) AS BIGINT) n_chars,
        |    CAST(SUM(len(regexp_split_to_array(text,'\s+'))) AS BIGINT) n_tokens,
        |    COUNT(DISTINCT lang) n_langs, COUNT(DISTINCT source) n_sources,
        |    COUNT(DISTINCT md5(text)) n_unique,
        |    MIN(length(text)) min_chars, MAX(length(text)) max_chars
        |  FROM documents)
        |SELECT metric, "value" FROM (
        |  SELECT 'n_docs' metric, CAST(n_docs AS DOUBLE) AS "value" FROM s
        |  UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM s
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS DOUBLE) FROM s
        |  UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM s
        |  UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM s
        |  UNION ALL SELECT 'dup_ratio', CAST(n_docs - n_unique AS DOUBLE) / NULLIF(n_docs, 0) FROM s
        |  UNION ALL SELECT 'mean_chars_per_doc', CAST(n_chars AS DOUBLE) / NULLIF(n_docs, 0) FROM s
        |  UNION ALL SELECT 'mean_tokens_per_doc', CAST(n_tokens AS DOUBLE) / NULLIF(n_docs, 0) FROM s
        |  UNION ALL SELECT 'min_chars', CAST(min_chars AS DOUBLE) FROM s
        |  UNION ALL SELECT 'max_chars', CAST(max_chars AS DOUBLE) FROM s
        |) ORDER BY metric""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .transform(Tables.spread(_, col("doc_id")))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(size(wsTokens("text")).cast("long")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(md5(col("text"))).as("n_unique"),
          min(length(col("text"))).as("min_chars"),
          max(length(col("text"))).as("max_chars"))
        .selectExpr("stack(10, " +
          "'n_docs', CAST(n_docs AS DOUBLE), " +
          "'n_tokens', CAST(n_tokens AS DOUBLE), " +
          "'n_chars', CAST(n_chars AS DOUBLE), " +
          "'n_langs', CAST(n_langs AS DOUBLE), " +
          "'n_sources', CAST(n_sources AS DOUBLE), " +
          "'dup_ratio', CAST(n_docs - n_unique AS DOUBLE) / NULLIF(n_docs, 0), " +
          "'mean_chars_per_doc', CAST(n_chars AS DOUBLE) / NULLIF(n_docs, 0), " +
          "'mean_tokens_per_doc', CAST(n_tokens AS DOUBLE) / NULLIF(n_docs, 0), " +
          "'min_chars', CAST(min_chars AS DOUBLE), " +
          "'max_chars', CAST(max_chars AS DOUBLE)) AS (metric, value)")
        .orderBy(col("metric"))
    },

    // ---- PER-SOURCE DISTRIBUTIONAL DRIFT in floor-log2 bits: for each
    // source, Σ count_s(t)·(sur_corpus(t) − sur_source(t)) / total_s —
    // the KL(source‖corpus) shape in the repo's integer-surprisal units
    // (sur = ⌊log2(total/count)⌋, the q_unigram_surprisal idiom — exact
    // in both engines where a double log2 would be order- and
    // libm-dependent). Positive mean = the tokens this source favors are
    // rare corpus-wide — the mixture-QA dial that says WHICH feed is
    // pulling the token distribution (DSIR's corpus-level complement).
    // Scale shape: (source, token) counts map-side combine to
    // |sources|×vocabulary; the corpus frequency frame is vocabulary-
    // sized and joins on the token key (AQE: broadcast here, shuffled
    // equi-join at web scale); the source-total frame is |sources| rows,
    // broadcast-joined. No windows, no self-joins.
    entry("q_source_kl",
      """WITH t AS (SELECT source, unnest(string_split(text,' ')) tok FROM documents),
        | sc AS (SELECT source, tok, COUNT(*) n FROM t GROUP BY 1,2),
        | st AS (SELECT source, CAST(SUM(n) AS BIGINT) ts FROM sc GROUP BY 1),
        | c AS (SELECT tok, CAST(SUM(n) AS BIGINT) cnt FROM sc GROUP BY 1),
        | tot AS (SELECT CAST(SUM(cnt) AS BIGINT) tn FROM c),
        | s AS (SELECT sc.source, sc.n,
        |         CAST(length(bin((SELECT tn FROM tot) // c.cnt)) - 1 AS BIGINT) sur_corp,
        |         CAST(length(bin(st.ts // sc.n)) - 1 AS BIGINT) sur_src
        |       FROM sc JOIN c USING (tok) JOIN st USING (source))
        |SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS vocab,
        |  CAST(SUM(n * (sur_corp - sur_src)) AS BIGINT) AS kl_bits,
        |  CAST(SUM(n * (sur_corp - sur_src)) AS DOUBLE) / SUM(n) AS mean_kl_bits
        |FROM s GROUP BY 1 ORDER BY source""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir, "documents")
        .select(col("source"), explode(tokens("text")).as("tok"))
      val sc = t.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n")).persist()
      val st = sc.groupBy(col("source")).agg(sum(col("n")).as("ts"))
      val c = sc.groupBy(col("tok")).agg(sum(col("n")).as("cnt"))
      val tot = c.agg(sum(col("cnt")).as("tn"))
      sc.join(c, "tok").join(broadcast(st), "source").crossJoin(broadcast(tot))
        .withColumn("sur_corp", expr("CAST(length(bin(tn DIV cnt)) - 1 AS BIGINT)"))
        .withColumn("sur_src", expr("CAST(length(bin(ts DIV n)) - 1 AS BIGINT)"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(col("n") * (col("sur_corp") - col("sur_src"))).as("kl_bits"),
          (sum(col("n") * (col("sur_corp") - col("sur_src"))).cast("double")
            / sum(col("n"))).as("mean_kl_bits"))
        .orderBy(col("source"))
    },

    // ---- LANGUAGE-LABEL CONFUSION rollup: the marker-vote predictor of
    // q_lang_id aggregated into a (labeled, predicted) matrix with
    // per-label mismatch rates — the label-QA report that catches a feed
    // shipping mislabeled languages BEFORE mixture weights trust the
    // labels. One scan, per-doc codegen'd vote counts, one map-side-
    // combined aggregate on the bounded (lang, pred) key space.
    entry("q_lang_confusion",
      """WITH t AS (SELECT doc_id, lang, regexp_split_to_array(text,'\s+') toks FROM documents),
        | c AS (SELECT doc_id, lang,
        |   len(list_filter(toks, x -> x IN ('the','of','and','is','to'))) c_en,
        |   len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) c_de,
        |   len(list_filter(toks, x -> x IN ('el','la','los','es','y'))) c_es,
        |   len(list_filter(toks, x -> x IN ('le','la','les','est','et'))) c_fr
        |  FROM t),
        | p AS (SELECT lang,
        |   CASE WHEN c_en = 0 AND c_de = 0 AND c_es = 0 AND c_fr = 0 THEN 'und'
        |        WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
        |        WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
        |        WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END pred_lang
        |  FROM c),
        | g AS (SELECT lang, pred_lang, COUNT(*) n FROM p GROUP BY 1,2),
        | lt AS (SELECT lang, CAST(SUM(n) AS BIGINT) lang_total FROM g GROUP BY 1)
        |SELECT g.lang, g.pred_lang, g.n, lt.lang_total,
        |  CAST(g.n AS DOUBLE)/lt.lang_total AS share,
        |  g.lang <> g.pred_lang AS mismatch
        |FROM g JOIN lt USING (lang) ORDER BY g.lang, g.pred_lang""".stripMargin) { (s, dir) =>
      val p = Tables(s, dir, "documents")
        .withColumn("toks", wsTokens("text"))
        .select(col("lang"),
          markerCount("toks", stopEn).as("c_en"),
          markerCount("toks", stopDe).as("c_de"),
          markerCount("toks", stopEs).as("c_es"),
          markerCount("toks", stopFr).as("c_fr"))
        .withColumn("pred_lang",
          when(col("c_en") === 0 && col("c_de") === 0 && col("c_es") === 0 && col("c_fr") === 0, "und")
            .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es") && col("c_en") >= col("c_fr"), "en")
            .when(col("c_de") >= col("c_es") && col("c_de") >= col("c_fr"), "de")
            .when(col("c_es") >= col("c_fr"), "es")
            .otherwise("fr"))
      val g = p.groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      val lt = g.groupBy(col("lang").as("lt_lang")).agg(sum(col("n")).as("lang_total"))
      g.join(broadcast(lt), col("lang") === col("lt_lang"))
        .select(col("lang"), col("pred_lang"), col("n"), col("lang_total"),
          (col("n").cast("double") / col("lang_total")).as("share"),
          (col("lang") =!= col("pred_lang")).as("mismatch"))
        .orderBy(col("lang"), col("pred_lang"))
    },

    // ---- Tokenizer byte economy: UTF-8 bytes per token by language —
    // the compression-fertility audit (how many bytes each emitted token
    // "pays for") that complements q_tokenizer_fertility's tokens-per-
    // word view; multilingual tokenizer reports quote exactly this
    // bytes/token curve per language because a vocabulary tuned on one
    // script inflates another's byte cost. Exact int64 byte and token
    // totals (octet_length, not char length — the tokenizer sees bytes),
    // ONE double division per language at the end. Scale shape: the
    // corpus reduces map-side to one row per language; nothing else
    // shuffles.
    entry("q_bytes_per_token",
      """WITH d AS (SELECT lang, octet_length(encode(text)) b,
        |             len(string_split(text,' ')) t FROM documents)
        |SELECT lang, COUNT(*) n_docs,
        |  CAST(SUM(b) AS BIGINT) total_bytes, CAST(SUM(t) AS BIGINT) total_tokens,
        |  CAST(CAST(SUM(b) AS BIGINT) AS DOUBLE)/CAST(SUM(t) AS BIGINT) AS bytes_per_token
        |FROM d GROUP BY 1 ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("lang"), octet_length(col("text")).cast("long").as("b"),
          size(tokens("text")).cast("long").as("t"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("b")).as("total_bytes"), sum(col("t")).as("total_tokens"),
          (sum(col("b")).cast("double") / sum(col("t"))).as("bytes_per_token"))
        .orderBy(col("lang"))
    },

    // ---- Judge agreement (Cohen's kappa): chance-corrected agreement
    // between two independent binary quality judges — here two
    // deterministic heuristics (chars ≥ 200, tokens ≥ 40), in production
    // two model-as-judge labelers or a model vs a human rater — THE
    // gate a labeling pipeline runs before trusting either signal
    // (raw agreement po alone is inflated whenever both judges mostly
    // say "keep"). Everything is one exact int64 confusion matrix; the
    // marginal products widen to decimal(38,0)/HUGEINT because row·col
    // products pass int64 right at the 10-billion-doc scale this gate
    // targets; po/pe/kappa are three double expressions computed
    // IDENTICALLY on both engines from identical integers. NULLIF
    // guards the degenerate pe=1 corpus (both judges constant). Scale
    // shape: ONE map-side-combined global aggregate; nothing shuffles
    // but 5 counters per partition.
    entry("q_judge_agreement",
      """WITH j AS (SELECT (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) a,
        |    (CASE WHEN len(string_split(text,' ')) >= 40 THEN 1 ELSE 0 END) b
        |  FROM documents),
        | c AS (SELECT COUNT(*) n,
        |    COUNT(CASE WHEN a=0 AND b=0 THEN 1 END) n00,
        |    COUNT(CASE WHEN a=0 AND b=1 THEN 1 END) n01,
        |    COUNT(CASE WHEN a=1 AND b=0 THEN 1 END) n10,
        |    COUNT(CASE WHEN a=1 AND b=1 THEN 1 END) n11 FROM j),
        | p AS (SELECT n, n00, n01, n10, n11,
        |    CAST(n00 + n11 AS DOUBLE)/n po,
        |    CAST(CAST(n00+n01 AS HUGEINT)*(n00+n10) + CAST(n10+n11 AS HUGEINT)*(n01+n11) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT)*n AS DOUBLE) pe
        |  FROM c)
        |SELECT n, n00, n01, n10, n11, po, pe,
        |  (po - pe)/NULLIF(1.0 - pe, 0.0) AS kappa
        |FROM p""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      val c = Tables(s, dir, "documents")
        .select(when(col("n_chars") >= 200, 1L).otherwise(0L).as("a"),
          when(size(tokens("text")) >= 40, 1L).otherwise(0L).as("b"))
        .agg(count(lit(1)).as("n"),
          count(when(col("a") === 0 && col("b") === 0, 1)).as("n00"),
          count(when(col("a") === 0 && col("b") === 1, 1)).as("n01"),
          count(when(col("a") === 1 && col("b") === 0, 1)).as("n10"),
          count(when(col("a") === 1 && col("b") === 1, 1)).as("n11"))
      val p = c.select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
        ((col("n00") + col("n11")).cast("double") / col("n")).as("po"),
        (((col("n00") + col("n01")).cast(dec) * (col("n00") + col("n10"))
          + (col("n10") + col("n11")).cast(dec) * (col("n01") + col("n11"))).cast("double")
          / (col("n").cast(dec) * col("n")).cast("double")).as("pe"))
      p.select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
        col("po"), col("pe"),
        ((col("po") - col("pe")) / nullif(lit(1.0) - col("pe"), lit(0.0))).as("kappa"))
    },

    // ---- Token-budget WATERFILL across sources: allocate a training
    // budget (here 90% of the corpus's tokens) so every source gets the
    // same water level L, sources with less than L contribute everything
    // (capped), and the integer remainder goes +1 to the first uncapped
    // sources in (avail, source) order — the max-min fair allocation a
    // mixture designer runs instead of proportional sampling (which lets
    // one giant crawl drown the small curated sources). EXACT integer
    // end to end: per-k candidate levels L_k = (target − prefix_k) DIV
    // (n − k), the unique k validated by avail_k ≤ L_k < avail_{k+1},
    // and Σ allocated == target by construction (the oracle proves it
    // row by row). Target < total by construction (90%), so a valid k
    // always exists. Scale shape: the corpus reduces map-side to one
    // row per source; every window after that runs on the bounded
    // source frame; the 1-row totals broadcast.
    entry("q_token_waterfill",
      """WITH s AS (SELECT source, CAST(SUM(len(string_split(text,' '))) AS BIGINT) avail
        |           FROM documents GROUP BY 1),
        | t AS (SELECT COUNT(*) n, (CAST(SUM(avail) AS BIGINT) * 9) // 10 tgt FROM s),
        | r AS (SELECT source, avail,
        |         ROW_NUMBER() OVER (ORDER BY avail, source) rn,
        |         CAST(SUM(avail) OVER (ORDER BY avail, source) AS BIGINT) p
        |       FROM s),
        | cand AS (SELECT rn - 1 AS k, COALESCE(LAG(p) OVER (ORDER BY rn), 0) pk,
        |            COALESCE(LAG(avail) OVER (ORDER BY rn), 0) ak, avail nxt
        |          FROM r),
        | lvl AS (SELECT k, pk, ((SELECT tgt FROM t) - pk) // ((SELECT n FROM t) - k) L
        |         FROM cand
        |         WHERE ak <= ((SELECT tgt FROM t) - pk) // ((SELECT n FROM t) - k)
        |           AND ((SELECT tgt FROM t) - pk) // ((SELECT n FROM t) - k) < nxt),
        | fin AS (SELECT r.source, r.avail, r.rn, lvl.L, lvl.k,
        |           (SELECT tgt FROM t) - (lvl.pk + lvl.L * ((SELECT n FROM t) - lvl.k)) rem
        |         FROM r CROSS JOIN lvl)
        |SELECT source, avail AS avail_tokens,
        |  CASE WHEN rn <= k THEN avail
        |       ELSE L + (CASE WHEN rn - k <= rem THEN 1 ELSE 0 END) END AS allocated,
        |  rn <= k AS capped
        |FROM fin ORDER BY source""".stripMargin) { (s, dir) =>
      val src = Tables(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(tokens("text")).cast("long")).as("avail"))
      graft.functions.Waterfill.allocate(src, "source", "avail", 9, 10)
        .orderBy(col("source"))
    },

    // ---- Quality-filter MIXTURE SHIFT: per-source corpus share before
    // vs after a quality gate (tokens ≥ 40 — the q_judge_agreement B
    // judge) — the audit that catches a filter silently rebalancing the
    // source mixture (a length gate deletes short-form sources first,
    // and the trained model's domain balance shifts with it). Exact
    // int64 counts; three double divisions per source at the end; the
    // 1-row totals broadcast. ONE map-side-combined aggregate over the
    // corpus.
    entry("q_filter_shift",
      """WITH d AS (SELECT source, len(string_split(text,' ')) t FROM documents),
        | tot AS (SELECT COUNT(*) nb, COUNT(CASE WHEN t >= 40 THEN 1 END) na FROM d),
        | s AS (SELECT source, COUNT(*) n_before,
        |         COUNT(CASE WHEN t >= 40 THEN 1 END) n_after FROM d GROUP BY 1)
        |SELECT source, n_before, n_after,
        |  CAST(n_before AS DOUBLE)/(SELECT nb FROM tot) share_before,
        |  CAST(n_after AS DOUBLE)/(SELECT na FROM tot) share_after,
        |  CAST(n_after AS DOUBLE)/(SELECT na FROM tot)
        |    - CAST(n_before AS DOUBLE)/(SELECT nb FROM tot) AS shift
        |FROM s ORDER BY source""".stripMargin) { (s, dir) =>
      // ONE corpus scan: reduce to the per-source counts first
      // (checkpointed — the totals and the final select both consume
      // them; registry-released after the query), then fold the totals
      // from the bounded source frame instead of a second corpus pass
      val g = graft.functions.Checkpoints.lazyLocal(
        Tables(s, dir, "documents")
          .select(col("source"), size(tokens("text")).cast("long").as("t"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_before"),
            count(when(col("t") >= 40, 1)).as("n_after")))
      val tot = g.agg(sum(col("n_before")).as("nb"), sum(col("n_after")).as("na"))
      g.crossJoin(broadcast(tot))
        .select(col("source"), col("n_before"), col("n_after"),
          (col("n_before").cast("double") / col("nb")).as("share_before"),
          (col("n_after").cast("double") / col("na")).as("share_after"),
          ((col("n_after").cast("double") / col("na"))
            - (col("n_before").cast("double") / col("nb"))).as("shift"))
        .orderBy(col("source"))
    },

    // ---- Source MIXTURE DRIFT over ingest order: per-source corpus
    // share in each ingest-order eighth, with the share shift against
    // the source's previous eighth and a drift flag — the continuous
    // mixture monitor behind "did the crawler's source balance move
    // under us" (q_filter_shift audits a FILTER's rebalance; this
    // audits TIME's). Exact int counts; shares and shifts are double
    // expressions computed identically on both engines; a source absent
    // from an eighth simply has no row there, so the lag compares
    // against its last PRESENT eighth (documented). Scale shape: the
    // corpus reduces map-side to the (8 × sources) grid; every window
    // after that runs on that bounded frame; the 1-row max broadcasts.
    entry("q_mixture_drift",
      """WITH m AS (SELECT MAX(doc_id)+1 mm FROM documents),
        | d AS (SELECT source, doc_id*8 // (SELECT mm FROM m) e FROM documents),
        | g AS (SELECT e, source, COUNT(*) n FROM d GROUP BY 1,2),
        | t AS (SELECT e, CAST(SUM(n) AS BIGINT) tot FROM g GROUP BY 1),
        | s AS (SELECT g.e, g.source, g.n, CAST(g.n AS DOUBLE)/t.tot AS share
        |       FROM g JOIN t USING (e)),
        | w AS (SELECT e, source, n, share,
        |         LAG(share) OVER (PARTITION BY source ORDER BY e) prev FROM s)
        |SELECT e AS eighth, source, n, share,
        |  share - COALESCE(prev, share) AS shift,
        |  ABS(share - COALESCE(prev, share)) > 0.01 AS drifted
        |FROM w ORDER BY eighth, source""".stripMargin) { (s, dir) =>
      val bySource = Window.partitionBy(col("source")).orderBy(col("e"))
      // checkpoint the (8 × sources) grid: the per-eighth totals and the
      // join back both consume it — without the checkpoint the corpus
      // scan + eighth bucketing runs twice (registry-released after the
      // query)
      val g = graft.functions.Checkpoints.lazyLocal(
        Tables.withIngestEighth(Tables(s, dir, "documents"), "doc_id")
          .select(col("source"), col("eighth").as("e"))
          .groupBy(col("e"), col("source")).agg(count(lit(1)).as("n")))
      val t = g.groupBy(col("e").as("t_e")).agg(sum(col("n")).as("tot"))
      val sh = g.join(t, col("e") === col("t_e"))
        .select(col("e"), col("source"), col("n"),
          (col("n").cast("double") / col("tot")).as("share"))
        .withColumn("prev", lag(col("share"), 1).over(bySource))
      sh.select(col("e").as("eighth"), col("source"), col("n"), col("share"),
          (col("share") - coalesce(col("prev"), col("share"))).as("shift"),
          (abs(col("share") - coalesce(col("prev"), col("share"))) > 0.01).as("drifted"))
        .orderBy(col("eighth"), col("source"))
    },

    // ---- Deflate COMPRESSION-RATIO quality signal
    // ([[graft.functions.Compression]]): bytes-out / bytes-in per
    // document under zlib DEFLATE level 6 — the Gopher-style corpus
    // filter whose BOTH tails are cut (templated/repetitive docs
    // compress abnormally well, near-random noise barely at all). NO
    // DuckDB oracle BY DESIGN: the DEFLATE byte stream is unspecified
    // across zlib builds, so the driver runs the rows-only gate and
    // QueryInvariantSpec pins the semantics (bounds, repetition
    // ordering, raw_bytes == octet_length, determinism), with
    // CompressionGoldenSpec adding a byte-exact committed-fixture gate.
    // A golden-JOIN hash oracle (DuckDB reading compress_golden.tsv and
    // joining doc_id) was evaluated in r16 and is UNSOUND: the driver
    // replays the same oracle SQL at sf0.01/sf0.1/sf1, and doc_id→text
    // is NOT stable across scale factors (verified: sf0.001 doc 0 =
    // "the fast key order…" vs sf0.01 doc 0 = "key agg row scan…"), so
    // a fixture keyed by sf0.001 ids mismatches at every other scale,
    // and keying by text has an empty intersection outside sf0.001 —
    // the join would gate nothing or fail spuriously. Scale shape:
    // one narrow mapPartitions (imperative byte work — the policy
    // exception), one row out per doc, no shuffle before the
    // presentation sort.
    entryNoOracle("q_compress_ratio") { (s, dir) =>
      graft.functions.Compression.deflateStats(
          Tables(s, dir, "documents").transform(Tables.spread(_, col("doc_id"))),
          "doc_id", "text")
        .toDF()
        .orderBy(col("doc_id"))
    },

    // ---- N-gram NOVELTY per document in ingest order: the fraction of
    // a doc's distinct 3-grams whose corpus-wide FIRST occurrence (min
    // doc_id) is that doc — the per-document contribution score behind
    // "is new data still adding anything" curves (the document-level
    // refinement of q_dedup_scaling's corpus curve; a late doc with
    // near-zero novelty is recombination, not new signal). Exact: gram
    // first-occurrence is one min-aggregate; counts are int64; one
    // double division per doc. Scale shape: per-doc distinct shingles
    // explode narrowly, ONE gram-keyed shuffle builds the first-seen
    // table (map-side combined), the join back is gram-keyed (no
    // broadcast of a corpus-sized side), and the final aggregate is
    // doc-keyed.
    entry("q_ngram_novelty",
      """WITH d AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
        | dg AS (SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2],' ')
        |          for i in generate_series(1, greatest(len(toks)-2,1))])) gram FROM d),
        | f AS (SELECT gram, MIN(doc_id) fid FROM dg GROUP BY 1)
        |SELECT dg.doc_id, COUNT(*) n_grams,
        |  COUNT(CASE WHEN f.fid = dg.doc_id THEN 1 END) n_novel,
        |  CAST(COUNT(CASE WHEN f.fid = dg.doc_id THEN 1 END) AS DOUBLE)/COUNT(*) novelty
        |FROM dg JOIN f USING (gram) GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // checkpoint the exploded gram frame: the first-seen aggregate `f`
      // and the join back both consume it — without the checkpoint the
      // corpus shingling runs twice (registry-released after the query)
      val dg = graft.functions.Checkpoints.lazyLocal(
        Tables(s, dir, "documents")
          .transform(Tables.spread(_, col("doc_id")))
          .withColumn("toks", tokens("text"))
          .select(col("doc_id"), explode(shingles("toks", 3)).as("gram")))
      val f = dg.groupBy(col("gram").as("f_gram")).agg(min(col("doc_id")).as("fid"))
      dg.join(f, col("gram") === col("f_gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("fid") === col("doc_id"), 1)).as("n_novel"),
          (count(when(col("fid") === col("doc_id"), 1)).cast("double") / count(lit(1)))
            .as("novelty"))
        .orderBy(col("doc_id"))
    },

    // ---- Two-proportion z-test per source vs the rest of the corpus:
    // does source S pass the length-quality gate (n_chars ≥ 300) at a
    // rate significantly different from everything else? The A/B gate a
    // curation pipeline runs when a new crawl slice lands — |z| > 1.96
    // flags the slice for review before it enters the mixture (the
    // significance companion to q_source_kl's distributional distance).
    // Exactness: all inputs to the z formula are exact int64 counts
    // (per-source n/pass and the corpus totals), and the pooled-variance
    // expression is written as the SAME double tree in both engines —
    // IEEE ops on identical exact inputs, no accumulation-order
    // exposure. Scale shape: one map-side-combined count aggregate to 20
    // source rows, one single-row total frame joined back by broadcast
    // cross — nothing downstream of the scan exceeds |sources| rows.
    entry("q_abtest_z",
      """WITH f AS (SELECT source, COUNT(*) n,
        |    COUNT(CASE WHEN n_chars >= 300 THEN 1 END) pass FROM documents GROUP BY 1),
        | t AS (SELECT CAST(SUM(n) AS BIGINT) tn, CAST(SUM(pass) AS BIGINT) tpass FROM f)
        |SELECT source, n, pass,
        |  CAST(pass AS DOUBLE) / n AS p_src,
        |  CAST(tpass - pass AS DOUBLE) / (tn - n) AS p_rest,
        |  (CAST(pass AS DOUBLE) / n - CAST(tpass - pass AS DOUBLE) / (tn - n)) /
        |    sqrt((CAST(tpass AS DOUBLE) / tn) * (1 - CAST(tpass AS DOUBLE) / tn)
        |      * (1.0 / n + 1.0 / (tn - n))) AS z,
        |  ABS((CAST(pass AS DOUBLE) / n - CAST(tpass - pass AS DOUBLE) / (tn - n)) /
        |    sqrt((CAST(tpass AS DOUBLE) / tn) * (1 - CAST(tpass AS DOUBLE) / tn)
        |      * (1.0 / n + 1.0 / (tn - n)))) > 1.96 AS flagged
        |FROM f, t ORDER BY source""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          count(when(col("n_chars") >= 300, 1)).as("pass"))
      val t = f.agg(sum(col("n")).cast("long").as("tn"),
        sum(col("pass")).cast("long").as("tpass"))
      val pSrc = col("pass").cast("double") / col("n")
      val pRest = (col("tpass") - col("pass")).cast("double") / (col("tn") - col("n"))
      val pPool = col("tpass").cast("double") / col("tn")
      val z = (pSrc - pRest) /
        sqrt(pPool * (lit(1) - pPool) *
          (lit(1.0) / col("n") + lit(1.0) / (col("tn") - col("n"))))
      f.crossJoin(broadcast(t))
        .select(col("source"), col("n"), col("pass"),
          pSrc.as("p_src"), pRest.as("p_rest"), z.as("z"),
          (abs(z) > 1.96).as("flagged"))
        .orderBy(col("source"))
    },

    // ---- Exact ROC AUC (Mann–Whitney rank-sum) per language: how well
    // does a scalar quality score (n_chars) separate documents that
    // mention a target keyword? The classifier-evaluation primitive a
    // curation pipeline runs on every learned quality filter (the
    // measurement side of q_quality_classifier / q_judge_agreement).
    // AUC = U / (n_pos·n_neg) with midrank tie handling, computed WITHOUT
    // ranking rows: group to distinct (lang, score) first, then a prefix
    // window over the per-language distinct scores. Every positive in a
    // tie group of size n starting after `cum` rows has average rank
    // cum + (n+1)/2, so 2·ΣR⁺ = Σ npos·(2·cum + n + 1) — kept in exact
    // integer 2×-units ("u2" = 2U) until ONE final double division, so
    // both engines agree bit-exactly (the q_spearman treatment;
    // sqrt-free). u2 ≈ 2N² per language, so the per-row term and its SUM
    // accumulate in decimal(38,0) (HUGEINT in the oracle): int64 would
    // wrap silently in Spark's non-ANSI sum past ~2.1e9 rows/lang — well
    // inside the 100 TB regime — while 38 digits are good to ~10^18.5
    // rows. Per-tie-group inputs (n, npos, cum) stay int64.
    // Scale shape: the first aggregate collapses the corpus to distinct
    // (lang, score) pairs — bounded by the score's VALUE DOMAIN, not the
    // corpus (map-side partial combine does the heavy lifting); the
    // window and final aggregate run on that tiny frame, re-using its
    // lang hash partitioning. At 100 TB this is scan + one shuffle of
    // |langs|·|distinct scores| rows.
    entry("q_auc",
      """WITH d AS (SELECT lang, n_chars score,
        |    CASE WHEN position('spark' IN text) > 0 THEN 1 ELSE 0 END pos
        |    FROM documents),
        | g AS (SELECT lang, score, CAST(COUNT(*) AS BIGINT) n,
        |        CAST(SUM(pos) AS BIGINT) npos FROM d GROUP BY 1, 2),
        | w AS (SELECT lang, n, npos,
        |    CAST(COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) cum
        |    FROM g),
        | a AS (SELECT lang, CAST(SUM(npos) AS BIGINT) n_pos,
        |        CAST(SUM(n - npos) AS BIGINT) n_neg,
        |        SUM(CAST(npos AS HUGEINT) * (2 * cum + n + 1)) u2 FROM w GROUP BY 1)
        |SELECT lang, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST(u2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
        |      / (2.0 * n_pos * n_neg)
        |  END AS auc
        |FROM a ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(
        col("lang"), col("n_chars").as("score"),
        when(instr(col("text"), "spark") > 0, 1L).otherwise(0L).as("pos"))
      val g = d.groupBy(col("lang"), col("score"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("npos"))
      // score is unique within each (lang) partition of g, so the ROWS
      // frame is deterministic; cum = rows strictly below this tie group
      val cumW = Window.partitionBy(col("lang")).orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val w = g.select(col("lang"), col("n"), col("npos"),
        coalesce(sum(col("n")).over(cumW), lit(0L)).as("cum"))
      // widen BEFORE the multiply: npos·(2·cum+n+1) itself nears int64 at
      // ~3e9 rows/lang, and the non-ANSI int64 SUM would wrap silently
      val a = w.groupBy(col("lang")).agg(
        sum(col("npos")).as("n_pos"),
        sum(col("n") - col("npos")).as("n_neg"),
        sum(col("npos").cast(Exact.Moment) *
          (lit(2L) * col("cum") + col("n") + lit(1L))).as("u2"))
      a.select(col("lang"), col("n_pos"), col("n_neg"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            (col("u2") - col("n_pos").cast(Exact.Moment) * (col("n_pos") + 1))
              .cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
        .orderBy(col("lang"))
    },

    // ---- Calibration / reliability table of a [0,1] quality prediction
    // (clamped length over 600) against the same keyword label: per
    // decile bin, mean predicted probability vs empirical positive rate
    // and their gap — the reliability diagram + per-bin ECE contributions
    // behind "is this filter's confidence trustworthy?". All three
    // aggregates are exact int64 sums (count, positives, Σ clamped); the
    // doubles exist only in the final per-bin expressions, written as the
    // SAME tree in both engines (the q_abtest_z treatment). The bin key
    // uses integer DIV, not float floor, so binning can never straddle a
    // rounding edge. Scale shape: ONE map-side-combined aggregate to ≤ 10
    // rows; nothing downstream of the scan exceeds the bin count.
    entry("q_calibration",
      """WITH d AS (SELECT least(n_chars, 600) clamped,
        |    CASE WHEN position('spark' IN text) > 0 THEN 1 ELSE 0 END pos
        |    FROM documents),
        | b AS (SELECT least(clamped * 10 // 600, 9) bin,
        |        CAST(COUNT(*) AS BIGINT) n, CAST(SUM(pos) AS BIGINT) n_pos,
        |        CAST(SUM(clamped) AS BIGINT) sum_pred FROM d GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  CAST(sum_pred AS DOUBLE) / (600.0 * n) AS mean_pred,
        |  CAST(n_pos AS DOUBLE) / n AS frac_pos,
        |  ABS(CAST(sum_pred AS DOUBLE) / (600.0 * n) - CAST(n_pos AS DOUBLE) / n)
        |    AS gap
        |FROM b ORDER BY bin""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(
        least(col("n_chars"), lit(600L)).as("clamped"),
        when(instr(col("text"), "spark") > 0, 1L).otherwise(0L).as("pos"))
      val b = d.groupBy(least(expr("clamped * 10 DIV 600"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          sum(col("clamped")).as("sum_pred"))
      val meanPred = col("sum_pred").cast("double") / (lit(600.0) * col("n"))
      val fracPos = col("n_pos").cast("double") / col("n")
      b.select(col("bin"), col("n"), col("n_pos"),
          meanPred.as("mean_pred"), fracPos.as("frac_pos"),
          abs(meanPred - fracPos).as("gap"))
        .orderBy(col("bin"))
    }
  )
}
