package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact

/** Beyond-reference breadth: sessionization, pivot, grouping sets, and the
  * scalar-function families (datetime / array / regex / conditional) plus
  * exact covariance/correlation — the surfaces a training-data pipeline
  * leans on daily that the reference never grew.
  *
  * Exactness notes mirror the rest of the suite: timestamps are compared
  * as epoch MICROSECONDS (`unix_micros` ↔ DuckDB `epoch_us`, both
  * truncating the parquet ns values identically), additive aggregates go
  * through [[graft.functions.Exact]], and every query ends in a total
  * ORDER BY.
  */
object FunctionQueries {

  // VARCHAR round-trip: DuckDB's direct DECIMAL->DOUBLE cast is not
  // correctly rounded past 2^53 raw units — see RelationalQueries.dsum.
  private def dsum(x: String) = s"CAST(CAST(SUM(CAST($x AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE)"

  val entries: Seq[Entry] = Seq(

    // ---- Gap-based sessionization (batch twin of a session_window
    // streaming agg; 30-minute inactivity gap). Two logical steps: a lag
    // window marks session starts, a running sum numbers them, then one
    // aggregation per (user, session). Scale: both windows and the final
    // agg shuffle on user_id ONLY — one exchange reused across all three
    // (Spark plans a single sort+exchange for same-key windows), so the
    // shape survives any event volume with per-user time ordering.
    entry("q_session_window",
      s"""WITH e2 AS (SELECT user_id, event_id, epoch_us(ts) t, value FROM events),
         | x AS (SELECT *, CASE WHEN LAG(t) OVER w IS NULL
         |          OR t - LAG(t) OVER w > 1800000000 THEN 1 ELSE 0 END new_s
         |       FROM e2 WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         | s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
         |         ROWS UNBOUNDED PRECEDING) sid FROM x)
         |SELECT user_id, CAST(sid AS BIGINT) AS sid, MIN(t) AS start_us, MAX(t) AS end_us,
         |  COUNT(*) AS n_events, ${dsum("value")} AS sum_value
         |FROM s GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      Tables(s, dir, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("t"), $"value")
        .withColumn("new_s",
          when(lag($"t", 1).over(w).isNull || $"t" - lag($"t", 1).over(w) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("sid", sum($"new_s")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(min($"t").as("start_us"), max($"t").as("end_us"),
          count(lit(1)).as("n_events"), Exact.dsum($"value").as("sum_value"))
        .orderBy($"user_id", $"sid")
    },

    // ---- The same sessionization via Spark's BUILT-IN session_window
    // (the idiomatic form; also valid under streaming with a watermark).
    // session_window semantics: a session CLOSES when the next event is
    // ≥ gap after the previous (windows are [t, t+gap) and merge on
    // overlap), so the oracle's lag condition is `>=` where the manual
    // q_session_window uses `>` — and the window end is last-event + gap.
    entry("q_session_window_native",
      s"""WITH e2 AS (SELECT user_id, event_id, epoch_us(ts) t, value FROM events),
         | x AS (SELECT *, CASE WHEN LAG(t) OVER w IS NULL
         |          OR t - LAG(t) OVER w >= 1800000000 THEN 1 ELSE 0 END new_s
         |       FROM e2 WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         | s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
         |         ROWS UNBOUNDED PRECEDING) sid FROM x)
         |SELECT user_id, MIN(t) AS start_us, MAX(t) + 1800000000 AS end_us,
         |  COUNT(*) AS n_events, ${dsum("value")} AS sum_value
         |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"), Exact.dsum($"value").as("sum_value"))
        .select($"user_id",
          unix_micros($"session_window.start").as("start_us"),
          unix_micros($"session_window.end").as("end_us"),
          $"n_events", $"sum_value")
        .orderBy($"user_id", $"start_us")
    },

    // ---- Pivot (long→wide): per-user exact value sums by event type.
    // The value list is pinned so the output schema is static (no extra
    // distinct-scan job) — required for a deterministic oracle and the
    // right call at scale anyway. One shuffle on user_id; each pivot cell
    // is a conditional partial aggregate (map-side combined).
    entry("q_pivot",
      s"""SELECT user_id,
         |  CAST(CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,3)) END) AS VARCHAR(64)) AS DOUBLE) AS click,
         |  CAST(CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,3)) END) AS VARCHAR(64)) AS DOUBLE) AS error,
         |  CAST(CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,3)) END) AS VARCHAR(64)) AS DOUBLE) AS purchase,
         |  CAST(CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,3)) END) AS VARCHAR(64)) AS DOUBLE) AS signup,
         |  CAST(CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,3)) END) AS VARCHAR(64)) AS DOUBLE) AS view
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(Exact.dsum($"value"))
        .orderBy($"user_id")
    },

    // ---- Explicit GROUPING SETS (beyond rollup/cube): disjoint set list,
    // via the SQL surface to exercise the parser path too.
    entry("q_grouping_sets",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsum("l_quantity")} AS sum_qty
           |FROM lineitem_gs
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    // ---- Datetime-function surface (widens F1/F2/F3): arithmetic,
    // truncation, field extraction — all codegen'd built-ins, compared as
    // dates/ints so both engines agree bit-for-bit.
    entry("q_datetime_funcs",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dy,
        |  quarter(o_orderdate) AS qtr,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  datediff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_left,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  epoch_us(o_orderdate) AS us,
        |  dayofweek(o_orderdate) AS dow
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders").filter($"o_orderkey" < 300)
        .select($"o_orderkey",
          year($"o_orderdate").as("yr"), month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("dy"), quarter($"o_orderdate").as("qtr"),
          date_add($"o_orderdate".cast("date"), 30).as("plus30"),
          datediff(to_date(lit("1998-12-31")), $"o_orderdate".cast("date")).as("days_left"),
          last_day($"o_orderdate".cast("date")).as("eom"),
          date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
          // o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the
          // cast to (UTC-zoned) TIMESTAMP is value-preserving
          unix_micros($"o_orderdate".cast("timestamp")).as("us"),
          // DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday
          (dayofweek($"o_orderdate") - 1).as("dow"))
        .orderBy($"o_orderkey")
    },

    // ---- Array-function surface over tokenized documents (the list ops a
    // text pipeline composes constantly). All built-ins; the only
    // cross-engine trap is indexing (Spark element_at and DuckDB [] are
    // both 1-based; Spark [] is 0-based and avoided here).
    entry("q_array_funcs",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_toks,
        |  len(list_distinct(toks)) AS n_uniq,
        |  list_contains(toks, 'the') AS has_the,
        |  COALESCE(list_position(toks, 'the'), 0) AS pos_the,
        |  toks[3] AS tok3,
        |  array_to_string(toks[1:5], ' ') AS first5,
        |  list_aggregate(toks, 'min') AS min_tok,
        |  list_aggregate(toks, 'max') AS max_tok,
        |  list_sort(toks)[1] AS sorted_first
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("toks", split($"text", " "))
        .select($"doc_id",
          size($"toks").as("n_toks"),
          size(array_distinct($"toks")).as("n_uniq"),
          array_contains($"toks", "the").as("has_the"),
          expr("array_position(toks, 'the')").cast("long").as("pos_the"),
          // try_element_at: NULL past the end, matching DuckDB's toks[3]
          expr("try_element_at(toks, 3)").as("tok3"),
          array_join(slice($"toks", 1, 5), " ").as("first5"),
          array_min($"toks").as("min_tok"),
          array_max($"toks").as("max_tok"),
          sort_array($"toks").getItem(0).as("sorted_first"))
        .orderBy($"doc_id")
    },

    // ---- Regex-function surface (patterns restricted to the common
    // subset of Java regex and RE2 so both engines agree): extraction,
    // global replace, match test, match count.
    entry("q_regex_funcs",
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+)ing', 1) AS ing_stem,
        |  regexp_replace(text, '[0-9]+', '#', 'g') AS no_digits,
        |  regexp_matches(text, '(data|model|train)') AS mentions_ml,
        |  len(regexp_extract_all(text, '[a-z]+ed ')) AS n_past
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents").filter($"doc_id" < 200)
        .select($"doc_id",
          regexp_extract($"text", "([a-z]+)ing", 1).as("ing_stem"),
          regexp_replace($"text", "[0-9]+", "#").as("no_digits"),
          $"text".rlike("(data|model|train)").as("mentions_ml"),
          size(expr("regexp_extract_all(text, '[a-z]+ed ', 0)")).as("n_past"))
        .orderBy($"doc_id")
    },

    // ---- Conditional / null-handling surface: coalesce, nullif,
    // greatest/least, CASE — identical three-valued-logic semantics in
    // both engines.
    entry("q_conditional_funcs",
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  GREATEST(o_totalprice, 100000.0) AS at_least_100k,
        |  LEAST(o_custkey, 1000) AS cust_capped,
        |  CASE WHEN o_totalprice > 200000.0 THEN 'big'
        |       WHEN o_totalprice > 50000.0 THEN 'mid' ELSE 'small' END AS bucket,
        |  o_totalprice IS NULL AS price_missing
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders").filter($"o_orderkey" < 300)
        .select($"o_orderkey",
          coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status_or_open"),
          greatest($"o_totalprice", lit(100000.0)).as("at_least_100k"),
          least($"o_custkey", lit(1000)).as("cust_capped"),
          when($"o_totalprice" > 200000.0, "big")
            .when($"o_totalprice" > 50000.0, "mid").otherwise("small").as("bucket"),
          $"o_totalprice".isNull.as("price_missing"))
        .orderBy($"o_orderkey")
    },

    // ---- Fixed-width histogram: integer bucketing with exact per-bucket
    // stats — one tiny-keyspace aggregation with map-side partials.
    entry("q_histogram",
      s"""SELECT CAST(floor(o_totalprice/60000.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
         |  ${dsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy(floor($"o_totalprice" / 60000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min($"o_totalprice").as("lo"),
          max($"o_totalprice").as("hi"), Exact.dsum($"o_totalprice").as("sum_price"))
        .orderBy($"bucket")
    },

    // ---- Deterministic train/val/test split assignment: hash-bucket each
    // document by its first md5 hex digit (12/2/2 of 16 → 75%/12.5%/12.5%).
    // No rand() anywhere — assignments are stable across runs, engines,
    // retries, and cluster sizes, which is what an eval-split pipeline
    // actually requires. Narrow map + tiny aggregation.
    entry("q_det_sample",
      """WITH s AS (SELECT doc_id,
        |    strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS v,
        |    regexp_split_to_array(text,'\s+') toks FROM documents),
        | a AS (SELECT doc_id, len(toks) n_tokens,
        |    CASE WHEN v < 12 THEN 'train' WHEN v < 14 THEN 'val' ELSE 'test' END AS split FROM s)
        |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM a GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id",
          (expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1))") - 1).as("v"),
          size(graft.functions.TextFunctions.wsTokens("text")).as("n_tokens"))
        .withColumn("split",
          when($"v" < 12, "train").when($"v" < 14, "val").otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"split")
    },

    // ---- Exact sample covariance + correlation via INTEGER moments.
    // Both columns carry ≤3 decimal digits, so x·1000 (through an exact
    // decimal hop) is an exact int64; all five moments (Σx Σy Σxy Σx² Σy²)
    // accumulate exactly (decimal-128 in Spark, hugeint in DuckDB), and
    // each n·Σxy − ΣxΣy style numerator is formed exactly BEFORE the one
    // and only cast to double — a single rounding per term, identical in
    // both engines. (A first attempt cast decimal(38,6) sums to double and
    // divided: DuckDB's scaled-decimal→double conversion rounds twice —
    // int128→double then /10^6 — and drifted 4 ulps from Spark's
    // correctly-rounded BigDecimal path. Scale-0 casts sidestep that.)
    // The 1e6 quantization factor cancels in corr and divides out of cov.
    entry("q_cov_corr",
      """WITH k AS (SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT) xk,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 1000 AS BIGINT) yk FROM lineitem),
        | a AS (SELECT l_returnflag, COUNT(*) n, SUM(xk) sx, SUM(yk) sy,
        |        SUM(xk*yk) sxy, SUM(xk*xk) sxx, SUM(yk*yk) syy FROM k GROUP BY 1)
        |SELECT l_returnflag,
        |  CAST(n*sxy - sx*sy AS DOUBLE) / (n*(n-1)) / 1000000.0 AS cov_qty_price,
        |  CAST(n*sxy - sx*sy AS DOUBLE)
        |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_qty_price
        |FROM a ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dec38 = "DECIMAL(38,0)"
      val n = count(lit(1)).cast(dec38)
      def m(e: String) = sum(expr(s"CAST($e AS $dec38)"))
      val (sx, sy) = (m("xk"), m("yk"))
      val (sxy, sxx, syy) = (m("xk*yk"), m("xk*xk"), m("yk*yk"))
      val nxy = (n * sxy - sx * sy).cast("double")
      Tables(s, dir, "lineitem")
        .select($"l_returnflag",
          expr("CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT)").as("xk"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 1000 AS BIGINT)").as("yk"))
        .groupBy($"l_returnflag")
        .agg(
          (nxy / (count(lit(1)) * (count(lit(1)) - lit(1L))) / lit(1e6)).as("cov_qty_price"),
          (nxy / (sqrt((n * sxx - sx * sx).cast("double"))
            * sqrt((n * syy - sy * sy).cast("double")))).as("corr_qty_price"))
        .orderBy($"l_returnflag")
    },

    // ---- Sequence assembly: per-user event trajectories in event order —
    // the record-building op behind behavioral training data (one training
    // example per user from their ordered interaction history). Ordering
    // inside collect_list is NOT guaranteed under parallel aggregation, so
    // determinism comes from array_sort over (event_id, type) structs
    // AFTER collection — one shuffle on user_id, map-side partial
    // collection, and the sort is per-group over small arrays.
    entry("q_seq_assembly",
      s"""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  array_to_string(list(event_type ORDER BY event_id), '>') AS type_seq,
         |  ${dsum("value")} AS sum_value
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          expr("array_join(transform(array_sort(collect_list(struct(event_id, event_type))), " +
            "x -> x.event_type), '>')").as("type_seq"),
          Exact.dsum($"value").as("sum_value"))
        .orderBy($"user_id")
    }
  )
}
