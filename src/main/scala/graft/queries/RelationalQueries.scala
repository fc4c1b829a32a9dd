package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exact, Ranking}

/** The relational operator surface (SURVEY §2.2-§2.6 plus the full join
  * surface the reference lacks): scans with pushdown, projections, filters,
  * limits, equi/semi/anti joins, broadcast joins, group-by aggregations,
  * rollup, window functions, distinct, union.
  *
  * Every aggregate over doubles routes through [[graft.functions.Exact]] so
  * the DuckDB oracle hash-matches bit-for-bit (see Exact's scaladoc).
  * Every query ends in a total ORDER BY so row order is engine-independent.
  *
  * Scale notes are per-query in comments: which side broadcasts, where the
  * shuffles are, and why the plan survives 1000 executors.
  */
object RelationalQueries {

  /** Deterministic per-session location for the bucketed co-purchase
    * edge table: `Overwrite` then REUSES the directory across bench
    * passes instead of abandoning a fresh `createTempDirectory` copy per
    * builder invocation (up to three full zstd edge tables leaked per
    * bench run — r17 advice), and one JVM shutdown hook removes every
    * registered path so repeated sessions do not accumulate either. */
  private val edgePaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private val edgeHookArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def edgeTablePath(s: org.apache.spark.sql.SparkSession): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_copurchase_edges_${s.sparkContext.applicationId}")
    edgePaths.add(p)
    if (edgeHookArmed.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        edgePaths.forEach(pp => rm(pp.toFile))
      }))
    p.toString
  }

  // Shared oracle fragments (DuckDB SQL, ANSI).
  //
  // Decimal sums reach DOUBLE through a VARCHAR round-trip: DuckDB's
  // direct DECIMAL->DOUBLE cast converts the int128 payload to double
  // FIRST and divides by the scale factor SECOND — two roundings, which
  // is off by one ulp from the correctly-rounded conversion once the
  // raw decimal UNITS exceed 2^53 (first seen at the sf10 gate: scale-6
  // revenue sums ~4.4e17 units; Spark's BigDecimal.doubleValue and
  // Python's float(Decimal) both give the correctly-rounded .53 where
  // DuckDB's cast gave .52997). VARCHAR->DOUBLE is a single
  // correctly-rounded strtod, so the oracle agrees with Spark at EVERY
  // scale. Values are bit-identical to the old cast wherever that cast
  // was already exact (everything at sf0.01-sf1).
  private def dsum(x: String) = s"CAST(CAST(SUM(CAST($x AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE)"
  /** Oracle twin of [[graft.functions.Exact.davg]]: divides by COUNT(col)
    * (SQL AVG semantics, nulls excluded) so Spark and DuckDB cannot drift
    * on nullable input. */
  private def davg(x: String) = s"${dsum(x)}/COUNT($x)"

  /** The ONE support threshold both co-purchase graph queries and their
    * oracles derive from — a single constant so Spark and SQL cannot
    * drift. */
  private val CopurchaseMinSupport = 2L

  /** The per-row digest hash of `q_table_digest` as a Spark SQL
    * expression — public so the invariance spec exercises the SAME
    * formula the query ships (15 md5 hex chars → int64; chr(31)
    * unit-separator joints prevent column-boundary collisions). */
  val digestHashExpr: String =
    "CAST(conv(substring(md5(concat(" +
      "CAST(event_id AS STRING), chr(31), CAST(user_id AS STRING), chr(31), event_type" +
      ")), 1, 15), 16, 10) AS BIGINT)"

  /** Distinct (order, part) basket items — defined once so callers that
    * also need per-item supports reuse the same projection instead of
    * re-scanning lineitem. */
  private def copurchaseItems(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem").select($"l_orderkey", $"l_partkey").distinct()
  }

  /** Oriented, support-filtered co-purchase edges (pa < pb, count of
    * shared orders ≥ [[CopurchaseMinSupport]]) — the one edge-set
    * definition q_assoc_rules and q_triangle_count must agree on. Spark
    * builds it WITHOUT a self-join: baskets collapse to sorted part
    * arrays (one shuffle on the order key) and pairs explode
    * basket-locally — quadratic only in basket size, never a
    * corpus × corpus join.
    *
    * The input needs only (l_orderkey, l_partkey) columns and need NOT be
    * distinct: `collect_set` dedups inside the one groupBy — see
    * [[copurchaseEdgesRaw]]. */
  private def copurchaseEdges(items: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    items
      .groupBy(c("l_orderkey"))
      .agg(sort_array(collect_set(c("l_partkey"))).as("parts"))
      // r19 (guide codegen/expressions): the i<j pair expansion was a
      // nested interpreted transform+slice lambda chain (CodegenFallback,
      // a sliced array materialized per element per basket) on every
      // graph query's corpus pass — graft_sortedpairs emits the identical
      // pair sequence in one native double loop (VectorExprSpec pins it)
      .select(explode(graft.plans.VectorExpressions.sortedPairs(c("parts"))).as("e"))
      .select(c("e.pa"), c("e.pb"))
      .groupBy(c("pa"), c("pb")).agg(count(lit(1)).as("su"))
      .filter(c("su") >= CopurchaseMinSupport)
  }

  /** Edges straight off the lineitem scan — the shape for callers that
    * need ONLY the edge set (the whole graph family except
    * q_assoc_rules, whose per-part supports genuinely need the distinct
    * items frame). r18 (guide §2.4 "remove shuffles outright"): routing
    * through [[copurchaseItems]] paid a full (l_orderkey, l_partkey)
    * distinct — an extra lineitem-sized Exchange + HashAggregate pair —
    * immediately before a `collect_set` that dedups the same pairs
    * inside the basket groupBy anyway. Feeding the raw projection is
    * set-identical (collect_set over raw rows ≡ collect_set over
    * distinct rows) and drops that Exchange from every edge-consuming
    * query plan: 6 queries × one full-table shuffle per bench pass, and
    * at 100 TB the difference between shuffling lineitem twice and
    * once. */
  private def copurchaseEdgesRaw(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame =
    copurchaseEdges(Tables(s, dir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey")))

  /** The matching DuckDB CTE text (`items` + support-filtered `pairs`),
    * shared by both graph-query oracles; the HAVING threshold
    * interpolates [[CopurchaseMinSupport]] so the edge definition cannot
    * drift between Spark and SQL. */
  private val copurchaseCte: String =
    s"""items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      | pairs AS MATERIALIZED (SELECT a.l_partkey pa, b.l_partkey pb, COUNT(*) s
      |           FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |           GROUP BY 1,2 HAVING COUNT(*) >= $CopurchaseMinSupport)""".stripMargin

  val entries: Seq[Entry] = Seq(

    // ---- A-family: group-by aggregation (TPC-H Q1 shape). One shuffle on
    // the two low-cardinality group keys; partial aggregation collapses
    // 100 TB to a handful of rows before the exchange.
    entry("q1_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))) AS VARCHAR(64)) AS DOUBLE) AS sum_disc_price,
         |  ${davg("l_quantity")} AS avg_qty,
         |  ${davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          Exact.dsum($"l_quantity").as("sum_qty"),
          Exact.dsum($"l_extendedprice").as("sum_base_price"),
          sum(Exact.dec($"l_extendedprice") * (lit(1).cast(Exact.D) - Exact.dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          Exact.davg($"l_quantity").as("avg_qty"),
          Exact.davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- P-family: projection + rename + filter + limit-free total order.
    // Both predicates and the 4-column projection push to the parquet scan
    // (check: PushedFilters + ReadSchema in explain).
    entry("q_filter_project",
      """SELECT o_orderkey AS orderkey, o_custkey AS custkey,
        |  o_totalprice AS totalprice, o_orderpriority AS priority
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 400000.0
        |ORDER BY orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderstatus" === "F" && $"o_totalprice" > 400000.0)
        .select($"o_orderkey".as("orderkey"), $"o_custkey".as("custkey"),
          $"o_totalprice".as("totalprice"), $"o_orderpriority".as("priority"))
        .orderBy($"orderkey")
    },

    // ---- W-family: global top-k. Spark runs TakeOrderedAndProject: per-
    // partition heaps then a k-row merge on the driver — no global sort of
    // 100 TB, the canonical scale-safe top-k.
    entry("q_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // ---- J-family: fact ⋈ small dim. part is bounded relative to lineitem;
    // the explicit broadcast keeps the 100 TB fact table shuffle-free.
    entry("q_join_broadcast",
      s"""SELECT p_brand, COUNT(*) AS n_items, ${dsum("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"), Exact.dsum($"l_extendedprice").as("sum_price"))
        .orderBy($"p_brand")
    },

    // ---- Multi-way join (TPC-H Q5 shape): two big-table shuffle joins
    // (orders⋈lineitem, customer⋈orders) + three broadcast dims. AQE can
    // re-plan the middle join if one side collapses after filtering.
    entry("q_join_multi",
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))) AS VARCHAR(64)) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                $"o_orderdate" < to_timestamp(lit("1998-01-01 00:00:00")))
      val lineitem = Tables(s, dir, "lineitem")
      val supplier = Tables(s, dir, "supplier")
      val nation = Tables(s, dir, "nation")
      val region = Tables(s, dir, "region").filter($"r_name" === "ASIA")
      customer
        .join(orders, $"c_custkey" === $"o_custkey")
        .join(lineitem, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(supplier), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(Exact.dec($"l_extendedprice") * (lit(1).cast(Exact.D) - Exact.dec($"l_discount")))
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // ---- Full outer join + per-key aggregate: customers with no orders
    // AND orders with no customer both survive (COALESCE merges the key).
    // The aggregation is PUSHED BELOW the join (grouping key = join key,
    // so agg-then-join ≡ join-then-agg): orders collapse to one row per
    // custkey BEFORE the full-outer join — at 100 TB that shrinks the
    // join's shuffled payload from every order row to distinct customers,
    // and the join reuses the aggregate's hash partitioning (two
    // exchanges total; grouping on the post-join COALESCE key would cost
    // a third — PlanSpec pins this).
    entry("q_join_outer",
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
        |  c.c_name, COUNT(o.o_orderkey) AS n_orders
        |FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2 ORDER BY custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val perKey = Tables(s, dir, "orders").select($"o_custkey", $"o_orderkey")
        .groupBy($"o_custkey").agg(count($"o_orderkey").as("n"))
      Tables(s, dir, "customer").select($"c_custkey", $"c_name")
        .join(perKey, $"c_custkey" === $"o_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("custkey"), $"c_name",
          coalesce($"n", lit(0L)).as("n_orders"))
        .orderBy($"custkey")
    },

    // ---- Deterministic fixed-size uniform sample: exactly K docs chosen
    // by smallest content-independent hash — reproducible across runs,
    // engines, and cluster sizes (no rand(), no reservoir state). Plans as
    // TakeOrderedAndProject: each partition keeps its local top-K and only
    // K·partitions rows ever move — no global sort of the corpus.
    entry("q_hash_topk_sample",
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
        |ORDER BY h, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id", md5($"doc_id".cast("string").cast("binary")).as("h"))
        .orderBy($"h", $"doc_id").limit(20)
    },

    // ---- Semi join (EXISTS): left_semi ships only the join key of the
    // filtered subquery side; no row duplication, no wide shuffle payload.
    entry("q_semi_join",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "lineitem").filter($"l_quantity" >= 49),
          $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    // ---- Anti join (NOT EXISTS) — the reference's only join semantics
    // (J1/J2 dedup, collector :741-748), here over the star schema.
    entry("q_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // ---- As-of join (an operator Spark lacks natively — composed per the
    // preference order from existing ops): equi-join on the key plus the
    // time inequality, then keep the latest right row per left row with a
    // max_by AGGREGATION rather than a row_number window: partial (map-
    // side) aggregation collapses each partition to one row per event
    // BEFORE the shuffle, where the window formulation had to shuffle and
    // sort every joined row. Deterministic tie-break via the struct
    // ordering (orderdate DESC ≡ max, then smallest orderkey via -key).
    // The oracle states the same semantics with ROW_NUMBER.
    entry("q_asof_join",
      """WITH j AS (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey) rn
        |  FROM events e JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey, o_totalprice FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir, "events")
      val o = Tables(s, dir, "orders")
      e.join(o, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts")
        .groupBy($"event_id", $"user_id")
        .agg(max_by(
          struct($"o_orderkey", $"o_totalprice"),
          struct($"o_orderdate", (-$"o_orderkey").as("nk"))).as("m"))
        .select($"event_id", $"user_id",
          $"m.o_orderkey".as("o_orderkey"), $"m.o_totalprice".as("o_totalprice"))
        .orderBy($"event_id")
    },

    // ---- As-of join via the NATIVE custom operator (logical node +
    // strategy + co-partitioned merge exec — graft.plans.AsOfJoinPlan):
    // one shuffle per side, a single O(n+m) forward pass per partition,
    // no (event × order-history) pair materialization at all. Same
    // oracle as the composed q_asof_join above — the gate proves the
    // custom operator's semantics equal the window formulation.
    entry("q_asof_join_native",
      """WITH j AS (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey) rn
        |  FROM events e JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey, o_totalprice FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir, "events").select($"event_id", $"user_id", $"ts")
      val o = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
      graft.plans.AsOfJoinPlan
        .asof(s, e, o, e("user_id"), o("o_custkey"), e("ts"), o("o_orderdate"), o("o_orderkey"))
        .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
        .orderBy($"event_id")
    },

    // ---- Range join via BUCKETIZED equi-join: the naive formulation is a
    // nested-loop over every (event, order) pair; bucketing the range into
    // fixed-width intervals turns it into an equi-join on the bucket id
    // plus a cheap refine predicate — the standard 100 TB range-join
    // rewrite. The oracle states the plain BETWEEN semantics; results are
    // provably identical because an order's bucket is unique and every
    // qualifying pair shares it.
    entry("q_range_join",
      """SELECT e.event_id, COUNT(*) n, CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE) sum_price
        |FROM events e JOIN orders o ON o.o_totalprice BETWEEN e.value*1000 AND e.value*1000+50000
        |WHERE e.event_id < 100 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val W = 50000L
      val e = Tables(s, dir, "events").filter($"event_id" < 100)
        .select($"event_id", ($"value" * 1000).as("lo"), ($"value" * 1000 + 50000).as("hi"))
        .withColumn("bucket", explode(expr(s"sequence(CAST(floor(lo/$W) AS BIGINT), CAST(floor(hi/$W) AS BIGINT))")))
      val o = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice",
          expr(s"CAST(floor(o_totalprice/$W) AS BIGINT)").as("bucket"))
      e.join(o, Seq("bucket"))
        .filter($"o_totalprice".between($"lo", $"hi"))
        .groupBy($"event_id")
        .agg(count(lit(1)).as("n"), Exact.dsum($"o_totalprice").as("sum_price"))
        .orderBy($"event_id")
    },

    // ---- Salted skew-join (graft.functions.SkewJoin): each fact row gets
    // a deterministic salt from a full-row xxhash64, the dim side is
    // replicated once per salt bucket, and the join key becomes
    // (key, salt) — a hot supplier spreads over 8 reducers instead of
    // straggling on one. The oracle states the PLAIN join: salting is
    // provably result-identical, and the gate enforces exactly that.
    entry("q_join_salted",
      s"""SELECT s_name, COUNT(*) AS n_items, ${dsum("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name ORDER BY s_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val fact = Tables(s, dir, "lineitem").select($"l_suppkey", $"l_extendedprice")
      val dim = Tables(s, dir, "supplier").select($"s_suppkey".as("l_suppkey"), $"s_name")
      graft.functions.SkewJoin.saltedEquiJoin(fact, dim, "l_suppkey", saltBuckets = 8)
        .groupBy($"s_name")
        .agg(count(lit(1)).as("n_items"), Exact.dsum($"l_extendedprice").as("sum_price"))
        .orderBy($"s_name")
    },

    // ---- Set ops beyond the reference's union: INTERSECT / EXCEPT
    // (distinct semantics, one shuffle each on the full row as key).
    entry("q_intersect",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      ev.filter($"event_type" === "purchase").select($"user_id")
        .intersect(ev.filter($"event_type" === "error").select($"user_id"))
        .orderBy($"user_id")
    },

    entry("q_except",
      """SELECT event_id FROM events WHERE value > 190
        |EXCEPT SELECT event_id FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      ev.filter($"value" > 190).select($"event_id")
        .except(ev.filter($"event_type" === "error").select($"event_id"))
        .orderBy($"event_id")
    },

    // ---- Set ops under BAG semantics — the multiset complement of
    // q_except/q_intersect's DISTINCT forms (§2.6 completion): EXCEPT ALL
    // keeps max(m₁−m₂, 0) copies per value, INTERSECT ALL min(m₁, m₂).
    // user_id (not the unique event_id) is the projected column so
    // multiplicities are real — on a unique key the ALL forms degenerate
    // to the DISTINCT ones and the gate would prove nothing. Spark's
    // native exceptAll/intersectAll plan as per-side count aggregates +
    // a replicating generate — ONE shuffle per side on the value, never
    // a row-by-row anti join, so multiplicity math happens on the
    // REDUCED (value, count) frame: the 100-TB shape.
    entry("q_except_all",
      """SELECT user_id FROM events WHERE value > 150
        |EXCEPT ALL SELECT user_id FROM events WHERE event_type = 'error' AND value > 185
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      ev.filter($"value" > 150).select($"user_id")
        .exceptAll(ev.filter($"event_type" === "error" && $"value" > 185).select($"user_id"))
        .orderBy($"user_id")
    },

    entry("q_intersect_all",
      """SELECT user_id FROM events WHERE value > 150
        |INTERSECT ALL SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      ev.filter($"value" > 150).select($"user_id")
        .intersectAll(ev.filter($"event_type" === "error").select($"user_id"))
        .orderBy($"user_id")
    },

    // ---- Window: ranking within a partitioned window. One shuffle on
    // o_custkey; row_number needs no full materialization per group.
    entry("q_window_rank",
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"rnk")
    },

    // ---- Window: running aggregate + lag over event time. Exact decimal
    // accumulation keeps the running sum engine-deterministic.
    entry("q_window_running",
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,3))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |  LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      Tables(s, dir, "events").select(
        $"user_id", $"event_id",
        Exact.dsumOver($"value", w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_value"),
        lag($"value", 1).over(w).as("prev_value"))
        .orderBy($"user_id", $"event_id")
    },

    // ---- Window: distribution analytics (ntile / percent_rank /
    // cume_dist / lead / first_value) — completes the analytic-window
    // family beyond ranking and running aggregates. percent_rank and
    // cume_dist are single int/int divisions, engine-identical; the
    // order key is made total with the unique o_orderkey tiebreak.
    entry("q_window_analytics",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders WHERE o_orderkey < 500
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      Tables(s, dir, "orders").filter($"o_orderkey" < 500)
        .select($"o_orderkey",
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          lead($"o_orderkey", 1).over(w).as("next_key"),
          first_value($"o_orderkey").over(w).as("first_key"))
        .orderBy($"o_orderkey")
    },

    // ---- Math-function surface: the cross-engine-safe subset (abs /
    // ceil / floor / sqrt / sign / modulo / self-product). sqrt is IEEE
    // correctly-rounded so both engines agree bit-for-bit; ln/exp/pow are
    // deliberately ABSENT — libm implementations differ in the last ulp
    // across engines (the tfidf query shows the rational-arithmetic
    // workaround when a log-shaped score is needed).
    entry("q_math_funcs",
      """SELECT o_orderkey,
        |  abs(o_totalprice - 100000.0) AS dev,
        |  CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS ceil_k,
        |  CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS floor_k,
        |  sqrt(o_totalprice) AS root,
        |  o_totalprice * o_totalprice AS sq,
        |  CAST(sign(o_totalprice - 150000.0) AS BIGINT) AS sgn,
        |  o_orderkey % 7 AS m7
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders").filter($"o_orderkey" < 300)
        .select($"o_orderkey",
          abs($"o_totalprice" - 100000.0).as("dev"),
          ceil($"o_totalprice" / 1000.0).cast("long").as("ceil_k"),
          floor($"o_totalprice" / 1000.0).cast("long").as("floor_k"),
          sqrt($"o_totalprice").as("root"),
          ($"o_totalprice" * $"o_totalprice").as("sq"),
          signum($"o_totalprice" - 150000.0).cast("long").as("sgn"),
          ($"o_orderkey" % 7).as("m7"))
        .orderBy($"o_orderkey")
    },

    // ---- Map-function surface: construct, extract, enumerate keys,
    // cardinality — completes §2.7's scalar families (maps are how
    // per-record metadata/config travels in an ingest pipeline). Scalars
    // are extracted before output so the compare stays engine-portable
    // (DuckDB's map[key] yields a single-element list — unwrapped with
    // [1] in the oracle).
    entry("q_map_funcs",
      """WITH m AS (SELECT o_orderkey,
        |    MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS props
        |  FROM orders WHERE o_orderkey < 300)
        |SELECT o_orderkey, props['status'][1] AS status, props['priority'][1] AS priority,
        |  CAST(cardinality(props) AS INT) AS n_keys,
        |  array_to_string(map_keys(props), ',') AS keys_csv
        |FROM m ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders").filter($"o_orderkey" < 300)
        .withColumn("props",
          map(lit("status"), $"o_orderstatus", lit("priority"), $"o_orderpriority"))
        .select($"o_orderkey",
          element_at($"props", "status").as("status"),
          element_at($"props", "priority").as("priority"),
          size($"props").as("n_keys"),
          array_join(map_keys($"props"), ",").as("keys_csv"))
        .orderBy($"o_orderkey")
    },

    // ---- Rollup (grouping sets beyond the reference's flat groupBy).
    entry("q_rollup",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), Exact.dsum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- Cube: all grouping-set combinations (beyond the reference's
    // flat groupBy; completes the rollup/cube pair).
    entry("q_cube",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), Exact.dsum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- U-family: union + distinct (reference U1 vertical concat).
    entry("q_union_distinct",
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT event_id, user_id, value FROM events WHERE value > 150.0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"value")
        .unionByName(ev.filter($"value" > 150.0).select($"event_id", $"user_id", $"value"))
        .distinct()
        .orderBy($"event_id")
    },

    // ---- Exact interpolated percentiles (sort-based; both engines use the
    // same (1-f)·a + f·b interpolation on identical doubles). At 100 TB
    // prefer approx_percentile (q_approx_aggs) — this is the exact contract.
    entry("q_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) med_qty,
        |  quantile_cont(l_extendedprice, 0.9) p90_price,
        |  quantile_cont(l_quantity, 0.25) q1_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          expr("CAST(percentile(l_quantity, array(0.25, 0.75))[0] AS DOUBLE)").as("q1_qty"))
        .orderBy($"l_returnflag")
    },

    // ---- Approximate aggregates — the 100 TB workhorses (HLL distinct,
    // t-digest-ish percentile). Sketch values are engine-specific, so no
    // DuckDB oracle (driver rows-only check); ApproxSpec bounds the error
    // against the exact answers.
    entryNoOracle("q_approx_aggs") { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_med_price"))
        .orderBy($"l_returnflag")
    },

    // ---- Mergeable sketch percentile under the ENGINE'S OWN control
    // ([[graft.functions.Sketches.QuantileSketch]], a deterministic
    // Munro–Paterson compactor stack): the 100 TB replacement for exact
    // `percentile`, whose reducer buffers a whole group's values. The
    // sketch keeps O(k·log n) doubles per group, builds map-side, and
    // merges associatively like any partial aggregate. Sketch values are
    // implementation-specific → rows-only driver check; SketchSpec pins
    // the rank-error envelope property-style and ApproxSpec-style bounds
    // vs the exact q_percentile answers.
    entryNoOracle("q_percentile_sketch") { (s, dir) =>
      import s.implicits._
      import graft.functions.Sketches.quantileSketch
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(quantileSketch(256, Seq(0.25, 0.5, 0.9))($"l_quantity".cast("double")).as("qsk"))
        .select($"l_returnflag",
          $"qsk".getItem(0).as("q1_qty"),
          $"qsk".getItem(1).as("med_qty"),
          $"qsk".getItem(2).as("p90_qty"))
        .orderBy($"l_returnflag")
    },

    // ---- String-function surface (F6/F7/F11-family, widened): the scalar
    // string ops a text pipeline leans on, all codegen'd built-ins.
    entry("q_string_funcs",
      """SELECT o_orderkey,
        |  upper(o_orderpriority) up, lower(o_orderstatus) lo,
        |  substring(o_orderpriority, 3, 6) sub,
        |  length(o_orderpriority) len,
        |  replace(o_orderpriority, '-', '_') rep,
        |  concat(o_orderstatus, ':', o_orderpriority) cat,
        |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') pad,
        |  string_split(o_orderpriority, '-')[1] tok,
        |  levenshtein(o_orderstatus, 'OF') lev,
        |  trim(concat('xx', o_orderstatus, 'x'), 'x') trm,
        |  reverse(o_orderstatus) rev,
        |  strpos(o_orderpriority, '-') pos
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders").filter($"o_orderkey" < 300)
        .select($"o_orderkey",
          upper($"o_orderpriority").as("up"), lower($"o_orderstatus").as("lo"),
          substring($"o_orderpriority", 3, 6).as("sub"),
          length($"o_orderpriority").as("len"),
          expr("replace(o_orderpriority, '-', '_')").as("rep"),
          concat($"o_orderstatus", lit(":"), $"o_orderpriority").as("cat"),
          lpad($"o_orderkey".cast("string"), 12, "0").as("pad"),
          split($"o_orderpriority", "-").getItem(0).as("tok"),
          levenshtein($"o_orderstatus", lit("OF")).as("lev"),
          expr("trim('x' FROM concat('xx', o_orderstatus, 'x'))").as("trm"),
          reverse($"o_orderstatus").as("rev"),
          instr($"o_orderpriority", "-").as("pos"))
        .orderBy($"o_orderkey")
    },

    // ---- A5: distinct values of a column.
    entry("q_distinct",
      "SELECT DISTINCT event_type FROM events ORDER BY event_type") { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events").select($"event_type").distinct().orderBy($"event_type")
    },

    // ---- A8: describe-style statistics (reader show_statistics,
    // parquet_to_polars.py:406-443): min/max/mean/std + null counts,
    // variance rebuilt from exact sums (see Exact.dstddev).
    entry("q_describe_stats",
      s"""SELECT COUNT(*) AS n_rows,
         |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         |  ${davg("l_quantity")} AS avg_qty,
         |  sqrt((CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,3)) * CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE)
         |        - ${dsum("l_quantity")} * ${dsum("l_quantity")} / COUNT(l_quantity)) / (COUNT(l_quantity) - 1)) AS std_qty,
         |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
         |  ${davg("l_extendedprice")} AS avg_price,
         |  COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS null_shipdate
         |FROM lineitem""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"),
        Exact.davg($"l_quantity").as("avg_qty"),
        Exact.dstddev($"l_quantity").as("std_qty"),
        min($"l_extendedprice").as("min_price"), max($"l_extendedprice").as("max_price"),
        Exact.davg($"l_extendedprice").as("avg_price"),
        count(when($"l_shipdate".isNull, 1)).as("null_shipdate"))
    },

    // ---- k-anonymity / l-diversity audit — the privacy gate a curation
    // pipeline runs before releasing event-level data. Equivalence
    // classes are the quasi-identifier tuple (event_type, day,
    // unit-value band); a class with fewer than k=5 rows re-identifies
    // its members, and a class whose rows all share one user (l<2) leaks
    // the sensitive attribute even at k≥5. Shape at 100 TB: one
    // partial-aggregated shuffle keyed on the QI tuple (the exact
    // distinct-user count rides the same shuffle via expand), then a
    // single-row global summary — class cardinality is data-bounded, so
    // the second agg is trivially small. No window, no join.
    entry("q_k_anonymity",
      """WITH classes AS (
        |  SELECT event_type, strftime(ts,'%Y-%m-%d') AS d,
        |    CAST(floor(value) AS BIGINT) AS vband,
        |    COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT COUNT(*) AS n_classes,
        |  CAST(SUM(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS violating_classes,
        |  CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |  MIN(cnt) AS min_class_size,
        |  CAST(SUM(CASE WHEN n_users < 2 THEN 1 ELSE 0 END) AS BIGINT) AS low_diversity_classes
        |FROM classes""".stripMargin) { (s, dir) =>
      import s.implicits._
      val classes = Tables(s, dir, "events")
        .groupBy($"event_type",
          date_format($"ts", "yyyy-MM-dd").as("d"),
          floor($"value").cast("long").as("vband"))
        .agg(count(lit(1)).as("cnt"), countDistinct($"user_id").as("n_users"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        sum(when($"cnt" < 5, 1L).otherwise(0L)).as("violating_classes"),
        sum(when($"cnt" < 5, $"cnt").otherwise(0L)).as("rows_at_risk"),
        min($"cnt").as("min_class_size"),
        sum(when($"n_users" < 2, 1L).otherwise(0L)).as("low_diversity_classes"))
    },

    // ---- Stratified sampling: exactly min(5, |stratum|) documents per
    // (lang, source) stratum, ranked by md5(doc_id) — deterministic,
    // rand()-free, and re-runnable (the same rows survive on every
    // engine and every rerun, which a seeded sample() cannot promise
    // across partitionings). Shape at 100 TB: one window shuffle keyed on
    // the stratum; within a stratum the sort is by hash so no value-skew
    // hotspot. For heavy strata the rank-window would be replaced by a
    // per-partition top-K + merge (TakeOrderedAndProject per stratum).
    entry("q_stratified_sample",
      """WITH r AS (SELECT doc_id, lang, source,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rk
        |  FROM documents)
        |SELECT lang, source, rk, doc_id FROM r WHERE rk <= 5
        |ORDER BY lang, source, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      Tables(s, dir, "documents")
        .select($"doc_id", $"lang", $"source")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 5)
        .select($"lang", $"source", $"rk", $"doc_id")
        .orderBy($"lang", $"source", $"rk")
    },

    // ---- Quantile-band filtering: keep documents inside the per-language
    // [p10, p90] of n_chars — the outlier trim before training-data
    // tokenization. Two passes by construction (bounds, then filter), but
    // the bounds table is k rows (one per lang) and broadcasts, so the
    // second pass is a narrow scan-filter with map-side-combined
    // aggregation; the exact interpolated percentile runs per-lang
    // (same cross-engine contract as q_percentile: integer inputs, one
    // double interpolation).
    entry("q_quantile_filter",
      """WITH b AS (SELECT lang, quantile_cont(n_chars, 0.1) lo, quantile_cont(n_chars, 0.9) hi
        |           FROM documents GROUP BY 1)
        |SELECT d.lang, COUNT(*) n_kept, MIN(n_chars) min_c, MAX(n_chars) max_c,
        |  CAST(SUM(n_chars) AS BIGINT) sum_c
        |FROM documents d JOIN b USING (lang)
        |WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val b = docs.groupBy($"lang")
        .agg(expr("percentile(n_chars, 0.1)").as("lo"),
          expr("percentile(n_chars, 0.9)").as("hi"))
      docs.join(broadcast(b), "lang")
        .filter($"n_chars" >= $"lo" && $"n_chars" <= $"hi")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), min($"n_chars").as("min_c"),
          max($"n_chars").as("max_c"), sum($"n_chars").as("sum_c"))
        .orderBy($"lang")
    },

    // ---- Decorrelated scalar subquery: orders strictly above their
    // customer's average order value. The correlated form
    // (`o_totalprice > (SELECT AVG(...) WHERE i.custkey = o.custkey)`)
    // decorrelates into one per-customer aggregate joined back — which is
    // exactly what we declare. The above-average test cross-multiplies
    // (price·n > Σprice, both exact decimals) so no engine ever divides —
    // bit-exact without a tolerance. Shape: both sides shuffle on
    // o_custkey once; the aggregate side is pre-shrunk to one row per
    // customer and AQE picks a broadcast when it fits.
    entry("q_above_avg",
      """WITH a AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,3))) s, COUNT(*) n
        |           FROM orders GROUP BY 1)
        |SELECT o.o_custkey, COUNT(*) AS n_above,
        |  CAST(MAX(CAST(o.o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS max_above
        |FROM orders o JOIN a ON o.o_custkey = a.o_custkey
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,3)) * a.n > a.s
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val a = orders.groupBy($"o_custkey".as("a_custkey"))
        .agg(sum(Exact.dec($"o_totalprice")).as("s"), count(lit(1)).as("n"))
      orders.join(a, $"o_custkey" === $"a_custkey")
        .filter(Exact.dec($"o_totalprice") * $"n" > $"s")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_above"),
          max(Exact.dec($"o_totalprice")).cast("double").as("max_above"))
        .orderBy($"o_custkey")
    },

    // ---- Robust outlier detection via median absolute deviation: flag
    // rows deviating > 1.5·MAD from their group median (production data
    // uses the classic 3×; this synthetic column is uniform, where max
    // deviation is exactly 2·MAD, so 1.5 keeps the query discriminative).
    // MAD tolerates the heavy tails that wreck mean/stddev fences. Two
    // exact interpolated percentiles (same cross-engine contract as
    // q_percentile), each bound broadcast back into a narrow pass — the
    // corpus is scanned, never sorted globally. Prices are scaled to
    // INTEGER mils (decimal(18,3)·1000 → bigint, exact in both engines)
    // before any percentile, so the median is an exact half-integer, the
    // deviations are exact 0.5-multiples, the MAD is an exact
    // 0.25-multiple, and the strict fence ad > 1.5·mad can never flip on
    // an interpolation ulp — the one double division back to price units
    // happens after all comparisons. Both twins route through the
    // [[graft.functions.Robust]] front door (mode = Exact here): EXACT
    // percentile buffers a group's values in its reducer — this query is
    // the bounded-scale oracle contract; `q_mad_outliers_sketch` below is
    // the 100 TB twin (Robust.Mode.Sketch — mergeable
    // [[graft.functions.Sketches.quantileSketch]], identical fence shape;
    // Robust.Mode.Auto picks by row count). The recompute-vs-cache
    // decision for the deviation frame lives in Robust.madOutliers.
    entry("q_mad_outliers",
      """WITH v AS (SELECT l_returnflag, CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 1000 AS BIGINT) pm FROM lineitem),
        | med AS (SELECT l_returnflag, quantile_cont(pm, 0.5) med FROM v GROUP BY 1),
        | dev AS (SELECT v.l_returnflag, abs(v.pm - m.med) ad
        |         FROM v JOIN med m ON v.l_returnflag = m.l_returnflag),
        | mad AS (SELECT l_returnflag, quantile_cont(ad, 0.5) mad FROM dev GROUP BY 1)
        |SELECT d.l_returnflag, COUNT(*) n_rows,
        |  COUNT(CASE WHEN d.ad > 1.5*mad.mad THEN 1 END) n_outliers,
        |  CAST(MAX(mad.mad) AS DOUBLE) / 1000 mad
        |FROM dev d JOIN mad ON d.l_returnflag = mad.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.functions.Robust
      val li = Tables(s, dir, "lineitem")
        .select($"l_returnflag", (Exact.dec($"l_extendedprice") * 1000).cast("long").as("pm"))
      Robust.madOutliers(li, "l_returnflag", "pm", fence = 1.5, mode = Robust.Mode.Exact)
        .select($"l_returnflag", $"n_rows", $"n_outliers", ($"mad" / 1000).as("mad"))
        .orderBy($"l_returnflag")
    },

    // ---- Sketch-MAD twin of q_mad_outliers — the 100 TB path. The exact
    // query's `percentile` buffers ~n/3 of the fact table per reducer
    // (3 groups); here BOTH percentile passes run through the mergeable
    // [[graft.functions.Sketches.QuantileSketch]] (O(k·log n) doubles per
    // group, map-side partials), keeping the identical integer-mils fence
    // shape: sketch median, sketch median-of-deviations, strict
    // ad > 1.5·mad count. Sketch medians are implementation-specific →
    // rows-only driver check; MadSketchSpec bounds the fence-count drift
    // against the exact q_mad_outliers answers on the same data.
    entryNoOracle("q_mad_outliers_sketch") { (s, dir) =>
      import s.implicits._
      import graft.functions.Robust
      val li = Tables(s, dir, "lineitem")
        .select($"l_returnflag", (Exact.dec($"l_extendedprice") * 1000).cast("long").as("pm"))
      Robust.madOutliers(li, "l_returnflag", "pm", fence = 1.5, mode = Robust.Mode.Sketch)
        .select($"l_returnflag", $"n_rows", $"n_outliers", ($"mad" / 1000).as("mad"))
        .orderBy($"l_returnflag")
    },

    // ---- Concentration audit: the exact Gini coefficient of per-user
    // event counts — the load-skew metric that says whether "10% of keys
    // own 90% of traffic" BEFORE a hot key melts a reducer (0 = uniform,
    // →1 = one user owns everything). Rank-weighted moments: each i·x
    // product fits int64 (rank ≤ n, count bounded by partition volume),
    // but Σi·x ~ n²·avg blows past 2^63 around 10^9 keys, so the SUM
    // accumulates in decimal(38,0) (HUGEINT in the oracle) — good to
    // 10^38. One final double expression. The rank runs over USERS
    // (post-aggregation), not events, and is DISTRIBUTED
    // ([[graft.functions.Ranking]]: value-bucketed per-partition
    // row_number + offset merge) — no single-reducer global window even
    // at 10^9 users.
    entry("q_concentration",
      """WITH u AS (SELECT user_id, COUNT(*) x FROM events GROUP BY 1),
        | r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) i FROM u),
        | m AS (SELECT COUNT(*) n, CAST(SUM(x) AS BIGINT) sx, SUM(CAST(i*x AS HUGEINT)) six FROM r)
        |SELECT n AS n_users, sx AS n_events,
        |  CAST(2*six - (n+1)*sx AS DOUBLE) / (CAST(n AS DOUBLE) * sx) AS gini,
        |  CAST(sx AS DOUBLE) / n AS mean_events
        |FROM m""".stripMargin) { (s, dir) =>
      import s.implicits._
      val u = Tables(s, dir, "events")
        .groupBy($"user_id").agg(count(lit(1)).as("x"))
      Ranking.withGlobalRowNumber(u, $"x", primaryAsc = true,
          Seq($"x", $"user_id"), "i")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum(($"i" * $"x").cast("decimal(38,0)")).as("six"))
        .select($"n".as("n_users"), $"sx".as("n_events"),
          ((lit(2) * $"six" - ($"n" + 1) * $"sx").cast("double")
            / ($"n".cast("double") * $"sx")).as("gini"),
          ($"sx".cast("double") / $"n").as("mean_events"))
    },

    // ---- Growth accounting: daily active / new / resurrected users and
    // the cumulative user count — the canonical product-analytics rollup.
    // ONE per-user lag over day buckets yields everything: a NULL lag IS
    // the first-seen day (new), a > 7-day gap is a resurrection — no
    // separate first-seen aggregate or join. Integer day arithmetic
    // end-to-end; the only global window (cumulative sum) runs over the
    // per-DAY frame — rows = days, not users, so a single partition is
    // fine at any corpus size.
    entry("q_user_growth",
      """WITH a AS (SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) d FROM events),
        | g AS (SELECT user_id, d,
        |         LAG(d) OVER (PARTITION BY user_id ORDER BY d) prev_d
        |       FROM a),
        | daily AS (SELECT d,
        |    COUNT(*) n_active,
        |    COUNT(CASE WHEN prev_d IS NULL THEN 1 END) n_new,
        |    COUNT(CASE WHEN d - prev_d > 7 THEN 1 END) n_resurrected
        |  FROM g GROUP BY 1)
        |SELECT d AS day_bucket, n_active, n_new, n_resurrected,
        |  CAST(SUM(n_new) OVER (ORDER BY d) AS BIGINT) cum_users
        |FROM daily ORDER BY d""".stripMargin) { (s, dir) =>
      import s.implicits._
      val a = Tables(s, dir, "events")
        .select($"user_id", expr("unix_micros(ts) DIV 86400000000").as("d"))
        .distinct()
      val wu = Window.partitionBy($"user_id").orderBy($"d")
      val daily = a
        .withColumn("prev_d", lag($"d", 1).over(wu))
        .groupBy($"d")
        .agg(count(lit(1)).as("n_active"),
          count(when($"prev_d".isNull, 1)).as("n_new"),
          count(when($"d" - $"prev_d" > 7, 1)).as("n_resurrected"))
      val wc = Window.orderBy($"d")
      daily.select($"d".as("day_bucket"), $"n_active", $"n_new", $"n_resurrected",
          sum($"n_new").over(wc).as("cum_users"))
        .orderBy($"day_bucket")
    },

    // ---- Activity seasonality: the (day-of-week × hour-of-day) traffic
    // matrix with exact value sums — the load-profile table behind
    // capacity planning and anomaly baselines. One aggregation onto a
    // fixed 168-cell grid (map-side combined); the day-of-week origin
    // shift between engines (Spark Sunday=1, DuckDB Sunday=0) is
    // normalized here, same convention as q_datetime_funcs.
    entry("q_seasonality",
      """SELECT CAST(dayofweek(ts) AS BIGINT) dow, CAST(hour(ts) AS BIGINT) hod,
        |  COUNT(*) n, CAST(CAST(SUM(CAST(value AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE) sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy((dayofweek($"ts") - 1).cast("long").as("dow"),
          hour($"ts").cast("long").as("hod"))
        .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("sum_value"))
        .orderBy($"dow", $"hod")
    },

    // ---- Customer segmentation: revenue deciles via NTILE over exact
    // decimal revenue (unique ordering → identical bucket boundaries in
    // both engines), rolled up to per-decile totals — the LTV/whale
    // analysis table. The per-customer aggregate shrinks the corpus to
    // one row per customer BEFORE the decile assignment, and the NTILE
    // itself is DISTRIBUTED ([[graft.functions.Ranking.withGlobalNtile]]:
    // value-bucketed per-partition rank + offset merge + the SQL NTILE
    // tile formula) — no single-reducer global window even at 10^9
    // customers.
    entry("q_user_segments",
      """WITH u AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,3))) rev, COUNT(*) n_orders
        |           FROM orders GROUP BY 1),
        | d AS (SELECT o_custkey, rev, n_orders, NTILE(10) OVER (ORDER BY rev DESC, o_custkey) decile FROM u)
        |SELECT decile, COUNT(*) n_customers, CAST(CAST(SUM(rev) AS VARCHAR(64)) AS DOUBLE) total_rev,
        |  CAST(SUM(n_orders) AS BIGINT) total_orders,
        |  CAST(MIN(rev) AS DOUBLE) min_rev, CAST(MAX(rev) AS DOUBLE) max_rev
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val u = Tables(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(sum(Exact.dec($"o_totalprice")).as("rev"), count(lit(1)).as("n_orders"))
      Ranking.withGlobalNtile(u, 10, $"rev", primaryAsc = false,
          Seq($"rev".desc, $"o_custkey"), "decile")
        .groupBy($"decile")
        .agg(count(lit(1)).as("n_customers"),
          sum($"rev").cast("double").as("total_rev"),
          sum($"n_orders").as("total_orders"),
          min($"rev").cast("double").as("min_rev"),
          max($"rev").cast("double").as("max_rev"))
        .orderBy($"decile")
    },

    // ---- Digit-distribution audit (Benford-style): first significant
    // digit shares of a monetary column — the fraud/synthetic-data smell
    // test (natural multiplicative data follows log10(1+1/d); this
    // synthetic uniform column visibly does NOT, which is exactly what
    // the audit is for). Decimal-rendered first digit (engine-stable),
    // exact counts, one double division against the broadcast total.
    entry("q_digit_audit",
      """WITH d AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,3)) AS VARCHAR), 1, 1) AS BIGINT) fd FROM orders),
        | c AS (SELECT fd, COUNT(*) n FROM d GROUP BY 1),
        | t AS (SELECT CAST(SUM(n) AS BIGINT) tot FROM c)
        |SELECT fd, n, CAST(n AS DOUBLE)/(SELECT tot FROM t) AS share
        |FROM c ORDER BY fd""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Tables(s, dir, "orders")
        .select(substring(Exact.dec($"o_totalprice").cast("string"), 1, 1)
          .cast("long").as("fd"))
        .groupBy($"fd").agg(count(lit(1)).as("n"))
      val tot = c.agg(sum($"n").as("tot"))
      c.crossJoin(broadcast(tot))
        .select($"fd", $"n", ($"n".cast("double") / $"tot").as("share"))
        .orderBy($"fd")
    },

    // ---- Table digest: an order-independent content checksum (XOR of
    // md5-derived per-row hashes over the key columns) — the replica-
    // comparison primitive: two lakes holding the same rows produce the
    // same digest regardless of file layout, partitioning, or row order,
    // and a single changed row flips it. XOR aggregates map-side with
    // fixed state; unit-separator joints (chr(31)) prevent column-
    // boundary collisions like ('ab','c') vs ('a','bc').
    entry("q_table_digest",
      """WITH h AS (SELECT CAST(('0x' || substr(md5(
        |    CAST(event_id AS VARCHAR) || chr(31) || CAST(user_id AS VARCHAR) || chr(31) || event_type), 1, 15)) AS BIGINT) hv
        |  FROM events)
        |SELECT COUNT(*) n_rows, CAST(bit_xor(hv) AS BIGINT) digest_xor,
        |  CAST(MIN(hv) AS BIGINT) digest_min, CAST(MAX(hv) AS BIGINT) digest_max
        |FROM h""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select(expr(digestHashExpr).as("hv"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(hv)").as("digest_xor"),
          min($"hv").as("digest_min"), max($"hv").as("digest_max"))
    },

    // ---- Referential-integrity audit: orphaned foreign keys counted per
    // relationship — the post-ingest validation a lake needs after
    // independent topic loads (the reference only count-validates against
    // watermarks; this checks CROSS-table consistency). Each check is one
    // left join whose dim side is a distinct key projection; no explicit
    // broadcast hint — at fact-vs-fact framings (orders IS fact-sized) a
    // forced broadcast would OOM, while AQE broadcasts automatically
    // whenever the key projection measures small. A healthy lake reports
    // zeros, and the query IS the assertion.
    entry("q_fk_integrity",
      """SELECT 'lineitem->orders' rel,
        |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) n_orphans,
        |  (SELECT COUNT(*) FROM lineitem) n_rows
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |  (SELECT COUNT(*) FROM orders)
        |ORDER BY rel""".stripMargin) { (s, dir) =>
      import s.implicits._
      // one pass per fact table: a broadcast LEFT join marks orphans and
      // a single aggregate counts rows and null-matched rows together
      def audit(rel: String, fact: org.apache.spark.sql.DataFrame, fk: String,
                dim: org.apache.spark.sql.DataFrame, pk: String) = {
        val keys = dim.select(col(pk).as("_pk")).distinct()
        fact.join(keys, fact(fk) === col("_pk"), "left")
          .agg(count(when(col("_pk").isNull, 1)).as("n_orphans"),
            count(lit(1)).as("n_rows"))
          .select(lit(rel).as("rel"), $"n_orphans", $"n_rows")
      }
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders->customer", o, "o_custkey", c, "c_custkey"))
        .orderBy($"rel")
    },

    // ---- Column profiling: counts, distinct cardinality, and min/max
    // per column — the catalog-facing dataset profile
    // ([[graft.analyze.Analyzer.profile]]). The double column is
    // pre-cast to DECIMAL so min/max render identically in both engines
    // (double→string formatting is engine-specific; decimal→string is
    // not).
    entry("q_data_profile",
      """WITH src AS (SELECT o_custkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,3)) o_totalprice FROM orders),
        | p AS (
        |  SELECT 'o_custkey' col, COUNT(*) n, COUNT(o_custkey) n_nonnull, COUNT(DISTINCT o_custkey) n_distinct,
        |    CAST(MIN(o_custkey) AS VARCHAR) min_v, CAST(MAX(o_custkey) AS VARCHAR) max_v FROM src
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
        |    CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR) FROM src
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
        |    CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR) FROM src)
        |SELECT * FROM p ORDER BY col""".stripMargin) { (s, dir) =>
      import s.implicits._
      val src = Tables(s, dir, "orders")
        .select($"o_custkey", $"o_orderstatus", Exact.dec($"o_totalprice").as("o_totalprice"))
      graft.analyze.Analyzer.profile(src, Seq("o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy($"col")
    },

    // ---- Time-series gap filling: the sparse hourly counts densified
    // onto a complete (event_type × hour) grid with zero-fill — what
    // every downstream rolling/forecast step assumes. The grid generates
    // from one tiny span aggregate (broadcast) × the distinct key list;
    // the left join back is keyed on the grid, so at 100 TB the dense
    // grid is |keys| × |hours| rows (bounded by time, not data volume)
    // and the heavy side stays a pre-aggregated count table.
    entry("q_gap_fill",
      """WITH e AS (SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) h FROM events),
        | span AS (SELECT MIN(h) lo, MAX(h) hi FROM e),
        | grid AS (SELECT t.event_type, g.h
        |          FROM (SELECT DISTINCT event_type FROM e) t
        |          CROSS JOIN (SELECT unnest(generate_series(lo, hi)) h FROM span) g),
        | c AS (SELECT event_type, h, COUNT(*) n FROM e GROUP BY 1,2)
        |SELECT grid.event_type, grid.h AS hour_bucket, COALESCE(c.n, 0) AS n
        |FROM grid LEFT JOIN c ON grid.event_type = c.event_type AND grid.h = c.h
        |ORDER BY grid.event_type, grid.h""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir, "events")
        .select($"event_type", expr("unix_micros(ts) DIV 3600000000").as("h"))
      val span = e.agg(min($"h").as("lo"), max($"h").as("hi"))
      val grid = e.select($"event_type").distinct()
        .crossJoin(broadcast(span))
        .select($"event_type", explode(sequence($"lo", $"hi")).as("hour_bucket"))
      val c = e.groupBy($"event_type".as("c_type"), $"h").agg(count(lit(1)).as("cn"))
      grid.join(c, $"event_type" === $"c_type" && $"hour_bucket" === $"h", "left")
        .select($"event_type", $"hour_bucket", coalesce($"cn", lit(0L)).as("n"))
        .orderBy($"event_type", $"hour_bucket")
    },

    // ---- Spearman rank correlation per group: character length vs token
    // count ranked within language, rho rebuilt from exact integer rank
    // moments (n·Σxy − ΣxΣy over the sqrt product) — one double
    // expression at the end, identical in both engines. Ranks are made
    // UNIQUE by a doc_id tie-break (documented deviation from
    // average-rank Spearman — deterministic across engines, which
    // average ranks of ties also are, but this keeps every moment an
    // integer). Moments accumulate in decimal(38,0) (HUGEINT in the
    // oracle): n·Σxy ~ n⁴, which blows past int64 around 73 K docs per
    // group but is good to ~10^9.5 docs in 38 digits — the per-row
    // products stay in int64 (rank² < 2^63 up to 3·10^9 rows), only the
    // SUMs and the final cross terms widen. One double expression at the
    // very end. Shape: two rank windows per group, then a per-group
    // 5-sum aggregate — rows leaving the window stage are one per doc,
    // rows leaving the aggregate are one per group.
    entry("q_spearman",
      """WITH t AS (SELECT doc_id, lang, n_chars, len(string_split(text,' ')) n_tok FROM documents),
        | rk AS (SELECT lang, doc_id,
        |    RANK() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) rx,
        |    RANK() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) ry
        |  FROM t),
        | m AS (SELECT lang, COUNT(*) n, SUM(CAST(rx AS HUGEINT)) sx, SUM(CAST(ry AS HUGEINT)) sy,
        |    SUM(CAST(rx AS HUGEINT)*ry) sxy, SUM(CAST(rx AS HUGEINT)*rx) sxx, SUM(CAST(ry AS HUGEINT)*ry) syy
        |   FROM rk GROUP BY 1)
        |SELECT lang, n, CAST(n*sxy - sx*sy AS DOUBLE) /
        |  (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS rho
        |FROM m ORDER BY lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.functions.TextFunctions.tokens
      val wx = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
      val wy = Window.partitionBy($"lang").orderBy($"n_tok", $"doc_id")
      val rk = Tables(s, dir, "documents")
        .select($"doc_id", $"lang", $"n_chars", size(tokens("text")).cast("long").as("n_tok"))
        // rank() yields IntegerType — widen to long BEFORE any product,
        // or rx*ry would overflow int32 at ~46K docs/group
        .select($"lang", rank().over(wx).cast("long").as("rx"),
          rank().over(wy).cast("long").as("ry"))
      val m = rk.groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          sum($"rx".cast(Exact.Moment)).as("sx"), sum($"ry".cast(Exact.Moment)).as("sy"),
          sum(($"rx" * $"ry").cast(Exact.Moment)).as("sxy"),
          sum(($"rx" * $"rx").cast(Exact.Moment)).as("sxx"),
          sum(($"ry" * $"ry").cast(Exact.Moment)).as("syy"))
      m.select($"lang", $"n",
          (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
            (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
              sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double")))).as("rho"))
        .orderBy($"lang")
    },

    // ---- Two-sample Kolmogorov–Smirnov drift test, EXACT: the largest
    // gap between the empirical CDFs of document length across two
    // release slices (here the deterministic doc_id parity halves —
    // production compares yesterday's shard against today's) — the
    // distribution-drift gate a corpus build runs before accepting a new
    // crawl, where mean/variance checks miss shape changes. Everything
    // is integer until the final division: the supremum is
    // max |cumA·nB − cumB·nA| over DISTINCT metric values, with the
    // cross-multiplication widened to decimal(38,0)/HUGEINT because
    // cum·n products overflow int64 right at the multi-billion-document
    // scale this gate targets (the q_random_projection accumulation
    // treatment — int64 would wrap silently in Spark and error in
    // DuckDB); one double division at the end, argmax tie-break
    // (smallest value) total. The supremum numerator SURFACES as VARCHAR
    // on both sides: decimals stay intermediates only, because the
    // driver's two decimal128 fetch paths canonicalize differently
    // (two rounds of bit-identical Decimal('6750') locally, hash still
    // red at the driver) — strings cannot diverge under any fetch path. Scale shape: the corpus reduces map-side
    // to the distinct-value space (ONE scan — the sample sizes come from
    // summing the reduced counts, not a second pass) before the
    // running-sum window — O(distinct lengths) rows — and the 1-row
    // n-frame broadcasts.
    entry("q_ks_drift",
      """WITH d AS (SELECT len(string_split(text,' ')) x, doc_id % 2 g FROM documents),
        | c AS (SELECT x, COUNT(CASE WHEN g = 0 THEN 1 END) ca,
        |        COUNT(CASE WHEN g = 1 THEN 1 END) cb FROM d GROUP BY 1),
        | n AS (SELECT CAST(SUM(ca) AS BIGINT) na, CAST(SUM(cb) AS BIGINT) nb FROM c),
        | r AS (SELECT x, CAST(SUM(ca) OVER (ORDER BY x) AS BIGINT) cka,
        |        CAST(SUM(cb) OVER (ORDER BY x) AS BIGINT) ckb FROM c),
        | s AS (SELECT x, abs(CAST(cka AS HUGEINT) * nb - CAST(ckb AS HUGEINT) * na) num
        |       FROM r CROSS JOIN n),
        | m AS (SELECT x, num, ROW_NUMBER() OVER (ORDER BY num DESC, x) rn FROM s)
        |SELECT n.na, n.nb, m.x AS at_x, CAST(m.num AS VARCHAR) AS d_num,
        |  CAST(m.num AS DOUBLE) / CAST(CAST(n.na AS HUGEINT) * n.nb AS DOUBLE) AS ks
        |FROM m CROSS JOIN n WHERE m.rn = 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.functions.TextFunctions.tokens
      val dec = "decimal(38,0)"
      val d = Tables(s, dir, "documents")
        .select(size(tokens("text")).cast("long").as("x"), ($"doc_id" % 2).as("g"))
      val c = d.groupBy($"x").agg(count(when($"g" === 0, 1)).as("ca"),
        count(when($"g" === 1, 1)).as("cb"))
      // sample sizes from the reduced frame — no second corpus scan
      val n = c.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
      // running sums over the DISTINCT value space only (see scaladoc)
      val w = Window.orderBy($"x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = c.select($"x", sum($"ca").over(w).as("cka"), sum($"cb").over(w).as("ckb"))
      val sup = r.crossJoin(broadcast(n))
        .select($"x", $"na", $"nb",
          abs($"cka".cast(dec) * $"nb" - $"ckb".cast(dec) * $"na").cast(dec).as("num"))
      topKRanked(sup, 1, "rn", $"num".desc, $"x".asc)
        .select($"na", $"nb", $"x".as("at_x"), $"num".cast("string").as("d_num"),
          ($"num".cast("double") / ($"na".cast(dec) * $"nb").cast("double")).as("ks"))
    },

    // ---- Path analysis: the most common 3-step event sequences across
    // users (double lag over the per-user timeline) — the n-gram
    // generalization of the transition matrix, behind journey mining and
    // funnel discovery. One window shuffle on user_id produces all
    // trigrams in place; the count collapses to the tiny type³ grid
    // before the top-k.
    entry("q_path_trigrams",
      """WITH o AS (SELECT user_id, event_type c,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) b,
        |    LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) a
        |  FROM events),
        | t AS (SELECT a, b, c, COUNT(*) n FROM o WHERE a IS NOT NULL GROUP BY 1,2,3),
        | r AS (SELECT a, b, c, n, ROW_NUMBER() OVER (ORDER BY n DESC, a, b, c) rk FROM t)
        |SELECT rk, a, b, c, n FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val t = Tables(s, dir, "events")
        .select($"event_type".as("c"),
          lag($"event_type", 1).over(w).as("b"),
          lag($"event_type", 2).over(w).as("a"))
        .filter($"a".isNotNull)
        .groupBy($"a", $"b", $"c").agg(count(lit(1)).as("n"))
      topKRanked(t, 10, "rk", $"n".desc, $"a", $"b", $"c")
        .select($"rk", $"a", $"b", $"c", $"n")
        .orderBy($"rk")
    },

    // ---- Markov transition matrix: per-user consecutive event-type
    // pairs with conditional probabilities — the sequence-statistics
    // table behind next-action models and anomaly scoring. One window
    // shuffle on user_id (lag), then the count aggregate collapses to the
    // tiny (prev, next) grid; row-conditional p is a single double
    // division of exact int64s with the row totals joined back from the
    // same grid (broadcast).
    entry("q_transition_matrix",
      """WITH o AS (SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
        |  FROM events),
        | c AS (SELECT prev, event_type nxt, COUNT(*) n FROM o WHERE prev IS NOT NULL GROUP BY 1,2),
        | tot AS (SELECT prev, CAST(SUM(n) AS BIGINT) tn FROM c GROUP BY 1)
        |SELECT c.prev, c.nxt, c.n, CAST(c.n AS DOUBLE)/tot.tn AS p
        |FROM c JOIN tot ON c.prev = tot.prev ORDER BY c.prev, c.nxt""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val c = Tables(s, dir, "events")
        .select($"user_id", $"event_type", lag($"event_type", 1).over(w).as("prev"))
        .filter($"prev".isNotNull)
        .groupBy($"prev", $"event_type".as("nxt"))
        .agg(count(lit(1)).as("n"))
      val tot = c.groupBy($"prev".as("t_prev")).agg(sum($"n").as("tn"))
      c.join(broadcast(tot), $"prev" === $"t_prev")
        .select($"prev", $"nxt", $"n", ($"n".cast("double") / $"tn").as("p"))
        .orderBy($"prev", $"nxt")
    },

    // ---- Association rules (co-purchase mining): part pairs sharing an
    // order, support-filtered BEFORE the confidence joins — the a-priori
    // pruning that keeps pair mining tractable. Edges come from the
    // shared [[copurchaseEdges]] builder (basket-local pair explosion —
    // no self-join shuffle). Support counts are exact ints; each
    // confidence is one double division. Top-25 by support with
    // deterministic ties.
    entry("q_assoc_rules",
      s"""WITH $copurchaseCte,
        | supp1 AS (SELECT l_partkey, COUNT(*) s FROM items GROUP BY 1),
        | r AS (SELECT pa, pb, pairs.s su, CAST(pairs.s AS DOUBLE)/sa.s conf_ab, CAST(pairs.s AS DOUBLE)/sb.s conf_ba
        |       FROM pairs JOIN supp1 sa ON pa = sa.l_partkey JOIN supp1 sb ON pb = sb.l_partkey)
        |SELECT pa, pb, su, conf_ab, conf_ba FROM r
        |ORDER BY su DESC, pa, pb LIMIT 25""".stripMargin) { (s, dir) =>
      import s.implicits._
      val items = copurchaseItems(s, dir)
      val supp1 = items.groupBy($"l_partkey").agg(count(lit(1)).as("s"))
      val pairs = copurchaseEdges(items)
      val sa = supp1.toDF("sa_key", "sa_s")
      val sb = supp1.toDF("sb_key", "sb_s")
      pairs.join(broadcast(sa), $"pa" === $"sa_key")
        .join(broadcast(sb), $"pb" === $"sb_key")
        .select($"pa", $"pb", $"su",
          ($"su".cast("double") / $"sa_s").as("conf_ab"),
          ($"su".cast("double") / $"sb_s").as("conf_ba"))
        .orderBy($"su".desc, $"pa", $"pb")
        .limit(25)
    },

    // ---- Materialized co-purchase edge table, bucketed: the PRODUCTION
    // answer to the graph family re-deriving the same basket explode per
    // query (q_pagerank / q_label_prop / q_triangle_count / q_bfs_hops /
    // q_degree_audit each pay it once — per-query independence is the
    // harness contract, so nothing may be shared ACROSS queries). Here
    // the edge set is built ONCE, written through
    // [[graft.sources.LakeWriter.writeBucketed]] (hash-clustered +
    // sorted by pa, zstd), and the analysis reads the TABLE: the
    // downstream per-source-node aggregate then runs WITHOUT ANY
    // EXCHANGE (bucketing pre-partitions on the grouping key — the plan
    // shows scan → HashAggregate with no shuffle; BucketJoinSpec proves
    // the same for joins). At 100 TB this is the amortization move: one
    // edge-build shuffle at write time buys every later traversal /
    // degree pass its partitioning for free — raise the bucket count
    // with the cluster, keep it a power of two so downstream engines can
    // coalesce. The oracle rebuilds the same aggregate straight from
    // lineitem, proving the write→read round trip loses nothing.
    entry("q_edge_table",
      s"""WITH $copurchaseCte
        |SELECT pa AS part, CAST(COUNT(*) AS BIGINT) AS out_degree,
        |  CAST(SUM(s) AS BIGINT) AS support_mass
        |FROM pairs GROUP BY 1
        |ORDER BY out_degree DESC, support_mass DESC, part LIMIT 20""".stripMargin) { (s, dir) =>
      import s.implicits._
      val path = edgeTablePath(s)
      graft.sources.LakeWriter.writeBucketed(
        copurchaseEdgesRaw(s, dir), "co_purchase_edges", "pa",
        numBuckets = 16, path = path)
      s.table("co_purchase_edges")
        .groupBy($"pa".as("part"))
        .agg(count(lit(1)).as("out_degree"), sum($"su").as("support_mass"))
        .orderBy($"out_degree".desc, $"support_mass".desc, $"part")
        .limit(20)
    },

    // ---- Triangle counting on the co-purchase graph: the clustering-
    // coefficient / community-density primitive, DEGREE-ORIENTED: each
    // undirected edge points low-degree → high-degree (ties by id), so a
    // node's out-degree is O(√m) and no hub ever fans out a quadratic
    // wedge set — the node-iterator variant that survives power-law
    // graphs (a by-ID orientation would hand a celebrity node its full
    // neighborhood²). Every triangle has exactly ONE apex in orientation
    // order (two out-edges, and exactly one directed edge between its
    // endpoints), so two equi-joins count each triangle once; the
    // reported apex is the by-ID minimum, which is orientation-
    // independent — the oracle states the same count/apex declaratively
    // with the simple a < b < c form.
    entry("q_triangle_count",
      s"""WITH $copurchaseCte,
        | tri AS (SELECT e1.pa a, e1.pb b, e2.pb c
        |         FROM pairs e1 JOIN pairs e2 ON e1.pb = e2.pa
        |         JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |SELECT COUNT(*) AS n_triangles, COUNT(DISTINCT a) AS n_apex FROM tri""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pairs = copurchaseEdgesRaw(s, dir).select($"pa", $"pb")
      val deg = pairs.select($"pa".as("node")).unionAll(pairs.select($"pb".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("dg"))
      val da = deg.toDF("na", "dega")
      val db = deg.toDF("nb", "degb")
      // builder emits pa < pb, so the tie-break keeps (pa → pb)
      val directed = pairs
        .join(da, $"pa" === $"na").join(db, $"pb" === $"nb")
        .select(when($"dega" < $"degb" || ($"dega" === $"degb" && $"pa" < $"pb"),
            struct($"pa".as("src"), $"pb".as("dst")))
          .otherwise(struct($"pb".as("src"), $"pa".as("dst"))).as("e"))
        .select($"e.src", $"e.dst")
      val e1 = directed.toDF("u", "v")
      val e2 = directed.toDF("e2u", "w")
      val e3 = directed.toDF("e3s", "e3d")
      e1.join(e2, $"u" === $"e2u" && $"v" =!= $"w")
        .join(e3, $"e3s" === $"v" && $"e3d" === $"w")
        .agg(count(lit(1)).as("n_triangles"),
          countDistinct(least($"u", $"v", $"w")).as("n_apex"))
    },

    // ---- PageRank on the co-purchase graph (top-20 nodes after 3
    // damped iterations, d = 0.85): the graph-centrality primitive behind
    // seed-quality scoring and crawl prioritization. INTEGER-LATTICE
    // ranks: the whole computation runs in int64 fixed point (initial
    // mass 10^12 // N per node, contribution = rank // out-degree,
    // damping = ×85 // 100 — integer division throws away sub-unit
    // remainders, documented mass leak ≪ 1e-9 of total) because rank
    // updates SUM over in-neighbors, and double addition is order-
    // dependent across engines/partitionings — the same order-free-int-
    // sum contract as q_bm25. The oracle unrolls the 3 iterations as
    // CTEs; both engines walk the identical lattice, so equality is
    // exact, not approximate. Scale shape: the degree column is joined
    // into the static edge list ONCE before the loop, so each iteration
    // is one node-keyed equi-join (rank frame joins edges, both
    // node/edge-sized — unhinted, AQE decides; a forced broadcast of the
    // rank frame would OOM exactly at scale) plus one map-side-partial
    // aggregate; the symmetric co-purchase graph has no dangling nodes,
    // so no dangling-mass redistribution term is needed. Production
    // N-iteration runs flatten lineage through the Checkpoints registry
    // every few rounds (the q_dedup_clusters / KMeans.Fit treatment);
    // at 3 unrolled iterations the composed plan is the better trade.
    entry("q_pagerank",
      s"""WITH $copurchaseCte,
        | e AS MATERIALIZED (SELECT pa u, pb v FROM pairs UNION ALL SELECT pb u, pa v FROM pairs),
        | deg AS (SELECT u, COUNT(*) d FROM e GROUP BY 1),
        | nn AS (SELECT COUNT(*) n FROM deg),
        | base AS (SELECT ((1000000000000 // n) * 15) // 100 b, 1000000000000 // n r0 FROM nn),
        | e2 AS (SELECT e.u, e.v, deg.d FROM e JOIN deg ON deg.u = e.u),
        | r1 AS (SELECT e2.v u, CAST(base.b + (85 * SUM(base.r0 // e2.d)) // 100 AS BIGINT) r
        |        FROM e2 CROSS JOIN base GROUP BY e2.v, base.b),
        | r2 AS (SELECT e2.v u, CAST(base.b + (85 * SUM(r1.r // e2.d)) // 100 AS BIGINT) r
        |        FROM e2 JOIN r1 ON r1.u = e2.u CROSS JOIN base GROUP BY e2.v, base.b),
        | r3 AS (SELECT e2.v u, CAST(base.b + (85 * SUM(r2.r // e2.d)) // 100 AS BIGINT) r
        |        FROM e2 JOIN r2 ON r2.u = e2.u CROSS JOIN base GROUP BY e2.v, base.b),
        | top AS (SELECT u, r, ROW_NUMBER() OVER (ORDER BY r DESC, u) rn FROM r3)
        |SELECT CAST(rn AS BIGINT) rn, u AS node, r AS rank_fp
        |FROM top WHERE rn <= 20 ORDER BY rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pairs = copurchaseEdgesRaw(s, dir).select($"pa", $"pb")
      val e = pairs.select($"pa".as("u"), $"pb".as("v"))
        .unionAll(pairs.select($"pb".as("u"), $"pa".as("v")))
      val deg = e.groupBy($"u").agg(count(lit(1)).as("d"))
      // degree folded into the static edge list once, outside the loop,
      // and CHECKPOINTED: three iterations reference this subtree, and
      // without the checkpoint each would re-run the basket explode +
      // two shuffles (AQE exchange reuse is best-effort, not a contract);
      // the registry releases the blocks after the harness materializes
      // the query (the KMeans.fit / ConnectedComponents treatment)
      val e2 = graft.functions.Checkpoints.lazyLocal(
        e.join(deg.toDF("du", "d"), $"u" === $"du").select($"u", $"v", $"d"))
      // N and the damping constants are DRIVER-SIDE scalars, read from
      // the checkpointed frame (one bounded job): the former 1-row
      // `base` frame derived from deg's UN-checkpointed lineage, so its
      // broadcast re-ran the whole basket explode a second time, and its
      // three crossJoin(broadcast(…)) uses each paid a broadcast
      // exchange. max(1,·) only guards the n=0 division — the rank
      // frames are empty then regardless of the constants.
      val n = math.max(1L, e2.select($"u").distinct().count())
      val r0v = 1000000000000L / n // all positive: Long / == floor == DIV
      val bv = (r0v * 15L) / 100L
      val r1 = e2.groupBy($"v").agg(sum(expr(s"$r0v DIV d")).as("c"))
        .select($"v".as("u"), (lit(bv) + expr("(85 * c) DIV 100")).as("r"))
      def step(r: org.apache.spark.sql.DataFrame) =
        e2.join(r.toDF("ru", "rr"), $"u" === $"ru")
          .groupBy($"v").agg(sum(expr("rr DIV d")).as("c"))
          .select($"v".as("u"), (lit(bv) + expr("(85 * c) DIV 100")).as("r"))
      val r3 = step(step(r1))
      topKRanked(r3, 20, "rn", $"r".desc, $"u".asc)
        .select($"rn".cast("long").as("rn"), $"u".as("node"), $"r".as("rank_fp"))
        .orderBy($"rn")
    },

    // ---- Bounded-frontier BFS: minimum hop distance from a seed set
    // (every 100th node) over the co-purchase graph, 3 synchronous
    // min-plus rounds — the reachability/traversal semantics the
    // sum-aggregation graph family (q_pagerank's weighted sums,
    // q_label_prop's votes) doesn't cover: each round is
    // hop(v) = min(hop(v), min over in-neighbors u of hop(u)+1), the
    // tropical-semiring step behind shortest-path, blast-radius and
    // k-hop-neighborhood queries. All-integer, deterministic (MIN is
    // order-free). Scale shape per round: ONE node-keyed equi-join of
    // the current distance frame against the static edge list + a
    // map-side-combined MIN aggregate — the frontier frame never
    // exceeds |reachable nodes| rows, and the unrolled depth bounds the
    // iteration exactly like the oracle's CTE chain. The edge list is
    // checkpointed once outside the loop (the q_pagerank treatment),
    // and so is EVERY round's distance frame: the frame feeds both arms
    // of the next round (carry-over union + relax join), so leaving it
    // as a plan doubles the subtree per round.
    entry("q_bfs_hops",
      s"""WITH $copurchaseCte,
        | e AS MATERIALIZED (SELECT pa u, pb v FROM pairs UNION ALL SELECT pb u, pa v FROM pairs),
        | seeds AS (SELECT DISTINCT u FROM e WHERE u % 100 = 0),
        | r1 AS (SELECT u, CAST(0 AS BIGINT) hop FROM seeds
        |        UNION ALL SELECT e.v, 1 FROM e JOIN seeds ON e.u = seeds.u),
        | m1 AS MATERIALIZED (SELECT u, MIN(hop) hop FROM r1 GROUP BY 1),
        | r2 AS (SELECT u, hop FROM m1
        |        UNION ALL SELECT e.v, m1.hop + 1 FROM e JOIN m1 ON e.u = m1.u),
        | m2 AS MATERIALIZED (SELECT u, MIN(hop) hop FROM r2 GROUP BY 1),
        | r3 AS (SELECT u, hop FROM m2
        |        UNION ALL SELECT e.v, m2.hop + 1 FROM e JOIN m2 ON e.u = m2.u),
        | m3 AS (SELECT u, MIN(hop) hop FROM r3 GROUP BY 1)
        |SELECT u AS node, hop FROM m3 ORDER BY node""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pairs = copurchaseEdgesRaw(s, dir).select($"pa", $"pb")
      val e = graft.functions.Checkpoints.lazyLocal(
        pairs.select($"pa".as("u"), $"pb".as("v"))
          .unionAll(pairs.select($"pb".as("u"), $"pa".as("v"))))
      val seeds = e.select($"u").filter($"u" % 100 === 0).distinct()
        .select($"u", lit(0L).as("hop"))
      // `m` appears TWICE per round (carry-over union + relax join), so an
      // unchecked r-round chain recomputes round i's frame 2^(r−i) times —
      // checkpoint each round's distance frame to keep the plan linear in
      // rounds. At sf0.1 the two shapes time the same (AQE broadcasts the
      // small frontier, so recompute is cheap); at scale the frontier is
      // graph-sized and recompute means re-running every prior round's
      // shuffles. The registry releases after the harness materializes
      // the query.
      def step(m: org.apache.spark.sql.DataFrame) =
        graft.functions.Checkpoints.lazyLocal(
          m.unionAll(
              e.join(m.toDF("mu", "mhop"), $"u" === $"mu")
                .select($"v".as("u"), ($"mhop" + 1).as("hop")))
            .groupBy($"u").agg(min($"hop").as("hop")))
      step(step(step(seeds)))
        .select($"u".as("node"), $"hop")
        .orderBy($"node")
    },

    // ---- Semi-supervised label propagation on the co-purchase graph
    // (2 synchronous rounds, seeds clamped): sparse ground-truth labels
    // (here: every 10th node, labeled node mod 3) spread to unlabeled
    // neighbors by support-weighted majority vote with a deterministic
    // tie-break (weight DESC, label ASC) — the cheap label-densification
    // pass behind weak supervision and community assignment. Everything
    // is integer (votes sum int64 edge supports), so both engines agree
    // exactly; the oracle unrolls both rounds as CTEs. Scale shape: per
    // round ONE node-keyed equi-join (labels ⋈ edges, both graph-sized —
    // unhinted, AQE decides) + one map-side-partial vote aggregate + a
    // per-node argmax window over ≤ |labels| vote rows; seeds re-clamp
    // via anti-join. Production N-round runs flatten lineage through the
    // Checkpoints registry (the q_pagerank note).
    entry("q_label_prop",
      s"""WITH $copurchaseCte,
        | e AS MATERIALIZED (SELECT pa u, pb v, s w FROM pairs UNION ALL SELECT pb u, pa v, s w FROM pairs),
        | nodes AS (SELECT DISTINCT u FROM e),
        | seeds AS (SELECT u, u % 3 lbl FROM nodes WHERE u % 10 = 0),
        | v1 AS (SELECT e.v node, l.lbl, CAST(SUM(e.w) AS BIGINT) w
        |        FROM e JOIN seeds l ON l.u = e.u GROUP BY 1, 2),
        | b1 AS (SELECT node, lbl FROM (SELECT node, lbl, ROW_NUMBER() OVER
        |         (PARTITION BY node ORDER BY w DESC, lbl) rn FROM v1) t WHERE rn = 1),
        | l1 AS (SELECT u, lbl FROM seeds UNION ALL
        |        SELECT b1.node u, b1.lbl FROM b1 LEFT JOIN seeds ON seeds.u = b1.node
        |        WHERE seeds.u IS NULL),
        | v2 AS (SELECT e.v node, l.lbl, CAST(SUM(e.w) AS BIGINT) w
        |        FROM e JOIN l1 l ON l.u = e.u GROUP BY 1, 2),
        | b2 AS (SELECT node, lbl FROM (SELECT node, lbl, ROW_NUMBER() OVER
        |         (PARTITION BY node ORDER BY w DESC, lbl) rn FROM v2) t WHERE rn = 1),
        | l2 AS (SELECT u, lbl FROM seeds UNION ALL
        |        SELECT b2.node u, b2.lbl FROM b2 LEFT JOIN seeds ON seeds.u = b2.node
        |        WHERE seeds.u IS NULL)
        |SELECT n.u AS node, l2.lbl AS label, seeds.u IS NOT NULL AS is_seed
        |FROM nodes n LEFT JOIN l2 ON l2.u = n.u LEFT JOIN seeds ON seeds.u = n.u
        |ORDER BY node""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pairs = copurchaseEdgesRaw(s, dir)
      // four consumers (two vote rounds, the node set, the seed slice)
      // reference the symmetric edge list — checkpoint it once so the
      // basket explode never re-runs (the q_pagerank treatment)
      val e = graft.functions.Checkpoints.lazyLocal(
        pairs.select($"pa".as("u"), $"pb".as("v"), $"su".as("w"))
          .unionAll(pairs.select($"pb".as("u"), $"pa".as("v"), $"su".as("w"))))
      val nodes = e.select($"u").distinct()
      val seeds = nodes.filter($"u" % 10 === 0).select($"u", ($"u" % 3).as("lbl"))
      def round(l: org.apache.spark.sql.DataFrame) = {
        val wv = Window.partitionBy($"node").orderBy($"w".desc, $"lbl".asc)
        val best = e.join(l.toDF("lu", "lbl"), $"u" === $"lu")
          .groupBy($"v".as("node"), $"lbl").agg(sum($"w").as("w"))
          .withColumn("rn", row_number().over(wv)).filter($"rn" === 1)
          .select($"node", $"lbl")
        seeds.unionAll(
          best.join(seeds.select($"u".as("su")), $"node" === $"su", "left_anti")
            .select($"node".as("u"), $"lbl"))
      }
      val l2 = round(round(seeds))
      nodes
        .join(l2.toDF("lu", "label"), $"u" === $"lu", "left")
        .join(seeds.select($"u".as("su"), $"lbl"), $"u" === $"su", "left")
        .select($"u".as("node"), $"label", $"su".isNotNull.as("is_seed"))
        .orderBy($"node")
    },

    // ---- Degree-distribution audit of the co-purchase graph: node
    // count, cumulative node count and share per degree value — the
    // power-law health check run before any graph algorithm is costed
    // (it is what justifies q_triangle_count's degree orientation and
    // predicts hub skew for the join planner). The histogram reduces to
    // DISTINCT DEGREE VALUES before the running-sum window, so the
    // window's single partition holds O(max_degree) rows — a few
    // thousand on a power-law graph at any corpus scale — never the
    // node set; share is one double division of exact ints.
    entry("q_degree_stats",
      s"""WITH $copurchaseCte,
        | e AS MATERIALIZED (SELECT pa u FROM pairs UNION ALL SELECT pb FROM pairs),
        | deg AS (SELECT u, COUNT(*) d FROM e GROUP BY 1),
        | h AS (SELECT d, COUNT(*) n_nodes FROM deg GROUP BY 1),
        | nn AS (SELECT CAST(SUM(n_nodes) AS BIGINT) n FROM h)
        |SELECT d AS degree, n_nodes,
        |  CAST(SUM(n_nodes) OVER (ORDER BY d) AS BIGINT) cum_nodes,
        |  CAST(n_nodes AS DOUBLE) / nn.n AS share
        |FROM h CROSS JOIN nn ORDER BY degree""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pairs = copurchaseEdgesRaw(s, dir)
      val deg = pairs.select($"pa".as("u")).unionAll(pairs.select($"pb".as("u")))
        .groupBy($"u").agg(count(lit(1)).as("d"))
      val h = deg.groupBy($"d").agg(count(lit(1)).as("n_nodes"))
      // node total from the reduced histogram — no second pass over deg
      val nn = h.agg(sum($"n_nodes").as("n"))
      // global window over distinct degree values only (see scaladoc)
      val w = Window.orderBy($"d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.crossJoin(broadcast(nn))
        .select($"d".as("degree"), $"n_nodes",
          sum($"n_nodes").over(w).as("cum_nodes"),
          ($"n_nodes".cast("double") / $"n").as("share"))
        .orderBy($"degree")
    },

    // ---- SCD type-2 dimension history: collapse each user's event
    // stream into validity intervals of its event_type (valid_from /
    // valid_to / is_current), the lakehouse pattern for tracking
    // attribute changes over time — gaps-and-islands via the classic
    // change-flag + running-sum grouping. The running change-sum `grp`
    // IS the per-user interval sequence (1, 2, …), and every later
    // ordering uses it: valid_from alone is NOT a total order when
    // adjacent intervals share a timestamp (same-µs events of different
    // types), and a non-total LEAD/sort order is exactly the cross-
    // engine row-order trap the event_id tie-breaks elsewhere in this
    // file exist for. Scale shape: ONE shuffle keyed on user_id feeds
    // every window (lag, running sum, lead all share the same
    // partitioning — Spark plans a single Exchange), the interval
    // aggregate reuses it, and per-user timelines are bounded, so no
    // partition ever exceeds a user's own history.
    entry("q_scd2",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
        |  FROM events),
        | s AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END chg FROM o),
        | g AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS UNBOUNDED PRECEDING) grp FROM s),
        | iv AS (SELECT user_id, event_type, grp, MIN(ts) valid_from,
        |         COUNT(*) n_events FROM g GROUP BY 1, 2, 3),
        | f AS (SELECT user_id, event_type, grp, valid_from, n_events,
        |         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp) valid_to
        |       FROM iv)
        |SELECT user_id, CAST(grp AS BIGINT) AS interval_seq, event_type,
        |  epoch_us(valid_from) AS valid_from_us,
        |  epoch_us(valid_to) AS valid_to_us,
        |  valid_to IS NULL AS is_current, n_events
        |FROM f ORDER BY user_id, interval_seq""".stripMargin) { (s, dir) =>
      import s.implicits._
      val wo = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wg = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wl = Window.partitionBy($"user_id").orderBy($"grp")
      Tables(s, dir, "events")
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("prev", lag($"event_type", 1).over(wo))
        .withColumn("chg", when($"prev".isNull || $"prev" =!= $"event_type", 1).otherwise(0))
        .withColumn("grp", sum($"chg").over(wg))
        .groupBy($"user_id", $"event_type", $"grp")
        .agg(min($"ts").as("valid_from"), count(lit(1)).as("n_events"))
        .withColumn("valid_to", lead($"valid_from", 1).over(wl))
        // intervals surface as epoch-µs int64 (the repo's timestamp-output
        // convention: parquet/arrow unit annotations differ across engines,
        // integer µs compare exactly)
        .select($"user_id", $"grp".cast("long").as("interval_seq"), $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"valid_to".isNull.as("is_current"), $"n_events")
        .orderBy($"user_id", $"interval_seq")
    },

    // ---- CDC apply / last-writer-wins upsert: materialize the current
    // snapshot of a keyed table from an ordered changelog — the lakehouse
    // MERGE-INTO pattern (reference scope: its lake only ever appends;
    // this is the mutation-log counterpart a warehouse needs). The events
    // stream is read as a per-user change feed ordered by (ts, event_id)
    // — event_id is globally unique, so the order is total — where
    // 'error' rows are tombstones: a key whose LAST change is a tombstone
    // is absent from the snapshot. Implemented as ONE key-shuffled
    // aggregation with a max_by(payload, struct(ts, event_id)) last-row
    // reduction — partial aggregation collapses each map partition to one
    // candidate per key BEFORE the shuffle, so a 100-TB changelog with a
    // bounded key space moves only |keys|·width per map task, where the
    // oracle's ROW_NUMBER formulation (same semantics) would shuffle and
    // sort EVERY change row. Tombstone filtering happens AFTER the
    // reduction (the last row decides), never as a pre-filter — a delete
    // followed by a re-insert must survive.
    entry("q_cdc_upsert",
      """WITH r AS (SELECT user_id, event_type, value, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |  FROM events),
        | a AS (SELECT user_id, COUNT(*) n_versions,
        |    COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) n_deletes
        |  FROM events GROUP BY 1)
        |SELECT r.user_id, CAST(a.n_versions AS BIGINT) AS n_versions,
        |  CAST(a.n_deletes AS BIGINT) AS n_deletes,
        |  r.event_type AS last_type, r.value AS last_value,
        |  epoch_us(r.ts) AS last_ts_us
        |FROM r JOIN a USING (user_id)
        |WHERE rn = 1 AND r.event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_versions"),
          coalesce(sum(when($"event_type" === "error", 1L)), lit(0L)).as("n_deletes"),
          max_by(struct($"event_type", $"value", $"ts"),
            struct($"ts", $"event_id")).as("last"))
        .filter($"last.event_type" =!= "error")
        .select($"user_id", $"n_versions", $"n_deletes",
          $"last.event_type".as("last_type"), $"last.value".as("last_value"),
          unix_micros($"last.ts").as("last_ts_us"))
        .orderBy($"user_id")
    },

    // ---- Range-frame rolling aggregate: per-user trailing-1 h event
    // count and exact value sum AT EVERY event — the time-decayed feature
    // shape (rate limits, burst detection, rolling engagement). A RANGE
    // frame over the integer µs epoch includes ties identically in both
    // engines; the sum accumulates in decimal and surfaces as one double.
    // Shape: ONE window shuffle keyed on user_id; the frame is evaluated
    // by Spark's sliding-window accumulator (O(n) per partition, not
    // O(n·frame)).
    entry("q_rolling_range",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) us, CAST(value AS DECIMAL(18,3)) v FROM events)
        |SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables(s, dir, "events")
        .select($"event_id", $"user_id", $"ts", Exact.dec($"value").as("v"))
        .select($"event_id", $"user_id",
          count(lit(1)).over(w).as("n_1h"),
          sum($"v").over(w).cast("double").as("sum_1h"))
        .orderBy($"event_id")
    },

    // ---- Unpivot (wide → long): per-flag aggregates melted into
    // (metric, value) rows via `stack` — the inverse of q_pivot, used to
    // normalize wide stats tables for storage or plotting. The melt is a
    // zero-shuffle generator over the already-aggregated wide table.
    entry("q_unpivot",
      """WITH w AS (SELECT l_returnflag,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE) sum_qty,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE) sum_price,
        |    CAST(COUNT(*) AS DOUBLE) n_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, val FROM w
        |UNPIVOT (val FOR metric IN (sum_qty, sum_price, n_rows))
        |ORDER BY l_returnflag, metric""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(Exact.dsum($"l_quantity").as("sum_qty"),
          Exact.dsum($"l_extendedprice").as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
        .selectExpr("l_returnflag",
          "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, 'n_rows', n_rows) AS (metric, val)")
        .orderBy($"l_returnflag", $"metric")
    },

    // ---- Funnel analysis: users progressing view → click → purchase,
    // each step strictly after the previous and within 12 h of it — the
    // ordered-sequence conversion metric. Each step is one user-keyed
    // MIN-aggregate plus an equi-join back to the event stream; after the
    // first shuffle on user_id every later stage is co-partitioned, so at
    // 100 TB the funnel costs one shuffle of the events table, not one
    // per step, and no per-user window over the full history. Interval
    // arithmetic is integer µs — exact in both engines.
    entry("q_funnel",
      """WITH s1 AS (SELECT user_id, MIN(ts) t1 FROM events WHERE event_type='view' GROUP BY 1),
        | s2 AS (SELECT e.user_id, MIN(e.ts) t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
        |        WHERE e.event_type='click' AND e.ts > s1.t1
        |          AND epoch_us(e.ts) - epoch_us(s1.t1) <= 43200000000 GROUP BY 1),
        | s3 AS (SELECT e.user_id, MIN(e.ts) t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
        |        WHERE e.event_type='purchase' AND e.ts > s2.t2
        |          AND epoch_us(e.ts) - epoch_us(s2.t2) <= 43200000000 GROUP BY 1)
        |SELECT 'step1_view' step, COUNT(*) n_users FROM s1
        |UNION ALL SELECT 'step2_click', COUNT(*) FROM s2
        |UNION ALL SELECT 'step3_purchase', COUNT(*) FROM s3
        |ORDER BY step""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val winUs = 43200000000L // 12 h in µs
      val s1 = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
        .filter($"ts" > $"t1" &&
          unix_micros($"ts") - unix_micros($"t1") <= winUs)
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"ts" > $"t2" &&
          unix_micros($"ts") - unix_micros($"t2") <= winUs)
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      def cnt(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n_users")).select(lit(tag).as("step"), $"n_users")
      cnt(s1, "step1_view")
        .unionByName(cnt(s2, "step2_click"))
        .unionByName(cnt(s3, "step3_purchase"))
        .orderBy($"step")
    },

    // ---- Cohort retention: users bucketed by first-seen day, activity
    // counted as distinct users per (cohort_day, day_offset) — the
    // retention-curve table. Day buckets are integer floor-divisions of
    // the µs epoch (exact both engines). Shape: one user-keyed MIN
    // aggregate, one co-partitioned join back (both sides hashed on
    // user_id), one distinct + count on the tiny (cohort, offset) grid.
    entry("q_cohort",
      """WITH f AS (SELECT user_id, CAST(epoch_us(MIN(ts)) // 86400000000 AS BIGINT) cohort_day
        |           FROM events GROUP BY 1),
        | a AS (SELECT DISTINCT e.user_id, f.cohort_day,
        |        CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort_day AS day_offset
        |       FROM events e JOIN f ON e.user_id = f.user_id)
        |SELECT cohort_day, day_offset, COUNT(*) n_users FROM a
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val f = ev.groupBy($"user_id".as("f_user"))
        .agg(expr("unix_micros(MIN(ts)) DIV 86400000000").as("cohort_day"))
      ev.select($"user_id", expr("unix_micros(ts) DIV 86400000000").as("day"))
        .join(f, $"user_id" === $"f_user")
        .select($"user_id", $"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
        .distinct()
        .groupBy($"cohort_day", $"day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort_day", $"day_offset")
    },

    // ---- Blocked fuzzy matching: near-identical part names found by
    // Levenshtein distance ≤ 2 on the adjective, blocked on the noun —
    // the entity-resolution shape (block key cuts the quadratic pair
    // space to within-block pairs). Dedup-to-distinct-names runs FIRST,
    // so the pair join sees |distinct names|, not |parts| (64 vs 2000
    // here; the same orders-of-magnitude cut at 100 TB). Levenshtein is
    // the classic integer DP in both engines — no tolerance needed.
    entry("q_fuzzy_match",
      """WITH names AS (SELECT p_name, string_split(p_name,' ')[1] adj, string_split(p_name,' ')[2] noun,
        |                 COUNT(*) n_parts FROM part GROUP BY 1,2,3),
        | pairs AS (SELECT a.p_name a_name, b.p_name b_name, levenshtein(a.adj, b.adj) dist,
        |             a.n_parts a_parts, b.n_parts b_parts
        |           FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
        |           WHERE levenshtein(a.adj, b.adj) <= 2)
        |SELECT a_name, b_name, dist, a_parts, b_parts FROM pairs
        |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val names = Tables(s, dir, "part")
        .groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
        .select($"p_name", split($"p_name", " ")(0).as("adj"),
          split($"p_name", " ")(1).as("noun"), $"n_parts")
      val a = names.toDF("a_name", "a_adj", "noun", "a_parts") // fresh names: self-join
      val b = names.toDF("b_name", "b_adj", "b_noun", "b_parts")
      a.join(b, $"noun" === $"b_noun" && $"a_name" < $"b_name")
        .withColumn("dist", levenshtein($"a_adj", $"b_adj"))
        .filter($"dist" <= 2)
        .select($"a_name", $"b_name", $"dist", $"a_parts", $"b_parts")
        .orderBy($"a_name", $"b_name")
    },

    // ---- Two-phase salted aggregation: the skew-proof rollup. Phase 1
    // aggregates on (key, salt = event_id % 16) so one hot key spreads
    // over 16 reducers; phase 2 merges the 16 partials per key. Decimal
    // partial sums re-aggregate exactly (addition is associative), so the
    // oracle is the PLAIN one-phase GROUP BY — the salting must be
    // invisible in the result. This is the aggregation twin of
    // q_join_salted; with AQE skew handling off or a pathological key,
    // it is the shape that keeps a 100 TB rollup from stalling on one
    // reducer.
    entry("q_agg_salted",
      """SELECT event_type, COUNT(*) n, CAST(CAST(SUM(CAST(value AS DECIMAL(18,3))) AS VARCHAR(64)) AS DOUBLE) sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("_salt", pmod($"event_id", lit(16L)))
        .groupBy($"event_type", $"_salt")
        .agg(count(lit(1)).as("pn"), sum(Exact.dec($"value")).as("psum"))
        .groupBy($"event_type")
        .agg(sum($"pn").as("n"), sum($"psum").cast("double").as("sum_value"))
        .orderBy($"event_type")
    },

    // ---- Trimmed (10-90) robust mean — the outlier-resistant center a
    // metrics pipeline reports next to the MAD fence counts: drop rows
    // outside the group's [p10, p90] interpolated fences, average the
    // rest. Exactness: values are integer mils, the trimmed SUM is
    // exact int64 (only ever integers pass the fence test — comparing
    // int64 against the interpolated double fence is exact), and the
    // mean is two double divisions written identically in both engines;
    // fences use the same percentile/quantile_cont interpolation parity
    // q_percentile pins. Scale: the exact-percentile reducer buffering
    // is the q_mad_outliers bounded-scale contract (3 domain-bounded
    // groups); the 100 TB path swaps in the mergeable QuantileSketch
    // exactly as q_mad_outliers_sketch demonstrates. The fences frame is
    // one row per flag — domain-bounded, so its broadcast hint is
    // legitimate (same as q_mad_outliers).
    entry("q_trimmed_stats",
      """WITH v AS (SELECT l_returnflag, CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 1000 AS BIGINT) pm FROM lineitem),
        | f AS (SELECT l_returnflag flag, quantile_cont(pm, 0.1) lo, quantile_cont(pm, 0.9) hi FROM v GROUP BY 1)
        |SELECT v.l_returnflag, COUNT(*) n_rows,
        |  COUNT(CASE WHEN v.pm >= f.lo AND v.pm <= f.hi THEN 1 END) n_kept,
        |  CAST(CAST(SUM(CASE WHEN v.pm >= f.lo AND v.pm <= f.hi THEN v.pm END) AS VARCHAR(64)) AS DOUBLE)
        |    / COUNT(CASE WHEN v.pm >= f.lo AND v.pm <= f.hi THEN 1 END) / 1000 trimmed_mean,
        |  f.lo / 1000 lo_fence, f.hi / 1000 hi_fence
        |FROM v JOIN f ON v.l_returnflag = f.flag
        |GROUP BY v.l_returnflag, f.lo, f.hi ORDER BY v.l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.functions.Robust
      val v = Tables(s, dir, "lineitem")
        .select($"l_returnflag", (Exact.dec($"l_extendedprice") * 1000).cast("long").as("pm"))
      Robust.trimmedStats(v, "l_returnflag", "pm", loQ = 0.1, hiQ = 0.9,
          mode = Robust.Mode.Exact)
        .select($"l_returnflag", $"n_rows", $"n_kept",
          ($"trimmed_mean" / 1000).as("trimmed_mean"),
          ($"lo_fence" / 1000).as("lo_fence"), ($"hi_fence" / 1000).as("hi_fence"))
        .orderBy($"l_returnflag")
    },

    // ---- Sketch twin of q_trimmed_stats — the 100 TB path, completing
    // the exact/sketch pair for every exact-percentile query (the
    // q_mad_outliers / q_mad_outliers_sketch pattern). The [p10, p90]
    // fences come from the mergeable
    // [[graft.functions.Sketches.QuantileSketch]] (O(k·log n) doubles of
    // aggregation state per group, map-side partials — no reducer ever
    // buffers a group), while the trimmed SUM over kept rows stays EXACT
    // int64: the sketch only moves the fences, never the arithmetic
    // inside them. Sketch fences are implementation-specific → rows-only
    // driver check; SketchSpec bounds the drift against the exact twin.
    entryNoOracle("q_trimmed_stats_sketch") { (s, dir) =>
      import s.implicits._
      import graft.functions.Robust
      val v = Tables(s, dir, "lineitem")
        .select($"l_returnflag", (Exact.dec($"l_extendedprice") * 1000).cast("long").as("pm"))
      Robust.trimmedStats(v, "l_returnflag", "pm", loQ = 0.1, hiQ = 0.9,
          mode = Robust.Mode.Sketch)
        .select($"l_returnflag", $"n_rows", $"n_kept",
          ($"trimmed_mean" / 1000).as("trimmed_mean"),
          ($"lo_fence" / 1000).as("lo_fence"), ($"hi_fence" / 1000).as("hi_fence"))
        .orderBy($"l_returnflag")
    },

    // ---- Per-group linear trend (least-squares slope/intercept/R²) of
    // the daily event count over the day index — the "is this stream
    // growing or decaying" fit a volume monitor runs per event type.
    // Exactness is the q_spearman treatment: x (epoch day) and y (daily
    // count) are int64, the five regression moments accumulate in
    // decimal(38,0)/HUGEINT (k·Σxy ~ k·x·y·k blows past int64 around
    // 10^10 daily rows; per-row products stay in int64 — day² < 2^63
    // through year ~10⁵), and slope/intercept/R² are the SAME double
    // expressions over cross-term differences in both engines (IEEE ops
    // on identical inputs — no accumulation-order exposure because the
    // sums are exact integers). k ≥ 2 filter: a one-day group has zero
    // x-variance, and with k ≥ 2 distinct days Sxx > 0 always; the R²
    // denominator alone can still go void (all daily counts equal) and
    // is CASE-guarded identically. Scale shape: the (type × day) count
    // is one map-side-combined shuffle bounded by |types|·|days| (time-
    // bounded, not volume-bounded); the moments pass aggregates THAT —
    // per-group state is five decimals, rows out are one per type.
    entry("q_regr_trend",
      """WITH d AS (SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events),
        | c AS (SELECT event_type, day, COUNT(*) n FROM d GROUP BY 1,2),
        | m AS (SELECT event_type, COUNT(*) k,
        |    SUM(CAST(day AS HUGEINT)) sx, SUM(CAST(n AS HUGEINT)) sy,
        |    SUM(CAST(day AS HUGEINT)*n) sxy, SUM(CAST(day AS HUGEINT)*day) sxx,
        |    SUM(CAST(n AS HUGEINT)*n) syy
        |   FROM c GROUP BY 1 HAVING COUNT(*) >= 2)
        |SELECT event_type, k AS n_days,
        |  CAST(k*sxy - sx*sy AS DOUBLE) / CAST(k*sxx - sx*sx AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE) - CAST(k*sxy - sx*sy AS DOUBLE) / CAST(k*sxx - sx*sx AS DOUBLE)
        |     * CAST(sx AS DOUBLE)) / k AS intercept,
        |  CASE WHEN k*syy - sy*sy = 0 THEN NULL
        |       ELSE CAST(k*sxy - sx*sy AS DOUBLE) * CAST(k*sxy - sx*sy AS DOUBLE)
        |         / (CAST(k*sxx - sx*sx AS DOUBLE) * CAST(k*syy - sy*sy AS DOUBLE)) END AS r2
        |FROM m ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Tables(s, dir, "events")
        .select($"event_type", expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
      val m = c.groupBy($"event_type")
        .agg(count(lit(1)).as("k"),
          sum($"day".cast(Exact.Moment)).as("sx"), sum($"n".cast(Exact.Moment)).as("sy"),
          sum(($"day" * $"n").cast(Exact.Moment)).as("sxy"),
          sum(($"day" * $"day").cast(Exact.Moment)).as("sxx"),
          sum(($"n" * $"n").cast(Exact.Moment)).as("syy"))
        .filter($"k" >= 2)
      val sNum = ($"k" * $"sxy" - $"sx" * $"sy").cast("double")
      val sDen = ($"k" * $"sxx" - $"sx" * $"sx").cast("double")
      m.select($"event_type", $"k".as("n_days"),
          (sNum / sDen).as("slope"),
          (($"sy".cast("double") - sNum / sDen * $"sx".cast("double")) / $"k").as("intercept"),
          when($"k" * $"syy" - $"sy" * $"sy" === 0, lit(null).cast("double"))
            .otherwise(sNum * sNum /
              (sDen * ($"k" * $"syy" - $"sy" * $"sy").cast("double"))).as("r2"))
        .orderBy($"event_type")
    },

    // ---- Gaps-and-islands: per-user CONSECUTIVE-day activity streaks
    // (length ≥ 3) via the classic day − row_number() grouping key — the
    // sessionization-by-calendar shape behind retention/streak features,
    // and the canonical SQL idiom the windowed family (q_session_window,
    // q_gap_fill) doesn't cover: it detects runs in a sparse integer
    // sequence rather than bucketing by wall-clock gap. All-integer
    // (days, row numbers, counts — row_number widened to long before the
    // subtraction, or the key wraps int32 past ~2³¹ active days). Scale
    // shape: the DISTINCT (user, day) projection is one map-side-
    // combined shuffle that collapses event volume to user-days
    // (time-bounded per user); the window and the island aggregate both
    // run user-partitioned on that collapsed frame — per-user state is
    // one row number, never the event history.
    entry("q_islands",
      """WITH d AS (SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events),
        | r AS (SELECT user_id, day,
        |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) grp FROM d)
        |SELECT user_id, MIN(day) streak_start, MAX(day) streak_end, COUNT(*) streak_len
        |FROM r GROUP BY user_id, grp HAVING COUNT(*) >= 3
        |ORDER BY user_id, streak_start""".stripMargin) { (s, dir) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"day")
      Tables(s, dir, "events")
        .select($"user_id", expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
        .withColumn("grp", $"day" - row_number().over(byUser).cast("long"))
        .groupBy($"user_id", $"grp")
        .agg(min($"day").as("streak_start"), max($"day").as("streak_end"),
          count(lit(1)).as("streak_len"))
        .filter($"streak_len" >= 3)
        .select($"user_id", $"streak_start", $"streak_end", $"streak_len")
        .orderBy($"user_id", $"streak_start")
    }
  )
}
