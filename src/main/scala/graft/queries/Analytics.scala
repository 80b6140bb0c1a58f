package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics surface (SURVEY.md §7.1 step 7) over the TPC-H-ish
  * testdata: joins, aggregations, windows, top-k, grouping sets, event-time
  * windows, sessionization. All plain DataFrame API — every filter and
  * projection reaches the parquet scan, joins broadcast their small side.
  *
  * Determinism for the DuckDB hash-compare: money sums go through
  * DECIMAL(20,4) (exact, order-independent) and are cast to DOUBLE at the
  * end; dates are emitted as 'yyyy-MM-dd' strings; every query has a total
  * ORDER BY with tie-breaks.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val dec = "decimal(20,4)"

  /** ROLLUP/CUBE over (l_returnflag, l_linestatus) computed from the base
    * aggregate: one plain groupBy collapses the corpus to ≤|flag×status|
    * rows, the grouping-set Expand and re-aggregation run on those. Exact
    * because count and DECIMAL sums are decomposable; requires non-null
    * grouping keys (TPC-H contract) — see the q_rollup comment. */
  private def groupingSetsOverBaseAgg(lineitem: DataFrame, moneyCol: String,
      outName: String, rollup: Boolean): DataFrame = {
    val base = lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("pc"), sum(col(moneyCol).cast(dec)).as("ps"))
    val grouped =
      if (rollup) base.rollup("l_returnflag", "l_linestatus")
      else base.cube("l_returnflag", "l_linestatus")
    grouped
      .agg(sum(col("pc")).as("n_rows"),
        floor(sum(col("ps")) * 10000).cast("long").as(outName))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n_rows"), col(outName))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val specs: Seq[QuerySpec] = Seq(

    // TPC-H Q1-style pricing summary. Money columns are emitted as
    // floor(sum * 1e4) BIGINT — the decimal SUMS are exact and equal on
    // both engines, but the final decimal→DOUBLE conversion rounds
    // differently at 1-ULP boundaries (hit at sf0.1: 2706323975.3561 vs
    // ...0996), so the comparison must stay in integers. floor() on the
    // exact decimal is engine-identical; values sit far below 2^53.
    QuerySpec.sql(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(floor(sum(CAST(l_quantity AS DECIMAL(20,4))) * 10000) AS BIGINT) AS sum_qty_x10k,
        |  CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(20,4))) * 10000) AS BIGINT) AS sum_base_price_x10k,
        |  CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(1 - l_discount AS DECIMAL(20,4))) * 10000) AS BIGINT) AS sum_disc_price_x10k,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          floor(sum(col("l_quantity").cast(dec)) * 10000).cast("long")
            .as("sum_qty_x10k"),
          floor(sum(col("l_extendedprice").cast(dec)) * 10000).cast("long")
            .as("sum_base_price_x10k"),
          floor(sum(col("l_extendedprice").cast(dec) *
            (lit(1) - col("l_discount")).cast(dec)) * 10000).cast("long")
            .as("sum_disc_price_x10k"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q3-style shipping priority: 3-way join, top-10 revenue.
    QuerySpec.sql(
      "q3_join",
      """SELECT l.l_orderkey,
        |  CAST(floor(sum(CAST(l.l_extendedprice AS DECIMAL(20,4)) * CAST(1 - l.l_discount AS DECIMAL(20,4))) * 10000) AS BIGINT) AS revenue_x10k,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue_x10k DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val customer = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val orders = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      val lineitem = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-03-15 00:00:00").cast("timestamp"))
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(floor(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount")).cast(dec)) * 10000).cast("long")
          .as("revenue_x10k"))
        .select("l_orderkey", "revenue_x10k", "o_orderdate")
        .orderBy(col("revenue_x10k").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5-style: 6-table join, revenue per nation within one region.
    QuerySpec.sql(
      "q5_join_agg",
      """SELECT n.n_name,
        |  CAST(floor(sum(CAST(l.l_extendedprice AS DECIMAL(20,4)) * CAST(1 - l.l_discount AS DECIMAL(20,4))) * 10000) AS BIGINT) AS revenue_x10k
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name ORDER BY revenue_x10k DESC, n_name""".stripMargin) { (s, dir) =>
      val dims = broadcast(
        t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(dims,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(floor(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount")).cast(dec)) * 10000).cast("long")
          .as("revenue_x10k"))
        .orderBy(col("revenue_x10k").desc, col("n_name"))
    },

    // Ranking window: top-3 orders per customer by total price.
    QuerySpec.sql(
      "q_window_rank",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // Analytic window with lag: order-to-order gap in days per customer.
    QuerySpec.sql(
      "q_window_lag",
      """SELECT o_custkey, o_orderkey,
        |       CAST(date_diff('day',
        |         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |         o_orderdate) AS BIGINT) AS days_since_prev
        |FROM orders
        |WHERE o_custkey <= 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lag(col("o_orderdate"), 1).over(w).cast("date")).cast("long")
            .as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Top-k (O5-style ordering at relational scale).
    QuerySpec.sql(
      "q_top_k",
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
        .limit(20)
    },

    // Distinct aggregation.
    QuerySpec.sql(
      "q_distinct_agg",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // Rollup / grouping sets.
    QuerySpec.sql(
      "q_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       count(*) AS n_rows,
        |       CAST(floor(sum(CAST(l_quantity AS DECIMAL(20,4))) * 10000) AS BIGINT) AS sum_qty_x10k
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      // Grouping sets over the BASE AGGREGATE, not the raw table: count
      // and the exact DECIMAL sum are decomposable (sum of group sums ≡
      // total sum, bit-exact for decimals; count ≡ sum of group counts),
      // so the corpus-sized Expand — 3 rows per input row, 3× the map-side
      // aggregation work — collapses to an Expand over the ≤|flag×status|
      // pre-aggregated rows. Valid because the grouping keys are non-null
      // by the TPC-H data contract (a data NULL would be indistinguishable
      // from a super-aggregate row after the re-group); the oracle states
      // the direct ROLLUP and the hash-compare pins the equality.
      groupingSetsOverBaseAgg(t(s, dir, "lineitem"), "l_quantity",
        "sum_qty_x10k", rollup = true)
    },

    // CUBE over (return flag, line status): all 2^2 grouping sets in one
    // pass — map-side partial aggregation per grouping set, one shuffle.
    // (Differs from q_rollup by the (ALL, status) grouping set.)
    QuerySpec.sql(
      "q_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       count(*) AS n_rows,
        |       CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(20,4))) * 10000) AS BIGINT) AS sum_price_x10k
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      // Same base-aggregate rewrite as q_rollup (4 grouping sets here).
      groupingSetsOverBaseAgg(t(s, dir, "lineitem"), "l_extendedprice",
        "sum_price_x10k", rollup = false)
    },

    // Semi/anti joins: customers with and without orders.
    QuerySpec.sql(
      "q_semi_anti",
      """SELECT
        |  (SELECT count(*) FROM customer c WHERE EXISTS
        |     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
        |  (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""".stripMargin) {
      (s, dir) =>
        // Semi + anti counts fused into ONE distributed pass: left-join
        // customers against the distinct order custkeys (no fanout) and
        // split the count on match presence — instead of two driver
        // actions each scanning customer and joining orders.
        val customer = t(s, dir, "customer")
        val orderKeys = t(s, dir, "orders")
          .select(col("o_custkey")).distinct().withColumn("has_order", lit(1))
        customer
          .join(orderKeys, col("c_custkey") === col("o_custkey"), "left")
          .agg(
            sum(when(col("has_order").isNotNull, 1L).otherwise(0L)).as("with_orders"),
            sum(when(col("has_order").isNull, 1L).otherwise(0L)).as("without_orders"))
    },

    // Event-time tumbling window over the stream table (hourly).
    // eventsWithTs normalizes the footer-declared unit (ns or µs across
    // driver regenerations) to LONG nanoseconds, so the exact integer
    // bucket math here matches the oracle's epoch_ns arithmetic whatever
    // the physical unit of the corpus.
    QuerySpec.sql(
      "q_events_window",
      """SELECT strftime(make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000),
        |                '%Y-%m-%d %H:%M:%S') AS hour,
        |       event_type, count(*) AS n,
        |       CAST(floor(sum(CAST(value AS DECIMAL(20,4))) * 10000) AS BIGINT) AS sum_value_x10k
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
      TemporalQueries.eventsWithTs(s, dir)
        .groupBy(
          date_format(
            timestamp_seconds(expr("ts div 3600000000000") * 3600L),
            "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          floor(sum(col("value").cast(dec)) * 10000).cast("long")
            .as("sum_value_x10k"))
        .orderBy("hour", "event_type")
    },

    // Sessionization: 30-minute-gap sessions per user (lag + running sum).
    // Gap comparison in integer nanoseconds on both sides (exact).
    QuerySpec.sql(
      "q_events_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |           OR lag(ts) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, event_id,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_no
        |  FROM flagged
        |)
        |SELECT user_id, session_no, count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      TemporalQueries.eventsWithTs(s, dir)
        .withColumn("new_session",
          when(col("ts") - lag(col("ts"), 1).over(w) > 1800L * 1000000000L, 1)
            .when(lag(col("ts"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("session_no",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_no")
    },

    // NATIVE session windows: the same 30-minute sessionization through
    // Spark's built-in session_window aggregate (dynamic-gap session
    // merging inside one aggregation — the operator Structured Streaming
    // shares) instead of the lag+running-sum window pair. Semantics
    // differ at the exact boundary: session_window merges iff the gap is
    // STRICTLY below 30 min (next < prev_end), so the oracle splits on
    // `>= gap` — and both engines compare in integer MICROseconds, the
    // precision session_window actually aggregates at (ts div 1000 is
    // lossless on today's µs corpus and truncates identically on a
    // future ns one). Session numbers are recovered by ranking window
    // starts per user. At 100 TB this is ONE shuffle on user_id + the
    // in-partition session merge — no second window pass over raw events.
    QuerySpec.sql(
      "q_events_session_native",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN (epoch_ns(ts) // 1000) - (epoch_ns(lag(ts) OVER w) // 1000)
        |              >= 1800000000
        |           OR lag(ts) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_no
        |  FROM flagged
        |)
        |SELECT user_id, session_no, count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("sw.start"))
      TemporalQueries.eventsWithTs(s, dir)
        .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"),
          session_window(col("tstamp"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("session_no", row_number().over(w).cast("long"))
        .select("user_id", "session_no", "n_events")
        .orderBy("user_id", "session_no")
    },

    // Relational set operations: INTERSECT / EXCEPT over two sources'
    // vocabularies (src0 ∩ src1, src0 ∖ src1). Spark plans both as the
    // distinct-aggregate forms (left-semi / left-anti over hash-
    // partitioned distinct sets) — one shuffle each on the set key, the
    // same plan a 100 TB vocabulary diff needs. The union tags each word
    // with its set so one query carries both results.
    QuerySpec.sql(
      "q_set_ops",
      """WITH a AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
        |           FROM documents WHERE source = 'src0'),
        |     b AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
        |           FROM documents WHERE source = 'src1')
        |SELECT 'common' AS set_name, word FROM (SELECT word FROM a INTERSECT SELECT word FROM b)
        |UNION ALL
        |SELECT 'only_src0' AS set_name, word FROM (SELECT word FROM a EXCEPT SELECT word FROM b)
        |ORDER BY set_name, word""".stripMargin) { (s, dir) =>
      def vocab(src: String) =
        s.read.parquet(s"$dir/documents.parquet")
          .filter(col("source") === src)
          .select(explode(split(col("text"), " ")).as("word"))
          .distinct()
      val a = vocab("src0"); val b = vocab("src1")
      a.intersect(b).select(lit("common").as("set_name"), col("word"))
        .unionByName(
          a.except(b).select(lit("only_src0").as("set_name"), col("word")))
        .orderBy("set_name", "word")
    },

    // Semi-structured metadata extraction: pull a typed field out of the
    // JSON `props` column and aggregate it — the pattern for event/doc
    // metadata that ships as JSON blobs. `get_json_object` is a codegen'd
    // path evaluation inside the scan stage (no UDF, no full from_json
    // struct materialization for a single field), then one map-side-
    // combined groupBy to #event_types rows. At 100 TB the JSON parse is
    // the scan's CPU cost and nothing shuffles but the partial aggregates.
    QuerySpec.sql(
      "q_events_json",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |       CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      TemporalQueries.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // Pivot: event counts and value sums per user bucket × event type,
    // types as columns. The value list is EXPLICIT (no extra distinct-
    // values job — on a 100 TB table the implicit `pivot(col)` first runs
    // a full distinct over the pivot column); the plan is then a single
    // map-side-combined aggregate, conditional per pivot value, to
    // #buckets rows. Sums in exact DECIMAL then cast, so the engines'
    // float-summation order cannot break the hash gate.
    QuerySpec.sql(
      "q_pivot",
      """SELECT user_id % 10 AS user_bucket,
        |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
        |       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
        |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
        |       CAST(floor(sum(CASE WHEN event_type = 'purchase'
        |                          THEN CAST(value AS DECIMAL(20,4)) END) * 10000)
        |            AS BIGINT) AS purchase_value_x10k
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin) { (s, dir) =>
      TemporalQueries.events(s, dir)
        .withColumn("user_bucket", col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)).as("n"),
          floor(sum(when(col("event_type") === "purchase", col("value").cast(dec)))
            * 10000).cast("long").as("v"))
        .select(col("user_bucket"),
          // A (bucket, type) combo with no rows pivots to NULL where the
          // oracle's FILTER count is 0 — coalesce the counts (sums stay
          // NULL-on-empty in both engines).
          coalesce(col("click_n"), lit(0L)).as("n_click"),
          coalesce(col("view_n"), lit(0L)).as("n_view"),
          coalesce(col("purchase_n"), lit(0L)).as("n_purchase"),
          col("purchase_v").as("purchase_value_x10k"))
        .orderBy("user_bucket")
    },

    // Ordered conversion funnel: view → click → purchase, each step's
    // first occurrence constrained to happen AT OR AFTER the previous
    // step's first occurrence for that user (the product-analytics funnel,
    // not three independent counts). All comparisons in integer epoch
    // nanoseconds. Shape at 100 TB: each stage is one filtered min-
    // aggregate (map-side combined) equi-joined to the previous stage's
    // user-bounded table — the stage tables shrink monotonically, and
    // nothing ever shuffles more than (user, ts) pairs. Conversion ppm is
    // arithmetic on the 3-row output against the broadcast stage-1 count.
    QuerySpec.sql(
      "q_events_funnel",
      """WITH v AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t
        |  FROM events e JOIN v ON e.user_id = v.user_id AND epoch_ns(e.ts) >= v.t
        |  WHERE e.event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t
        |  FROM events e JOIN c ON e.user_id = c.user_id AND epoch_ns(e.ts) >= c.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1
        |), stages AS (
        |  SELECT 1 AS stage_no, 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |  UNION ALL
        |  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p
        |)
        |SELECT stage_no, stage, n_users,
        |       CASE WHEN (SELECT n_users FROM stages WHERE stage_no = 1) > 0
        |            THEN (n_users * 1000000)
        |                   // (SELECT n_users FROM stages WHERE stage_no = 1)
        |            ELSE 0 END AS conv_from_view_ppm
        |FROM stages ORDER BY stage_no""".stripMargin) { (s, dir) =>
      val ev = TemporalQueries.eventsWithTs(s, dir)
      def firstAtOrAfter(stepType: String, prev: DataFrame): DataFrame =
        ev.filter(col("event_type") === stepType)
          .join(prev.select(col("user_id"), col("t").as("prev_t")), "user_id")
          .filter(col("ts") >= col("prev_t"))
          .groupBy("user_id").agg(min(col("ts")).as("t"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t"))
      val c = firstAtOrAfter("click", v)
      val p = firstAtOrAfter("purchase", c)
      def stageCount(no: Int, nm: String, d: DataFrame): DataFrame =
        d.agg(count(lit(1)).as("n_users"))
          .select(lit(no).as("stage_no"), lit(nm).as("stage"), col("n_users"))
      val stages = stageCount(1, "view", v)
        .unionByName(stageCount(2, "click", c))
        .unionByName(stageCount(3, "purchase", p))
      val viewN = stages.filter(col("stage_no") === 1)
        .select(col("n_users").as("view_n"))
      stages.crossJoin(broadcast(viewN))
        .select(col("stage_no"), col("stage"), col("n_users"),
          // Zero-view corpus: DuckDB's // errors and Spark's div NULLs, so
          // both engines pin conversion at 0 instead of diverging.
          expr("CASE WHEN view_n > 0 THEN (n_users * 1000000) div view_n " +
            "ELSE 0 END").as("conv_from_view_ppm"))
        .orderBy("stage_no")
    },

    // Cohort retention matrix: users grouped by their FIRST-activity day,
    // distinct active users per (cohort day, day offset) — the classic
    // retention triangle. Day buckets in exact integer nanosecond
    // division. Shape at 100 TB: the cohort table is one min-aggregate to
    // #users rows; the activity join is an equi-join on user_id (hash-
    // partitioned both sides, AQE picks broadcast only if the user
    // dimension fits); the matrix aggregate is a distinct-count to
    // #days × #offsets rows with partial aggregation on (cohort, offset,
    // user) before the final shuffle.
    QuerySpec.sql(
      "q_events_retention",
      """WITH d AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
        |), coh AS (
        |  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1
        |)
        |SELECT cohort_day, d.day - cohort_day AS offset_days,
        |       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN coh ON d.user_id = coh.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin) { (s, dir) =>
      val d = TemporalQueries.eventsWithTs(s, dir)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val coh = d.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      d.join(coh, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "offset_days")
    })
}
