package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics over the star schema — the coverage the reference
  * lacks entirely (SURVEY.md §2.3–§2.8 gaps: joins, aggregations, windows,
  * set ops, sorts, date/JSON functions), expressed declaratively so Catalyst
  * plans pushdown/pruning/join-selection itself.
  *
  * Scale notes (the part that matters at 100 TB):
  *  - fact-to-dim joins broadcast the dim side explicitly (`broadcast()`),
  *    so no shuffle of the fact table happens for q03/q04/q18;
  *  - fact-to-fact joins (q05/q06) are shuffle hash/sort-merge joins on the
  *    join key — the natural partitioning; AQE handles skew at runtime;
  *  - aggregates are partial (map-side combine) by construction — groupBy
  *    over codegen'd exact-decimal sums;
  *  - top-k (q13) is `TakeOrderedAndProject`, never a full sort.
  *
  * Float policy: every SUM over a double column casts the addend to an exact
  * DECIMAL first — decimal addition is associative, so the result is
  * independent of partitioning/merge order and matches DuckDB bit-for-bit.
  * AVG is emitted as cast(exact-decimal sum AS double) / count, which both
  * engines evaluate identically (single IEEE division of identical inputs).
  *
  * Output-type policy: results carry only STRING / integral / DOUBLE /
  * BOOLEAN columns — never DECIMAL or TIMESTAMP. The round-1 driver gate
  * showed that decimal values with trailing zeros ("38.50" vs float "38.5")
  * and tz-aware vs naive timestamps hash differently under the driver's
  * normalization even when values are equal; exact-decimal sums are
  * therefore cast to DOUBLE (deterministic: the sum is exact, the cast is a
  * single round-to-nearest both engines share) and timestamps are emitted
  * as formatted strings.
  */
object Relational extends QueryPack {

  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private val one2: Column = lit(1).cast("decimal(3,2)")
  /** Exact decimal sum (order-independent) surfaced as a hash-stable double. */
  private def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  override val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: scan → partial agg → final agg.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Selective filter + narrow projection: predicate + column pruning
    // must reach the parquet scan (verified via .explain PushedFilters).
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > 0.05 && col("l_quantity") < 10.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // all four columns: the fixture generator duplicates
        // (l_orderkey, l_linenumber) pairs, so the two-column sort is not
        // a total order and row order diverges across engines (surfaced
        // by the round-8 10x sweep; invisible below it by luck of values)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")
    }),

    // Broadcast equi-join fact→dim: revenue by market segment.
    "q03_join_broadcast" -> ((s, d) => {
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(
          dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // Multiway join through the whole snowflake (TPC-H Q5 shape):
    // lineitem ⋈ orders (shuffle on orderkey) ⋈ broadcast dims.
    "q04_join_multiway" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("n_name")
    }),

    // Left-semi join: orders having a deep-discount line (EXISTS).
    "q05_semi_join" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_discount") > 0.06)
            .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // Left-anti join: customers with no orders (NOT EXISTS).
    "q06_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Window rank: top-3 orders per customer (partitioned row_number with
    // a total-order tie-break so the result is deterministic).
    "q07_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // Running-frame window: cumulative quantity per supplier over time.
    // (l_orderkey, l_linenumber) is not unique in the fixture, so both the
    // window order and the final order include l_quantity/running_qty to
    // stay total — otherwise the prefix sums are nondeterministic.
    "q08_window_running" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("running_qty",
          sum(dec2(col("l_quantity"))).over(w).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    }),

    // ROLLUP hierarchy totals (subtotal rows surfaced via coalesce so the
    // output needs no grouping-id function on either engine).
    "q09_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // CUBE over order status × priority.
    "q10_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          dsum(col("o_totalprice")).as("total"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("total"), col("n"))
        .orderBy("status", "priority")
    }),

    // Set operations: customers-of-segment sets combined three ways,
    // tagged and unioned into one deterministic result.
    "q11_setops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val highBal = c.filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("custkey"))
      val u = building.union(highBal).distinct()
        .withColumn("op", lit("union"))
      val i = building.intersect(highBal).withColumn("op", lit("intersect"))
      val e = building.except(highBal).withColumn("op", lit("except"))
      u.union(i).union(e).select("op", "custkey").orderBy("op", "custkey")
    }),

    // Exact + distinct aggregation in one pass.
    "q12_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // Top-k by value: plans as TakeOrderedAndProject (no full sort).
    "q13_topk" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)
    }),

    // Calendar aggregation: revenue by month.
    // Year-over-year growth — the lag-window comparison every revenue
    // dashboard leads with, in the scale-safe grain: the fact rolls up
    // to YEAR rows first, so the unpartitioned lag window runs over a
    // handful of rows, never the corpus (the q48 rollup-bounded-window
    // rule). Growth is exact integer permille of cent-scaled bigints;
    // Spark `div` and DuckDB `//` both truncate toward zero, so the
    // NEGATIVE growth years divide identically (verified: -13 div 4 =
    // -3 in both engines — floor division would give -4).
    "q81_yoy_growth" -> ((s, d) => {
      val y = Tables.lineitem(s, d)
        .groupBy(year(col("l_shipdate")).cast("bigint").as("yr"))
        .agg((sum(dec2(col("l_extendedprice"))) * 100).cast("bigint")
          .as("cents"))
      val w = Window.orderBy("yr")
      y.withColumn("prev", lag("cents", 1).over(w))
        .select(col("yr"),
          (col("cents").cast("double") / 100).as("revenue"),
          coalesce(expr("(cents - prev) * 1000 div prev"), lit(0L))
            .cast("bigint").as("yoy_permille"))
        .orderBy("yr")
    }),

    // DAU/MAU stickiness — the engagement ratio a product dashboard
    // tracks: mean daily actives over monthly actives, in integer
    // permille. Two distinct-count rollups (day grain and month grain —
    // both partial-agg shuffles on bounded keys) joined at month grain;
    // no corpus window, no per-user state.
    "q82_stickiness" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(date_format(col("ts"), "yyyy-MM").as("month"),
          to_date(col("ts")).as("day"), col("user_id"))
      val dau = ev.groupBy("month", "day")
        .agg(countDistinct("user_id").as("dau"))
      val mau = ev.groupBy("month")
        .agg(countDistinct("user_id").as("mau"))
      dau.groupBy("month")
        .agg(sum("dau").as("sum_dau"), count(lit(1)).as("n_days"))
        .join(mau, Seq("month"))
        .select(col("month"), col("n_days").cast("bigint").as("n_days"),
          col("mau").cast("bigint").as("mau"),
          expr("sum_dau * 1000 div (n_days * mau)").cast("bigint")
            .as("stickiness_permille"))
        .orderBy("month")
    }),

    "q14_monthly_revenue" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"))
        .agg(
          dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("month_start")
    }),

    // JSON field extraction from events.props (SURVEY §2.8 JSON access).
    "q15_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("k")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"))
        .orderBy("k")
    }),

    // Per-key trend fitting: least-squares slope of daily event counts,
    // closed-form from FIVE integer sums (n, Σx, Σy, Σxy, Σx²) — the
    // grouped regression a monitoring pipeline fits per metric. All
    // arithmetic stays in exact BIGINTs until the single closing division
    // (magnitudes bounded: day index × daily count), so the slope is
    // cross-engine exact at 6 dp; one daily rollup + one per-key
    // aggregate, both map-side combining.
    "q55_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("x"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"))
        .select(col("event_type"), col("n_days"),
          round((col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n_days") * col("sx2") - col("sx") * col("sx"))
              .cast("double"), 6).as("slope"))
        .orderBy("event_type")
    }),

    // Remaining analytic-window surface in one query: percent_rank /
    // cume_dist (full-partition rank statistics) and nth_value /
    // first_value (frame-respecting value picks). Ordering key includes
    // the unique orderkey, so the default RANGE frame equals a ROWS frame
    // and both engines see identical frames. One window shuffle on
    // o_custkey; the custkey predicate pushes to the scan.
    "q56_window_misc" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          round(nth_value(col("o_totalprice").cast("double"), 2).over(w), 2)
            .as("second_price"),
          round(first(col("o_totalprice").cast("double")).over(w), 2)
            .as("first_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Daily-volume anomaly flags per event type — the monitoring query a
    // pipeline runs over its own telemetry. The 2σ z-score test is an
    // ALL-INTEGER inequality: |y−μ| > 2σ  ⇔  (y·n − S)² > 4·(n·Q − S²)
    // with S = Σy, Q = Σy² (both exact BIGINT sums, order-independent —
    // no float σ, no sqrt, so both engines agree at every boundary; at
    // corpus scale the same identity runs in DECIMAL). One daily rollup
    // shuffle + a broadcast join of the per-type stats (≤ type-cardinality
    // rows) back to the days.
    "q58_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"),
          sum(col("y") * col("y")).as("qy"))
      daily.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("day"), col("y"),
          ((col("y") * col("n") - col("sy")) *
            (col("y") * col("n") - col("sy")) >
            lit(4L) * (col("n") * col("qy") - col("sy") * col("sy")))
            .as("is_anomaly"))
        .orderBy("event_type", "day")
    }),

    // Audience-overlap via theta sketches (Datasketches): distinct-user
    // UNION / INTERSECTION / DIFFERENCE between two event segments
    // without ever shuffling raw user ids between segments — the
    // set-algebra HLL cannot do (q46 only unions). Each segment reduces
    // map-side to one ~4 KB sketch; estimates sit beside the exact
    // counts with a 5% contract (the q22/q38/q46 de-flake pattern). At
    // these cardinalities (≤4096 retained hashes) theta runs in exact
    // mode, so the oracle checks the estimates as exact values; past
    // exact mode only the _ok contract columns would stay in the oracle.
    "q59_theta_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
      val sks = ev.groupBy("event_type")
        .agg(expr("theta_sketch_agg(user_id)").as("sk"))
      val est = sks.agg(
        expr("cast(theta_sketch_estimate(theta_union_agg(sk)) as bigint)")
          .as("est_union"),
        expr("cast(theta_sketch_estimate(theta_intersection_agg(sk)) as bigint)")
          .as("est_overlap"),
        expr("""cast(theta_sketch_estimate(theta_difference(
            first(CASE WHEN event_type = 'click' THEN sk END, true),
            first(CASE WHEN event_type = 'purchase' THEN sk END, true)))
          as bigint)""").as("est_click_only"))
      val exact = ev.groupBy("user_id")
        .agg(countDistinct("event_type").as("nt"),
          max(when(col("event_type") === "click", 1).otherwise(0))
            .as("has_click"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("nt") === 2, 1L).otherwise(0L)).as("exact_overlap"),
          sum(when(col("nt") === 1 && col("has_click") === 1, 1L)
            .otherwise(0L)).as("exact_click_only"))
      exact.crossJoin(est)
        .withColumn("union_ok",
          abs(col("est_union") - col("exact_union")) * 20 <=
            col("exact_union"))
        .withColumn("overlap_ok",
          abs(col("est_overlap") - col("exact_overlap")) * 20 <=
            col("exact_overlap"))
        .withColumn("click_only_ok",
          abs(col("est_click_only") - col("exact_click_only")) * 20 <=
            col("exact_click_only"))
    }),

    // Corrupt-tolerant JSON ingestion: a deterministic slice of the feed
    // is mangled (the reality of any raw event log), then parsed with
    // from_json — Spark's PERMISSIVE path yields null structs for corrupt
    // rows instead of failing the job, and the query separates good from
    // bad counts per event type in the same pass. At 100 TB, fail-on-first
    // -corrupt-byte is not an option; quarantine-and-count is the shape.
    "q53_json_robust" -> ((s, d) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))
      Tables.events(s, d)
        .withColumn("raw",
          when(col("event_id") % 7 === 0, concat(lit("{corrupt"),
            col("props"))).otherwise(col("props")))
        .withColumn("parsed", from_json(col("raw"), schema))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("parsed").isNull || col("parsed.k").isNull, 1L)
            .otherwise(0L)).as("n_corrupt"),
          sum(when(col("parsed.k").isNotNull, col("parsed.k"))
            .otherwise(0L)).as("sum_k"))
        .orderBy("event_type")
    }),

    // String scalar functions over part (upper/substring/concat/length).
    "q16_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_type"), 1, 3).as("type_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")
    }),

    // GROUP BY ... HAVING: busy customers only.
    "q17_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")
    }),

    // Broadcast dim join + exact-decimal AVG by nation.
    "q18_avg_by_nation" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          (sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1)))
            .as("avg_bal"),
          count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    }),

    // lag() window over the event stream: per-user inter-event gap in
    // exact microseconds (unix_micros ↔ DuckDB epoch_us, no rounding).
    "q19_event_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .filter(col("prev_ts").isNotNull)
        .select("user_id", "event_id", "gap_us")
        .orderBy("user_id", "event_id")
    }),

    // Path/filename parsing (SURVEY §2.8 basename/stem: the reference's
    // s3_key.split('/')[-1] + splitext at parser_pinecone_storage.py:53,75).
    "q21_path_parse" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("source"), lit("/doc_"), col("doc_id"), lit(".pdf"))
            .as("path"))
        .select(col("doc_id"), col("path"),
          element_at(split(col("path"), "/"), -1).as("basename"),
          regexp_replace(element_at(split(col("path"), "/"), -1),
            "\\.[a-z]+$", "").as("stem"),
          element_at(split(col("path"), "\\."), -1).as("ext"))
        .orderBy("doc_id")
    }),

    // Approximate distinct counting (HLL sketch). Spark's HLL++ and
    // DuckDB's sketch produce different raw estimates by design, so the
    // estimate itself can't be hash-compared; what IS cross-engine
    // checkable is the accuracy contract. The driver-hashed verdict uses
    // a 15% bound — ~15 standard deviations at rsd=1%, so it cannot flake
    // at an unlucky scale factor the way the old 5% bound could — while
    // the tight 5% contract stays asserted in PlanSpec at a fixed sf.
    "q22_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.15).as("approx_ok"))
        .orderBy("l_returnflag")
    }),

    // Explicit GROUPING SETS (the general form behind rollup/cube):
    // per-(flag,status), per-flag, and grand-total rows in one pass.
    "q32_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
      s.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
               count(*) AS n
        FROM graft_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY returnflag, linestatus""")
    }),

    // SQL-text surface: the same engine drives plain Spark SQL over
    // registered views (the spark.sql entry point users of the reference's
    // HTTP API would hit through a thin adapter).
    "q33_sql_text" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_sql")
      Tables.customer(s, d).createOrReplaceTempView("graft_customer_sql")
      s.sql("""
        SELECT c_mktsegment, o_orderpriority, count(*) AS n,
               cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS total
        FROM graft_orders_sql JOIN graft_customer_sql ON o_custkey = c_custkey
        WHERE o_orderstatus = 'O'
        GROUP BY c_mktsegment, o_orderpriority
        ORDER BY c_mktsegment, o_orderpriority""")
    }),

    // RANGE-frame window: trailing-30-day quantity per supplier. A range
    // frame is the determinism-friendly sliding window — all ship-day
    // ties are in or out TOGETHER, so the result is independent of the
    // tie order that makes row frames treacherous.
    "q34_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey").orderBy(col("ship_day"))
        .rangeBetween(-30, 0)
      Tables.lineitem(s, d)
        .withColumn("ship_day",
          datediff(col("l_shipdate"), lit("1970-01-01")).cast("long"))
        .withColumn("qty_30d", sum(dec2(col("l_quantity"))).over(w)
          .cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "ship_day",
          "qty_30d")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "ship_day",
          "qty_30d")
    }),

    // Distribution windows: quartile, percent_rank, cume_dist of customers
    // by account balance (total order via the custkey tie-break).
    "q35_ntile" -> ((s, d) => {
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("c_custkey")
    }),

    // Pivot: event counts per user × explicit event-type columns (explicit
    // value list keeps the output schema static, as required at scale).
    "q29_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // Unpivot/melt: wide lineitem measures to (measure, value) rows.
    "q30_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure", "value")
    }),

    // Deterministic sampling: a content-hash Bernoulli sample (hash60 of
    // the key mod 100) — reproducible across engines, partitionings, and
    // reruns, unlike rand()-based df.sample.
    "q31_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(pmod(graft.functions.CrossHash.hash60(
          col("doc_id").cast("string")), lit(100L)) < 10)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Exact median per group (quantity values are integral doubles, so the
    // 0.5-quantile interpolation is exact in both engines).
    "q26_median" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(median(col("l_quantity")).as("median_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Spread/association statistics, rounded to 4 dp (stddev/corr
    // accumulate in floating point; both engines agree to ~1e-10 relative,
    // far inside the rounding).
    "q27_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          // + 0.0 after rounding: normalizes IEEE -0.0 (DuckDB keeps the
          // sign of a tiny negative correlation; Spark does not)
          (round(stddev_samp(col("l_quantity")), 4) + 0.0).as("sd_qty"),
          (round(corr(col("l_quantity"), col("l_extendedprice")), 4) + 0.0)
            .as("corr_qty_price"),
          (round(covar_samp(col("l_discount"), col("l_tax")), 4) + 0.0)
            .as("cov_disc_tax"))
        .orderBy("l_returnflag")
    }),

    // Ordered distinct aggregation: per-user alphabet of event types as one
    // string (collect_set order is engine-internal; sorting makes it a
    // deterministic, comparable value).
    "q28_event_type_sets" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",")
          .as("types"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Sessionization via the built-in session_window (gap 30 min): one
    // row per (user, session). The oracle rebuilds sessions with
    // lag + cumulative-sum windows, pinning the gap-merge semantics; the
    // streaming twin (flatMapGroupsWithState) lives in
    // graft.streaming.Sessionize.
    "q25_sessionize" -> ((s, d) => {
      graft.streaming.Sessionize.batchSessions(s, d)
        .orderBy("user_id", "session_seq")
    }),

    // Same top-3-per-customer result as q07, but through the custom
    // TopKPerKey physical operator (partial bounded-heap top-k before the
    // shuffle — the map-side combine a window can't do). Oracle-checked
    // against the same SQL, so the custom exec's semantics are pinned.
    "q24_topk_custom" -> ((s, d) => {
      import graft.plans.TopKPerKey
      TopKPerKey.topKPerKey(Tables.orders(s, d),
          keys = Seq("o_custkey"),
          order = Seq(TopKPerKey.desc("o_totalprice"),
            TopKPerKey.asc("o_orderkey")),
          k = 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy("o_custkey", "rank")
    }),

    // Backward as-of join (operator Spark lacks; graft.operators.AsOfJoin
    // composes it with one shuffle): each error event matched to the
    // user's most recent purchase at-or-before it. Oracle = DuckDB's
    // native ASOF JOIN, so the composition's semantics are checked against
    // a first-class implementation.
    "q23_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(col("value")).as("purchase_value"))
      graft.operators.AsOfJoin
        .backward(errors, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_value"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("err_us"),
          unix_micros(col("matched_ts")).as("purchase_us"),
          col("matched_purchase_value").as("purchase_value"))
        .orderBy("user_id", "event_id")
    }),

    // Tumbling-hour event aggregation — the batch twin of the Structured
    // Streaming query in graft.streaming.EventStream (same grouping, so the
    // oracle checks the streaming semantics too).
    "q20_hourly_events" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"))
        .orderBy("hour_start", "event_type")
    }),

    // q20 × q39 composed: the hourly WEIGHTED rollup that is the batch
    // twin of the stream-static enrichment join
    // (streaming/EventStream.enrichedHourly) — StreamingSpec asserts
    // stream ≡ this, this oracle closes the chain to DuckDB, the same
    // transitive coverage q20/q25/q37/q61 give their streaming twins.
    "q67_hourly_weighted" -> ((s, d) => {
      import s.implicits._
      val weights = EventWeights.toDF("event_type", "weight")
      Tables.events(s, d)
        .join(broadcast(weights), Seq("event_type"))
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value")) * col("weight")).cast("double")
            .as("weighted_value"))
        .select("hour_start", "event_type", "n", "weighted_value")
        .orderBy("hour_start", "event_type")
    }),

    // Hopping (sliding) window aggregation — q20's tumbling twin: 1-hour
    // windows every 30 minutes, so each event contributes to exactly
    // len/slide = 2 windows. Spark's window() explodes the hop
    // assignments map-side (fan-out bounded by len/slide, never
    // corpus-shaped) and aggregates in ONE shuffle keyed by
    // (window_start, type); window starts are epoch-aligned, which
    // DuckDB's time_bucket replays exactly (its 2000-01-01 origin sits
    // on a 30-minute epoch boundary).
    "q61_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(
          window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    }),

    // Event-transition matrix (first-order Markov over user behavior) —
    // the sequence-mining composite beyond q19's gaps and q49's fixed
    // funnel: P(next event type | current) per transition, in integer
    // permille (cross-multiplied — the t26 discipline applied to event
    // streams). One lag-window shuffle on user_id, one partial-agg
    // shuffle on the (type, next) pair, marginals broadcast; output is
    // |event_type|² rows from any corpus size.
    "q62_event_markov" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      val cnt = trans.groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
      val marg = cnt.groupBy("event_type").agg(sum("n").as("tot"))
      cnt.join(broadcast(marg), "event_type")
        .select(col("event_type"), col("next_type"), col("n"),
          expr("cast((n * 1000) div tot as bigint)").as("permille"))
        .orderBy("event_type", "next_type")
    }),

    // Tolerance range join (graft.operators.RangeJoin): click/view events
    // within ±30 s of each purchase, with NO equi-key — the pair predicate
    // is purely temporal, the case Catalyst can only plan as a nested-loop
    // cartesian. The operator turns it into one bucketed equi-join shuffle
    // (see RangeJoin scaladoc); this query aggregates the pairs per
    // purchase. Purchases with no neighbour inside the tolerance drop out
    // (inner-join semantics), matching the oracle.
    "q36_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      val nearby = ev.filter(col("event_type").isin("click", "view"))
        .select(col("ts").as("o_ts"), col("value").as("o_value"))
      graft.operators.RangeJoin
        .byTolerance(purchases, nearby, "p_ts", "o_ts", 30L * 1000000L)
        .groupBy("p_id")
        .agg(count(lit(1)).as("n_nearby"), dsum(col("o_value")).as("sum_value"))
        .orderBy("p_id")
    }),

    // Click→purchase attribution: purchases within 30 min after a click by
    // the same user. Equi-key (user_id) + time-range predicate → one
    // shuffled equi-join on user_id with the range as a post-filter; also
    // the batch twin of the stream-stream interval join in
    // graft.streaming.EventStream.clickPurchaseJoin (StreamingSpec asserts
    // row equality, so this oracle checks the streaming path too).
    "q37_click_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      clicks.join(purchases,
          col("user_id") === col("p_user")
            && col("purchase_ts") >= col("click_ts")
            && col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
            .as("delay_us"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    // Approximate percentiles with an accuracy contract (the q22 pattern):
    // the EXACT discrete percentile is defined by an explicit rank formula
    // (value at row ceil(p·n) in sort order) so both engines select the
    // same raw data value — no reliance on library quantile semantics —
    // and the sketch estimate (Spark KLL / DuckDB t-digest) is asserted
    // within 5% of it as a boolean, never hash-compared.
    "q38_approx_percentile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val g = Window.partitionBy("l_returnflag")
      val exact = li
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(g))
        .groupBy("l_returnflag")
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.5),
            col("l_extendedprice"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * 0.95),
            col("l_extendedprice"))).as("p95"),
          max(col("n")).as("n"))
      val approx = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("ap"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("n"), col("p50"), col("p95"),
          (abs(element_at(col("ap"), 1) - col("p50"))
            <= col("p50") * 0.05).as("p50_ok"),
          (abs(element_at(col("ap"), 2) - col("p95"))
            <= col("p95") * 0.05).as("p95_ok"))
        .orderBy("l_returnflag")
    }),

    // Salted skew join as a checked query (SkewTools was test-only):
    // events (fact, event_type is a 5-value power-law key — exactly the
    // heavy-hitter shape) joined to a weights dim through the (key, salt)
    // composite, spreading each hot key over 8 tasks; weighted revenue per
    // type. Salting must be invisible in the result — the oracle is the
    // plain unsalted join.
    "q39_salted_join" -> ((s, d) => {
      import s.implicits._
      val dim = EventWeights.toDF("event_type", "weight")
      graft.operators.SkewTools
        .saltedJoin(Tables.events(s, d), dim, "event_type", "event_id",
          salts = 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value")) * col("weight")).cast("double")
            .as("weighted_value"))
        .orderBy("event_type")
    }),

    // q39's salting proof extended to a GENUINELY skewed input: a
    // 90%-hot join key planted deterministically on the events fact
    // (user_id % 10 < 9 all collapse to one mega-user — the power-law /
    // null-key shape at 100 TB, where AQE's split still leaves one
    // straggler task owning the hot key's entire dim join). The salted
    // join spreads that key across 8 salts; the oracle replays the same
    // CASE through a PLAIN join — hash-identical output proves the
    // mitigation is output-invisible exactly where it matters
    // (SkewSaltSpec additionally measures the per-partition spread and
    // pins the salted exchange in the executed plan).
    "q65_skew_salted" -> ((s, d) => {
      val fact = Tables.events(s, d)
        .withColumn("skew_user",
          when(pmod(col("user_id"), lit(10)) < 9, lit(0L))
            .otherwise(col("user_id")))
        .select("skew_user", "event_id", "value")
      // per-key dim derived from the fact itself (deterministic + SQL-
      // replayable): weight = skew_user % 7 + 1
      val dim = fact.select("skew_user").distinct()
        .withColumn("weight", pmod(col("skew_user"), lit(7)) + lit(1))
      graft.operators.SkewTools
        .saltedJoin(fact, dim, "skew_user", "event_id", salts = 8)
        .groupBy("skew_user")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value")) * col("weight")).cast("double")
            .as("weighted_value"))
        .orderBy("skew_user")
    }),

    "q40_zorder_key" -> (zOrderKeyQuery _),

    // Correlated scalar subquery — Catalyst must DECORRELATE it into an
    // aggregate + join (a per-row subquery execution would be O(n·m) and
    // cannot distribute); the oracle runs the identical SQL text, so both
    // the decorrelation semantics and the null handling (orders with no
    // lineitems drop via the > comparison) are checked.
    "q41_correlated_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_corr")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_corr")
      // the subquery aggregate follows the float policy (exact decimal
      // sum / count) so the correlated average is bit-identical in DuckDB
      s.sql("""
        SELECT o_orderkey, cast(o_totalprice as double) AS total
        FROM graft_orders_corr o
        WHERE o_totalprice > 2 * (
          SELECT cast(sum(cast(l_extendedprice as decimal(12,2))) as double)
                   / count(*)
          FROM graft_lineitem_corr
          WHERE l_orderkey = o.o_orderkey)
        ORDER BY o_orderkey""")
    }),

    // Mergeable-sketch rollup: per-DAY HLL sketches of distinct users,
    // UNIONED into per-month distinct-count estimates — the incremental
    // pattern for COUNT(DISTINCT) at 100 TB: daily sketches are the
    // materialized state (a few KB each), a month is a merge of ~30
    // sketches, and no raw event is ever rescanned (IncrementalAgg's
    // monoid-state idea, for the non-distributive aggregate). Accuracy is
    // asserted as a 5% contract next to the exact count (the q22/q38
    // de-flake pattern: DuckDB checks its own HLL against the same exact
    // value, so the boolean matches without bit-identical sketches).
    "q46_hll_rollup" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(
          date_format(col("ts"), "yyyy-MM").as("month"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("user_id"))
      val daily = ev.groupBy("month", "day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val monthly = daily.groupBy("month")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_approx"))
      val exact = ev.groupBy("month")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(monthly, Seq("month"))
        .select(col("month"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact"))
            <= col("n_exact") * 0.05).as("ok"))
        .orderBy("month")
    }),

    // TPC-H Q18 shape — large-volume orders: the IN-subquery over an
    // aggregate (orders whose lineitems total > 150 units) becomes a join
    // against the aggregated key set; the aggregate is partial (map-side
    // combine) on the natural l_orderkey partitioning, so the "subquery"
    // costs one fact-width shuffle shared with the outer join key — no
    // second shuffle of lineitem.
    "q50_big_orders" -> ((s, d) => {
      val bigKeys = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("total_qty"))
        .filter(col("total_qty") > 150.0)
      Tables.orders(s, d)
        .join(bigKeys, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Gap-filled hourly resample: the (event_type × hour) grid is built
    // from a 1-row span aggregate + sequence/explode — a TINY generated
    // dimension regardless of fact size — and the only fact-width work is
    // the hourly count aggregate; missing hours surface as 0 via the left
    // join, never by scanning for absence.
    "q47_gapfill" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      val hourly = ev.groupBy("event_type", "h").agg(count(lit(1)).as("n"))
      val span = ev.agg(min("h").as("lo"), max("h").as("hi"))
      val hours = span.select(explode(
        sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
      val grid = ev.select("event_type").distinct().crossJoin(hours)
      grid.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "hour_start")
    }),

    // Forward-fill (last-observation-carried-forward) hourly resample —
    // q47's gap-fill upgraded from "missing = 0" to "missing = last
    // observed value", the imputation a metrics/feature store serves
    // ("what was the latest known hourly total as of hour X?"). Same
    // scale shape as q47: the only fact-width work is the hourly rollup;
    // the grid is span × type rows (generated, tiny), and the LOCF
    // window runs over HOURS per type — bounded state regardless of
    // corpus size. last(ignoreNulls) is deterministic here because the
    // window input has exactly one row per (type, hour). Hours before a
    // type's first observation stay null (nothing to carry), matching
    // DuckDB's IGNORE NULLS window exactly.
    "q68_forward_fill" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
          col("value"))
      val hourly = ev.groupBy("event_type", "h")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("hour_sum"))
      val span = ev.agg(min("h").as("lo"), max("h").as("hi"))
      val hours = span.select(explode(
        sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
      val grid = ev.select("event_type").distinct().crossJoin(hours)
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "h"), "left")
        .withColumn("filled_sum",
          last(col("hour_sum"), ignoreNulls = true).over(w))
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          coalesce(col("n"), lit(0L)).as("n"),
          col("hour_sum").isNotNull.as("observed"),
          col("filled_sum"))
        .orderBy("event_type", "hour_start")
    }),

    // Cumulative distinct users per day — the SCALABLE formulation: a
    // running COUNT(DISTINCT) window over raw events holds every seen id
    // in window state; instead, distinct collapses FIRST (min event day
    // per user), so the running sum ranges over days, not events, and the
    // single-partition window is over ~365 rows/year no matter the fact
    // size.
    "q48_cumulative_users" -> ((s, d) => {
      val firstSeen = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("day"))
      val daily = firstSeen.groupBy("day")
        .agg(count(lit(1)).as("new_users"))
      // the global window runs over the per-DAY rollup — bounded by
      // calendar days, not corpus size (PlanAudit's global-window flag
      // is benign on rollup-bounded inputs; PrefixSum is the tool when
      // the windowed input IS corpus-sized, as in t31)
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_users", sum("new_users").over(w))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("new_users"), col("cum_users"))
        .orderBy("day")
    }),

    // Ordered funnel (signup → first click after it → first purchase
    // after that): one groupBy collapses each user to three stage
    // timestamps (conditional min — map-side combinable), the funnel
    // logic is then row-local comparisons on the tiny per-user table.
    "q49_funnel" -> ((s, d) => {
      val stages = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("t1"),
          min(when(col("event_type") === "click", col("ts"))).as("t2"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t3"))
      stages.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("t1").isNotNull && col("t2") > col("t1"), 1L)
          .otherwise(0L)).as("n_click_after"),
        sum(when(col("t1").isNotNull && col("t2") > col("t1")
            && col("t3") > col("t2"), 1L)
          .otherwise(0L)).as("n_purchase_after"))
    }),

    // Cohort retention matrix: users grouped by first-activity day, counted
    // on each later active day — the day-N retention table every product
    // analytics stack derives from an event log. Events collapse to
    // distinct (user, day) FIRST (the fact-width shuffle happens once, on
    // user_id, and both the cohort aggregate and the activity join hang
    // off that same exchange), so the join and the final (cohort, offset)
    // aggregate run over user-day rows, never raw events.
    "q52_retention" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val cohort = act.groupBy("user_id").agg(min("day").as("cohort_day"))
      act.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    })
  )

  /** Per-event-type weights dim for q39 (integer weights keep the decimal
    * sum exact). */
  val EventWeights: Seq[(String, Long)] =
    Seq(("click", 2L), ("view", 1L), ("purchase", 5L), ("signup", 3L),
      ("error", 0L))

  /** q40: the Z-order clustering key itself, oracle-checked — bucketing
    * and bit-interleave are deterministic integer/IEEE steps both engines
    * reproduce exactly, so the LAYOUT key a 100 TB table would cluster by
    * is verified, not just exercised (the file-skipping effect of the full
    * writer is asserted separately in ZOrderSpec). */
  private def zOrderKeyQuery(s: SparkSession, d: String): DataFrame = {
    val z = graft.operators.ZOrder
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val stats = li.agg(
      min("l_orderkey").as("lo_o"), max("l_orderkey").as("hi_o"),
      min("l_partkey").as("lo_p"), max("l_partkey").as("hi_p"))
    li.crossJoin(broadcast(stats))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        z.zValue(Seq(
          z.bucket(col("l_orderkey"), col("lo_o"), col("hi_o"), 8),
          z.bucket(col("l_partkey"), col("lo_p"), col("hi_p"), 8)), 8)
          .as("zv"))
      // l_partkey tiebreak: (l_orderkey, l_linenumber) pairs duplicate in
      // the fixture, so the two-column sort is not total (round-8 10x
      // sweep finding — zv derives from partkey, so three columns order
      // every row)
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  override val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
        |  cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_base_price,
        |  cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(12,2)))) as double) AS sum_disc_price,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount > 0.05 AND l_quantity < 10.0
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT c_mktsegment,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q04_join_multiway" ->
      """SELECT n_name,
        |  cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(12,2)))) as double) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q05_semi_join" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.06)
        |ORDER BY o_orderkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) as int) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q08_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  cast(sum(cast(l_quantity as decimal(12,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,

    "q09_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q10_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q11_setops" ->
      """WITH building AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |  highbal AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0)
        |SELECT 'union' AS op, custkey FROM (SELECT custkey FROM building UNION SELECT custkey FROM highbal)
        |UNION ALL
        |SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM highbal)
        |UNION ALL
        |SELECT 'except' AS op, custkey FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM highbal)
        |ORDER BY op, custkey""".stripMargin,

    "q12_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q13_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q81_yoy_growth" ->
      """WITH y AS (SELECT cast(year(l_shipdate) as bigint) AS yr,
        |    cast(sum(cast(l_extendedprice as decimal(12,2))) * 100
        |         as bigint) AS cents
        |  FROM lineitem GROUP BY 1)
        |SELECT yr, cast(cents as double) / 100 AS revenue,
        |  cast(coalesce((cents - lag(cents) OVER (ORDER BY yr)) * 1000
        |    // lag(cents) OVER (ORDER BY yr), 0) as bigint) AS yoy_permille
        |FROM y ORDER BY yr""".stripMargin,

    "q82_stickiness" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m') AS month,
        |    cast(ts as date) AS day, user_id FROM events),
        |dau AS (SELECT month, day,
        |  cast(count(DISTINCT user_id) as bigint) AS dau FROM d GROUP BY 1, 2),
        |mau AS (SELECT month,
        |  cast(count(DISTINCT user_id) as bigint) AS mau FROM d GROUP BY 1),
        |a AS (SELECT month, cast(sum(dau) as bigint) AS sum_dau,
        |    cast(count(*) as bigint) AS n_days FROM dau GROUP BY 1)
        |SELECT a.month, a.n_days, mau.mau,
        |  cast(a.sum_dau * 1000 // (a.n_days * mau.mau) as bigint)
        |    AS stickiness_permille
        |FROM a JOIN mau ON mau.month = a.month ORDER BY a.month""".stripMargin,

    "q14_monthly_revenue" ->
      """SELECT cast(year(o_orderdate) as int) AS yr,
        |  strftime(date_trunc('month', cast(o_orderdate as timestamp)), '%Y-%m-%d') AS month_start,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY 1, 2 ORDER BY month_start""".stripMargin,

    "q15_json_extract" ->
      """SELECT cast(json_extract_string(props, '$.k') as int) AS k,
        |  count(*) AS n,
        |  cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    "q55_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01',
        |      cast(cast(ts as timestamp) as date)) AS x,
        |    cast(count(*) as bigint) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n_days,
        |    cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
        |    cast(sum(x * y) as bigint) AS sxy,
        |    cast(sum(x * x) as bigint) AS sx2
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days,
        |  round(cast(n_days * sxy - sx * sy as double)
        |    / cast(n_days * sx2 - sx * sx as double), 6) AS slope
        |FROM s ORDER BY event_type""".stripMargin,

    "q56_window_misc" ->
      """SELECT o_custkey, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  round(nth_value(cast(o_totalprice as double), 2) OVER w, 2) AS second_price,
        |  round(first_value(cast(o_totalprice as double)) OVER w, 2) AS first_price
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q58_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, cast(cast(ts as timestamp) as date) AS day,
        |    cast(count(*) as bigint) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS n,
        |    cast(sum(y) as bigint) AS sy, cast(sum(y * y) as bigint) AS qy
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, d.y,
        |  (d.y * st.n - st.sy) * (d.y * st.n - st.sy)
        |    > 4 * (st.n * st.qy - st.sy * st.sy) AS is_anomaly
        |FROM daily d JOIN st USING (event_type)
        |ORDER BY event_type, day""".stripMargin,

    "q59_theta_overlap" ->
      """WITH u AS (
        |  SELECT user_id, count(DISTINCT event_type) AS nt,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY user_id),
        |x AS (SELECT count(*) AS exact_union,
        |    cast(sum(CASE WHEN nt = 2 THEN 1 ELSE 0 END) as bigint) AS exact_overlap,
        |    cast(sum(CASE WHEN nt = 1 AND has_click = 1 THEN 1 ELSE 0 END) as bigint) AS exact_click_only
        |  FROM u)
        |SELECT exact_union, exact_overlap, exact_click_only,
        |  exact_union AS est_union, exact_overlap AS est_overlap,
        |  exact_click_only AS est_click_only,
        |  true AS union_ok, true AS overlap_ok, true AS click_only_ok
        |FROM x""".stripMargin,

    "q53_json_robust" ->
      """SELECT event_type, count(*) AS n,
        |  cast(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) as bigint)
        |    AS n_corrupt,
        |  cast(sum(CASE WHEN event_id % 7 = 0 THEN 0
        |    ELSE coalesce(cast(json_extract_string(props, '$.k') as bigint), 0)
        |    END) as bigint) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substring(p_type, 1, 3) AS type_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  cast(length(p_name) as int) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q17_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin,

    "q18_avg_by_nation" ->
      """SELECT n_name,
        |  cast(sum(cast(c_acctbal as decimal(12,2))) as double) / count(*) AS avg_bal,
        |  count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q19_event_gaps" ->
      """SELECT user_id, event_id, gap_us FROM (
        |  SELECT user_id, event_id, ts,
        |    epoch_us(cast(ts as timestamp)) - epoch_us(lag(cast(ts as timestamp), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM events)
        |WHERE gap_us IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,

    "q20_hourly_events" ->
      """SELECT strftime(date_trunc('hour', cast(ts as timestamp)), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
        |  count(*) AS n,
        |  cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "q67_hourly_weighted" ->
      s"""WITH w(event_type, weight) AS (VALUES ${
           EventWeights.map { case (t, v) => s"('$t', $v)" }.mkString(", ")})
        |SELECT strftime(date_trunc('hour', cast(ts as timestamp)), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
        |  count(*) AS n,
        |  cast(sum(cast(value as decimal(12,2)) * weight) as double) AS weighted_value
        |FROM events JOIN w USING (event_type)
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "q61_sliding_window" ->
      """WITH ev AS (SELECT cast(ts as timestamp) AS t, event_type FROM events),
        |hops AS (SELECT t, event_type,
        |    unnest([time_bucket(INTERVAL 30 MINUTES, t),
        |            time_bucket(INTERVAL 30 MINUTES, t) - INTERVAL 30 MINUTES]) AS w
        |  FROM ev)
        |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        |  count(*) AS n
        |FROM hops
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q62_event_markov" ->
      """WITH tr AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type, next_type, count(*) AS n FROM tr
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.event_type, c.next_type, c.n,
        |  cast((c.n * 1000) // m.tot as bigint) AS permille
        |FROM c JOIN m USING (event_type)
        |ORDER BY event_type, next_type""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q33_sql_text" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |  cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    "q34_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, ship_day,
        |  cast(sum(cast(l_quantity as decimal(12,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY ship_day
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) as double) AS qty_30d
        |FROM (SELECT *, datediff('day', DATE '1970-01-01', cast(l_shipdate as date)) AS ship_day
        |      FROM lineitem)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, ship_day, qty_30d""".stripMargin,

    "q41_correlated_subquery" ->
      """SELECT o_orderkey, cast(o_totalprice as double) AS total
        |FROM orders o
        |WHERE o_totalprice > 2 * (
        |  SELECT cast(sum(cast(l_extendedprice as decimal(12,2))) as double)
        |           / count(*)
        |  FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q50_big_orders" ->
      """WITH q AS (SELECT l_orderkey,
        |    cast(sum(cast(l_quantity as decimal(12,2))) as double) AS total_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, total_qty
        |FROM orders
        |JOIN q ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE total_qty > 150.0
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q47_gapfill" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', cast(ts as timestamp)) AS h FROM events),
        |span AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |hourly AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2)
        |SELECT t.event_type, strftime(hh.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  coalesce(hourly.n, 0) AS n
        |FROM types t CROSS JOIN hours hh
        |LEFT JOIN hourly ON hourly.event_type = t.event_type AND hourly.h = hh.h
        |ORDER BY t.event_type, hour_start""".stripMargin,

    "q68_forward_fill" ->
      """WITH ev AS (SELECT event_type,
        |    date_trunc('hour', cast(ts as timestamp)) AS h, value FROM events),
        |hourly AS (SELECT event_type, h, count(*) AS n,
        |    cast(sum(cast(value as decimal(12,2))) as double) AS hour_sum
        |  FROM ev GROUP BY 1, 2),
        |span AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, hh.h FROM types t CROSS JOIN hours hh)
        |SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  coalesce(hourly.n, 0) AS n,
        |  hourly.hour_sum IS NOT NULL AS observed,
        |  last_value(hourly.hour_sum IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        |FROM grid g LEFT JOIN hourly
        |  ON hourly.event_type = g.event_type AND hourly.h = g.h
        |ORDER BY g.event_type, hour_start""".stripMargin,

    "q48_cumulative_users" ->
      """WITH fs AS (SELECT user_id, min(cast(cast(ts as timestamp) as date)) AS day FROM events GROUP BY 1),
        |daily AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
        |  cast(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_users
        |FROM daily ORDER BY day""".stripMargin,

    "q49_funnel" ->
      """WITH s AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN cast(ts as timestamp) END) AS t1,
        |    min(CASE WHEN event_type = 'click' THEN cast(ts as timestamp) END) AS t2,
        |    min(CASE WHEN event_type = 'purchase' THEN cast(ts as timestamp) END) AS t3
        |  FROM events GROUP BY 1)
        |SELECT count(*) AS n_users,
        |  cast(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_signup,
        |  cast(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) as bigint) AS n_click_after,
        |  cast(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 THEN 1 ELSE 0 END) as bigint) AS n_purchase_after
        |FROM s""".stripMargin,

    "q52_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    cast(cast(ts as timestamp) as date) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
        |  cast(date_diff('day', c.cohort_day, a.day) as int) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q46_hll_rollup" ->
      """SELECT strftime(date_trunc('month', cast(ts as timestamp)), '%Y-%m') AS month,
        |  count(DISTINCT user_id) AS n_exact,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    <= count(DISTINCT user_id) * 0.05 AS ok
        |FROM events
        |GROUP BY 1 ORDER BY month""".stripMargin,

    "q40_zorder_key" ->
      s"""WITH s AS (SELECT min(l_orderkey) AS lo_o, max(l_orderkey) AS hi_o,
        |    min(l_partkey) AS lo_p, max(l_partkey) AS hi_p FROM lineitem),
        |b AS (SELECT l_orderkey, l_linenumber, l_partkey,
        |  cast(least(255, greatest(0, floor((cast(l_orderkey as double) - lo_o) / (hi_o - lo_o + 1e-9) * 256))) as bigint) AS bo,
        |  cast(least(255, greatest(0, floor((cast(l_partkey as double) - lo_p) / (hi_p - lo_p + 1e-9) * 256))) as bigint) AS bp
        |  FROM lineitem, s)
        |SELECT l_orderkey, l_linenumber, l_partkey,
        |  ${(0 until 8).map(i =>
             s"(((bo >> $i) & 1) << ${2 * i}) | (((bp >> $i) & 1) << ${2 * i + 1})")
             .mkString(" | ")} AS zv
        |FROM b ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "q39_salted_join" ->
      s"""WITH w(event_type, weight) AS (VALUES ${
           EventWeights.map { case (t, v) => s"('$t', $v)" }.mkString(", ")})
        |SELECT event_type, count(*) AS n,
        |  cast(sum(cast(value as decimal(12,2)) * weight) as double) AS weighted_value
        |FROM events JOIN w USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the PLAIN (unsalted) join over the same planted 90%-hot key —
    // salting must be output-invisible
    "q65_skew_salted" ->
      """WITH f AS (SELECT
        |    CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS skew_user,
        |    value FROM events),
        |w AS (SELECT DISTINCT skew_user, skew_user % 7 + 1 AS weight FROM f)
        |SELECT skew_user, count(*) AS n,
        |  cast(sum(cast(value as decimal(12,2)) * weight) as double) AS weighted_value
        |FROM f JOIN w USING (skew_user)
        |GROUP BY skew_user ORDER BY skew_user""".stripMargin,

    "q38_approx_percentile" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |p AS (
        |  SELECT l_returnflag,
        |    max(CASE WHEN rn = ceil(n * 0.5) THEN l_extendedprice END) AS p50,
        |    max(CASE WHEN rn = ceil(n * 0.95) THEN l_extendedprice END) AS p95,
        |    max(n) AS n
        |  FROM ranked GROUP BY 1),
        |a AS (
        |  SELECT l_returnflag,
        |    approx_quantile(l_extendedprice, 0.5) AS a50,
        |    approx_quantile(l_extendedprice, 0.95) AS a95
        |  FROM lineitem GROUP BY 1)
        |SELECT p.l_returnflag, p.n, p.p50, p.p95,
        |  abs(a.a50 - p.p50) <= p.p50 * 0.05 AS p50_ok,
        |  abs(a.a95 - p.p95) <= p.p95 * 0.05 AS p95_ok
        |FROM p JOIN a USING (l_returnflag) ORDER BY 1""".stripMargin,

    "q37_click_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  epoch_us(cast(p.ts as timestamp)) - epoch_us(cast(c.ts as timestamp)) AS delay_us
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
        | AND epoch_us(cast(p.ts as timestamp)) >= epoch_us(cast(c.ts as timestamp))
        | AND epoch_us(cast(p.ts as timestamp)) - epoch_us(cast(c.ts as timestamp)) <= 1800000000
        |WHERE c.event_type = 'click'
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,

    "q36_range_join" ->
      """SELECT a.event_id AS p_id, count(*) AS n_nearby,
        |  cast(sum(cast(b.value as decimal(12,2))) as double) AS sum_value
        |FROM events a JOIN events b
        |  ON b.event_type IN ('click', 'view')
        | AND abs(epoch_us(cast(b.ts as timestamp)) - epoch_us(cast(a.ts as timestamp))) <= 30000000
        |WHERE a.event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  cast(ntile(4) OVER w as int) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q29_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q30_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin,

    "q31_sample" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE cast('0x' || substring(md5(cast(doc_id as varchar)), 2, 15) as bigint) % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    "q26_median" ->
      """SELECT l_returnflag, median(l_quantity) AS median_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q27_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) + 0.0 AS sd_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
        |  round(covar_samp(l_discount, l_tax), 4) + 0.0 AS cov_disc_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_event_type_sets" ->
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q25_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, cast(ts as timestamp) AS ts FROM events),
        |g AS (SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, sum(new_sess) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM g)
        |SELECT user_id, cast(seq as int) AS session_seq, count(*) AS n_events,
        |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
        |FROM s GROUP BY user_id, seq ORDER BY user_id, session_seq""".stripMargin,

    "q24_topk_custom" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) as int) AS rank
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,

    "q23_asof_join" ->
      """WITH e AS (SELECT user_id, cast(ts as timestamp) AS ts, event_id, event_type, value FROM events),
        |err AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'error'),
        |pur AS (SELECT user_id, ts, max(value) AS purchase_value FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT err.user_id, err.event_id, epoch_us(err.ts) AS err_us,
        |  epoch_us(pur.ts) AS purchase_us, pur.purchase_value
        |FROM err ASOF JOIN pur ON err.user_id = pur.user_id AND err.ts >= pur.ts
        |ORDER BY err.user_id, event_id""".stripMargin,

    "q22_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(*) AS n,
        |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |    <= count(DISTINCT l_partkey) * 0.15 AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q21_path_parse" ->
      """WITH p AS (SELECT doc_id, source || '/doc_' || doc_id || '.pdf' AS path FROM documents)
        |SELECT doc_id, path,
        |  string_split(path, '/')[-1] AS basename,
        |  regexp_replace(string_split(path, '/')[-1], '\.[a-z]+$', '') AS stem,
        |  string_split(path, '.')[-1] AS ext
        |FROM p ORDER BY doc_id""".stripMargin
  )
}
