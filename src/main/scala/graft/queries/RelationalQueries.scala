package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Engine, QueryDef}

/** The relational surface of the engine (SURVEY.md §2.2, §2.5–2.9).
  *
  * The reference (danilop/SampleBatchProcessing) has no relational
  * operators at all — each category below is marked NOT PRESENT in
  * SURVEY.md §2 and exposed via Spark built-ins, declared through the
  * DataFrame/Dataset API so Catalyst owns planning (pushdown, pruning,
  * join selection, AQE). Scale notes per query are in the `doc` field.
  */
object RelationalQueries {

  private def T(s: SparkSession, dir: String) = Engine.Tables(s, dir)

  /** Money-safe aggregation: sums run in exact DECIMAL (order-independent,
    * no float drift), then cast back to DOUBLE — bitwise-identical in
    * Spark and DuckDB, so the driver's hash compare can't trip on
    * last-ulp or rounding-mode differences. See QueryDef scaladoc.
    */
  private def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(12,2)")

  val defs: ListMap[String, QueryDef] = ListMap(
    // ------------------------------------------------------------------
    "q01_pricing_summary" -> QueryDef(
      fn = { (s, dir) =>
        val li = T(s, dir).lineitem
        // Filter is pushed to the parquet scan; agg is partial+final
        // hash agg (map-side combine), so the shuffle carries only
        // (flag,status) groups — constant-size at any SF.
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
              * (lit(1) + dec(col("l_tax")))).cast("double").as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
               round(avg(l_quantity), 4)      AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4)      AS avg_disc,
               count(*)                       AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
      doc = "TPC-H-Q1-style pricing summary; hash agg w/ map-side combine."),

    // ------------------------------------------------------------------
    "q02_filter_project" -> QueryDef(
      fn = { (s, dir) =>
        // Both predicate and 3-column projection reach the scan:
        // .explain shows PushedFilters + pruned ReadSchema.
        T(s, dir).lineitem
          .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'"""),
      doc = "Projection + predicate pushdown to parquet scan."),

    // ------------------------------------------------------------------
    "q03_join_broadcast" -> QueryDef(
      fn = { (s, dir) =>
        val t = T(s, dir)
        // customer is the small dim at every SF (orders:customer = 10:1,
        // lineitem:customer = 40:1): broadcast it so the big fact side
        // never shuffles. At 100 TB the fact stream stays pipelined.
        t.orders
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      },
      oracle = Some("""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment"""),
      doc = "Broadcast hash join dim⋈fact, no fact-side shuffle."),

    // ------------------------------------------------------------------
    "q04_star_join" -> QueryDef(
      fn = { (s, dir) =>
        val t = T(s, dir)
        // Star: tiny dims (region/nation) broadcast; the single big
        // shuffle is lineitem⋈orders on orderkey, which AQE can
        // re-plan (skew-split) at runtime.
        val dims = broadcast(
          t.region.join(t.nation, col("n_regionkey") === col("r_regionkey")))
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(dims, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("revenue"))
      },
      oracle = Some("""
        SELECT r_name, n_name, count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey   = c_custkey
        JOIN lineitem ON l_orderkey  = o_orderkey
        GROUP BY r_name, n_name"""),
      doc = "5-way star join: broadcast dims, one shuffled fact join."),

    // ------------------------------------------------------------------
    "q05_window_funcs" -> QueryDef(
      fn = { (s, dir) =>
        // One shuffle on o_custkey serves all three window specs
        // (same partitioning); deterministic tie-break by o_orderkey.
        val byDate = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val bySpend = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T(s, dir).orders
          .select(col("o_orderkey"), col("o_custkey"),
            row_number().over(byDate).as("rn"),
            rank().over(bySpend).as("spend_rank"),
            dense_rank().over(bySpend).as("spend_dense_rank"),
            ntile(4).over(byDate).as("quartile"),
            sum(dec(col("o_totalprice")))
              .over(byDate.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double").as("cum_spend"),
            lag(col("o_totalprice"), 1, 0.0).over(byDate).as("prev_price"),
            lead(col("o_totalprice"), 1, 0.0).over(byDate).as("next_price"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER w_date AS INTEGER) AS rn,
               CAST(rank() OVER w_spend AS INTEGER) AS spend_rank,
               CAST(dense_rank() OVER w_spend AS INTEGER)
                 AS spend_dense_rank,
               CAST(ntile(4) OVER w_date AS INTEGER) AS quartile,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS cum_spend,
               coalesce(lag(o_totalprice, 1) OVER w_date, 0.0)
                 AS prev_price,
               coalesce(lead(o_totalprice, 1) OVER w_date, 0.0)
                 AS next_price
        FROM orders
        WINDOW w_date AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w_spend AS (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey)"""),
      doc = "row_number/rank/dense_rank/ntile/lag/lead/running-sum windows."),

    // ------------------------------------------------------------------
    "q06_topk" -> QueryDef(
      fn = { (s, dir) =>
        // Catalyst plans TakeOrderedAndProject: per-partition top-k then
        // a k-row merge on the driver — no global sort at any SF.
        T(s, dir).orders
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select("o_orderkey", "o_totalprice")
          .limit(25)
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""),
      doc = "Top-k via TakeOrderedAndProject (no full sort)."),

    // ------------------------------------------------------------------
    "q07_set_ops" -> QueryDef(
      fn = { (s, dir) =>
        val t = T(s, dir)
        val c = t.customer.select(col("c_nationkey").as("nkey"))
        val sup = t.supplier.select(col("s_nationkey").as("nkey"))
        c.intersect(sup).withColumn("op", lit("intersect"))
          .unionByName(c.except(sup).withColumn("op", lit("except")))
          .unionByName(c.union(sup).distinct().withColumn("op", lit("union")))
      },
      oracle = Some("""
        SELECT nkey, 'intersect' AS op FROM
          (SELECT c_nationkey AS nkey FROM customer
           INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nkey, 'except' AS op FROM
          (SELECT c_nationkey AS nkey FROM customer
           EXCEPT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nkey, 'union' AS op FROM
          (SELECT c_nationkey AS nkey FROM customer
           UNION SELECT s_nationkey FROM supplier)"""),
      doc = "intersect / except / union (distinct set semantics)."),

    // ------------------------------------------------------------------
    "q08_rollup" -> QueryDef(
      fn = { (s, dir) =>
        T(s, dir).lineitem
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast("double").as("qty"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""),
      doc = "ROLLUP grouping sets (Expand + single hash agg)."),

    // ------------------------------------------------------------------
    "q09_count_distinct" -> QueryDef(
      fn = { (s, dir) =>
        T(s, dir).lineitem.agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
      },
      oracle = Some("""
        SELECT count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(*) AS n_rows
        FROM lineitem"""),
      doc = "Exact multi-column count distinct (Expand-based)."),

    // ------------------------------------------------------------------
    "q10_semi_anti_join" -> QueryDef(
      fn = { (s, dir) =>
        val t = T(s, dir)
        val ordered = t.customer.join(t.orders,
          col("c_custkey") === col("o_custkey"), "left_semi")
        val never = t.customer.join(t.orders,
          col("c_custkey") === col("o_custkey"), "left_anti")
        ordered.agg(count(lit(1)).as("n")).withColumn("op", lit("semi"))
          .unionByName(
            never.agg(count(lit(1)).as("n")).withColumn("op", lit("anti")))
      },
      oracle = Some("""
        SELECT count(*) AS n, 'semi' AS op FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT count(*) AS n, 'anti' AS op FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""),
      doc = "left_semi / left_anti == EXISTS / NOT EXISTS."),

    // ------------------------------------------------------------------
    "q11_scalar_subquery" -> QueryDef(
      fn = { (s, dir) =>
        // SQL surface demo: Catalyst rewrites the scalar subquery into
        // a broadcast-scalar; no driver-side collect in user code.
        T(s, dir).orders.createOrReplaceTempView("graft_orders")
        s.sql("""
          SELECT o_orderkey, o_totalprice
          FROM graft_orders
          WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM graft_orders)""")
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)"""),
      doc = "Scalar subquery in predicate (2x avg threshold)."),

    // ------------------------------------------------------------------
    "q12_case_scalar" -> QueryDef(
      fn = { (s, dir) =>
        T(s, dir).lineitem
          .filter(col("l_orderkey") % 100 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 30, "mid")
              .otherwise("high").as("qty_band"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'high' END AS qty_band,
               l_extendedprice * (1 - l_discount) AS net
        FROM lineitem WHERE l_orderkey % 100 = 0"""),
      doc = "CASE/arithmetic scalar expressions (whole-stage codegen)."),

    // ------------------------------------------------------------------
    "q13_date_agg" -> QueryDef(
      fn = { (s, dir) =>
        T(s, dir).orders
          .groupBy(year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("o_totalprice"))).cast("double").as("total"))
      },
      oracle = Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1, 2"""),
      doc = "Calendar extraction + agg (year/month as exact ints)."),

    // ------------------------------------------------------------------
    "q14_json_extract" -> QueryDef(
      fn = { (s, dir) =>
        // Native JSON path: from_json with an explicit schema (the
        // engine's F4 analog, SURVEY.md §2.3); schema'd parse beats
        // regex at scale (single pass, codegen'd).
        T(s, dir).events
          .select(col("event_type"), col("value"),
            from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("value"))).cast("double").as("sum_value"),
            sum(col("k").cast("long")).as("sum_k"))
      },
      oracle = Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
               CAST(sum(CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT))
                 AS BIGINT) AS sum_k
        FROM events GROUP BY event_type"""),
      doc = "JSON field extraction (from_json) + agg over events.props."),

    // ------------------------------------------------------------------
    "q15_tumbling_window" -> QueryDef(
      fn = { (s, dir) =>
        // Batch twin of the streaming tumbling window (same window()
        // expression works under readStream + watermark; see
        // graft.streaming). Emitted as exact integer micros.
        T(s, dir).events
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("v"))
          .select(unix_micros(col("window.start")).as("hour_start_us"),
            col("event_type"), col("n"), col("v"))
      },
      oracle = Some("""
        SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2"""),
      doc = "1h tumbling event-time window (batch twin of streaming)."),

    // ------------------------------------------------------------------
    "q16_sessionize" -> QueryDef(
      fn = { (s, dir) =>
        // session_window: gap-based sessions, 30 min. Works identically
        // in batch and streaming mode (Spark merges overlapping
        // [ts, ts+gap) intervals per key).
        T(s, dir).events
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            sum(dec(col("value"))).cast("double").as("session_value"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            col("n_events"), col("session_value"))
      },
      oracle = Some("""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          IS NULL THEN 1
                      WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          >= INTERVAL 30 MINUTE THEN 1
                      ELSE 0 END AS new_session
          FROM events),
        sessioned AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged)
        SELECT user_id, epoch_us(min(ts)) AS session_start_us,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        FROM sessioned GROUP BY user_id, sid"""),
      doc = "Gap-based sessionization (session_window, 30 min gap)."),

    // ------------------------------------------------------------------
    "q17_pivot" -> QueryDef(
      fn = { (s, dir) =>
        T(s, dir).events
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("signup", "purchase", "error"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("signup", "purchase", "error"))
      },
      oracle = Some("""
        SELECT user_id,
               count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'error'    THEN 1 END) AS error
        FROM events GROUP BY user_id"""),
      doc = "Pivot (explicit value list → single-pass conditional agg)."),

    // ------------------------------------------------------------------
    "q18_explode" -> QueryDef(
      fn = { (s, dir) =>
        // Generator surface: posexplode over ArrayType; min/max are
        // order-insensitive so float compare is exact.
        T(s, dir).embeddings
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("dim"),
            min(col("v")).cast("double").as("v_min"),
            max(col("v")).cast("double").as("v_max"))
      },
      oracle = Some("""
        SELECT vec_id, count(*) AS dim,
               CAST(min(v) AS DOUBLE) AS v_min,
               CAST(max(v) AS DOUBLE) AS v_max
        FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
        GROUP BY vec_id"""),
      doc = "explode/posexplode generators over ArrayType columns."),

    // ------------------------------------------------------------------
    "q19_grouping_sets" -> QueryDef(
      fn = { (s, dir) =>
        val t = T(s, dir)
        t.orders.createOrReplaceTempView("graft_orders_gs")
        s.sql("""
          SELECT o_orderstatus, o_orderpriority, count(*) AS n
          FROM graft_orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""),
      doc = "GROUPING SETS via SQL surface."),

    // ------------------------------------------------------------------
    "q20_join_full_outer" -> QueryDef(
      fn = { (s, dir) =>
        val t = T(s, dir)
        // Full outer over nation-key presence on either side; small
        // inputs → AQE converts the SMJ to broadcast where legal.
        val cn = t.customer.groupBy(col("c_nationkey").as("nkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sn = t.supplier.groupBy(col("s_nationkey").as("nkey"))
          .agg(count(lit(1)).as("n_supp"))
        cn.join(sn, Seq("nkey"), "full_outer")
          .na.fill(0L, Seq("n_cust", "n_supp"))
      },
      oracle = Some("""
        SELECT coalesce(c.nkey, s.nkey) AS nkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nkey, count(*) AS n_cust
              FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nkey, count(*) AS n_supp
              FROM supplier GROUP BY 1) s
        USING (nkey)"""),
      doc = "Full outer join with null-side fill."),

    // ------------------------------------------------------------------
    "q21_sliding_window" -> QueryDef(
      fn = { (s, dir) =>
        // 30-min windows sliding by 10: each event lands in exactly 3
        // windows (Expand node, no self-join).
        T(s, dir).events
          .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
          .agg(count(lit(1)).as("n"))
          .select(unix_micros(col("window.start")).as("ws_us"), col("n"))
      },
      oracle = Some("""
        SELECT (epoch_us(ts) // 600000000 - k.k) * 600000000 AS ws_us,
               count(*) AS n
        FROM events CROSS JOIN (VALUES (0), (1), (2)) k(k)
        GROUP BY 1"""),
      doc = "Sliding event-time windows (30m/10m, 3 windows per event)."),

    // ------------------------------------------------------------------
    "q22_cube" -> QueryDef(
      fn = { (s, dir) =>
        T(s, dir).orders
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""),
      doc = "CUBE over two dimensions (all 4 grouping sets)."),

    // ------------------------------------------------------------------
    "q23_approx_distinct" -> QueryDef(
      fn = { (s, dir) =>
        // HLL++ sketch: implementation-defined estimate, so no DuckDB
        // hash oracle (its HLL differs); the rows-only driver check
        // plus RelationalSpec error-bound assertion cover it. At
        // scale this replaces the memory-heavy exact distinct.
        T(s, dir).lineitem.agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      },
      oracle = None,
      doc = "approx_count_distinct (HLL++) estimates (rows-only check)."),

    // ------------------------------------------------------------------
    "q24_salted_agg" -> QueryDef(
      fn = { (s, dir) =>
        // Manual skew-splitting aggregation (Layout.saltedSumCount):
        // hot keys are spread over 16 reducers in the partial stage.
        // Value pre-cast to DECIMAL so the salted partial sums are
        // order-independent (oracle-exact).
        val li = T(s, dir).lineitem
          .withColumn("qty_dec", dec(col("l_quantity")))
        graft.operators.Layout
          .saltedSumCount(li, "l_returnflag", "qty_dec", salts = 16)
          .select(col("l_returnflag"),
            col("sum_qty_dec").cast("double").as("sum_qty"), col("n"))
      },
      oracle = Some("""
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag"""),
      doc = "Two-phase salted aggregation == plain groupBy (skew path)."),

    // ------------------------------------------------------------------
    "q25_bucketed_join" -> QueryDef(
      fn = { (s, dir) =>
        // Shuffle-once-at-ingest: write both sides bucketed on the
        // join key, then join + aggregate with zero Exchange on the
        // fact tables (LayoutSpec asserts the plan property). The
        // ingest write happens ONCE per (session, sf dir) — that is
        // the whole point of bucketing: pay the shuffle at landing,
        // then every repeated join is exchange-free. Re-bucketing per
        // query would charge the ingest cost to the join benchmark.
        val t = T(s, dir)
        val tag = Integer.toHexString(dir.hashCode)
        val (ot, lt) = (s"graft_b_orders_$tag", s"graft_b_lineitem_$tag")
        if (!s.catalog.tableExists(ot))
          graft.operators.Layout.writeBucketed(
            t.orders.select("o_orderkey", "o_totalprice"),
            ot, "o_orderkey", 8)
        if (!s.catalog.tableExists(lt))
          graft.operators.Layout.writeBucketed(
            t.lineitem.select(col("l_orderkey").as("o_orderkey"),
              col("l_quantity")),
            lt, "o_orderkey", 8)
        graft.operators.Layout.bucketedJoin(s, ot, lt, "o_orderkey")
          .groupBy()
          .agg(count(lit(1)).as("n_rows"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      },
      oracle = Some("""
        SELECT count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""),
      doc = "Bucketed co-located join (no fact-side shuffle)."),

    // ------------------------------------------------------------------
    "q26_asof_carry" -> QueryDef(
      fn = { (s, dir) =>
        // As-of semantics composed from built-ins (SURVEY.md §7
        // preference (a)): for each event, the value of the same
        // user's most recent STRICTLY-PRIOR 'error' event. One window
        // pass — no join at all, which is exactly why composing beats
        // a custom as-of join operator here: the sort-merge work an
        // AsOfJoinExec would do is the same single shuffle+sort.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        T(s, dir).events
          .withColumn("prev_error_value",
            last(when(col("event_type") === "error", col("value")), true)
              .over(w))
          .select(col("event_id"), col("user_id"),
            coalesce(col("prev_error_value"), lit(-1.0))
              .as("prev_error_value"))
      },
      oracle = Some("""
        SELECT event_id, user_id,
               coalesce(
                 last_value(CASE WHEN event_type = 'error' THEN value END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 -1.0) AS prev_error_value
        FROM events"""),
      doc = "As-of value carry (most recent prior matching row per key)."),

    // ------------------------------------------------------------------
    "q27_range_join" -> QueryDef(
      fn = { (s, dir) =>
        // Interval/range join at scale: bucketize time to the window
        // width, join each probe row to its own and previous bucket
        // only, then apply the exact range predicate — turns the
        // quadratic theta-join (BroadcastNestedLoop) into an
        // equi-join shuffle with 2x fan-out. Pairs: error events
        // joined to purchases of the SAME user within the preceding
        // 10 minutes.
        val ev = T(s, dir).events
        val win = 600000000L // 10 min in micros
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"),
            unix_micros(col("ts")).as("err_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            unix_micros(col("ts")).as("p_us"))
        val probes = errors.withColumn("bucket",
          explode(array(expr(s"err_us div $win"),
            expr(s"err_us div $win") - 1)))
        val build = purchases.withColumn("bucket", expr(s"p_us div $win"))
        probes.join(build, Seq("user_id", "bucket"))
          .filter(col("p_us") >= col("err_us") - win &&
            col("p_us") < col("err_us"))
          .select("err_id", "p_id", "user_id").distinct()
      },
      oracle = Some("""
        SELECT DISTINCT e.event_id AS err_id, p.event_id AS p_id, e.user_id
        FROM events e JOIN events p
          ON e.user_id = p.user_id
         AND e.event_type = 'error' AND p.event_type = 'purchase'
         AND epoch_us(p.ts) >= epoch_us(e.ts) - 600000000
         AND epoch_us(p.ts) < epoch_us(e.ts)"""),
      doc = "Bucketized range join (theta-join as equi-join + filter)."),

    // ------------------------------------------------------------------
    "q28_percentiles" -> QueryDef(
      fn = { (s, dir) =>
        // Exact interpolated percentiles (both engines use the
        // standard (1-f)*lower + f*upper continuous quantile).
        T(s, dir).orders
          .groupBy(col("o_orderstatus"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      },
      oracle = Some("""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders GROUP BY o_orderstatus"""),
      doc = "Exact continuous percentiles per group."),

    // ------------------------------------------------------------------
    "q29_stats_agg" -> QueryDef(
      fn = { (s, dir) =>
        // Statistical aggregate family; results rounded to absorb the
        // engines' different accumulation schemes (Welford vs naive).
        T(s, dir).lineitem
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
            round(var_samp(col("l_discount")), 6).as("var_disc"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6)
              .as("corr_qty_price"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
              .as("covar_qty_price"))
      },
      oracle = Some("""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_discount), 6) AS var_disc,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2)
                 AS covar_qty_price
        FROM lineitem GROUP BY l_returnflag"""),
      doc = "stddev/variance/corr/covar aggregate family."),

    // ------------------------------------------------------------------
    "q30_string_funcs" -> QueryDef(
      fn = { (s, dir) =>
        T(s, dir).part
          .filter(col("p_partkey") % 7 === 0)
          .select(col("p_partkey"),
            upper(col("p_name")).as("uname"),
            substring(col("p_name"), 1, 5).as("prefix5"),
            lpad(col("p_brand"), 12, "*").as("padded"),
            translate(col("p_type"), "aeiou", "AEIOU").as("xlated"),
            length(regexp_replace(col("p_name"), "[aeiou]", "")).as("n_consonants"),
            levenshtein(col("p_brand"), lit("Brand#00")).as("brand_dist"),
            // F5 string interpolation (reference's %-format logging)
            format_string("%s|%d", col("p_brand"), col("p_size")).as("tagged"))
      },
      oracle = Some("""
        SELECT p_partkey,
               upper(p_name) AS uname,
               substring(p_name, 1, 5) AS prefix5,
               lpad(p_brand, 12, '*') AS padded,
               translate(p_type, 'aeiou', 'AEIOU') AS xlated,
               CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g'))
                 AS INTEGER) AS n_consonants,
               CAST(levenshtein(p_brand, 'Brand#00') AS INTEGER)
                 AS brand_dist,
               printf('%s|%d', p_brand, p_size) AS tagged
        FROM part WHERE p_partkey % 7 = 0"""),
      doc = "Scalar string-function registry sweep."),

    // ------------------------------------------------------------------
    "q31_array_agg" -> QueryDef(
      fn = { (s, dir) =>
        // Order-insensitive array aggregation: sort the collected list
        // so both engines produce identical arrays.
        // output as a joined string, not a raw array: engine-agnostic
        // to hash, while still exercising collect_list + array_sort
        T(s, dir).nation
          .groupBy(col("n_regionkey"))
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n
        FROM nation GROUP BY n_regionkey"""),
      doc = "collect_list + deterministic array_sort per group."),

    // ------------------------------------------------------------------
    "q32_unpivot" -> QueryDef(
      fn = { (s, dir) =>
        // Wide-to-long reshaping (unpivot/melt): the inverse of q17's
        // pivot. Spark plans it as a zero-shuffle Expand (one input
        // row -> 4 metric rows) feeding the usual partial+final agg —
        // at scale the reshape itself never exchanges data.
        T(s, dir).lineitem
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "metric", "value")
          .groupBy(col("l_returnflag"), col("metric"))
          .agg(round(avg(col("value")), 4).as("avg_value"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value
          FROM lineitem
          UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice
          FROM lineitem
          UNION ALL SELECT l_returnflag, 'l_discount', l_discount
          FROM lineitem
          UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        SELECT l_returnflag, metric, round(avg(value), 4) AS avg_value,
               count(*) AS n
        FROM u GROUP BY 1, 2"""),
      doc = "Unpivot (wide->long melt) + per-metric aggregation."),

    // ------------------------------------------------------------------
    "q33_interval_join" -> QueryDef(
      fn = { (s, dir) =>
        // Batch twin of EventStreams.intervalJoin (identical join
        // expression runs under readStream with watermarks): for each
        // purchase, count the same user's clicks in the preceding 15
        // minutes. Catalyst plans the equi-key + time-range predicate
        // as a hash join on user_id with the range as a post-filter —
        // one shuffle, no BroadcastNestedLoop.
        val e = T(s, dir).events
        val f = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("user_id"))
        val sig = e.filter(col("event_type") === "click")
          .select(col("ts").as("rts"), col("user_id").as("s_user_id"))
        f.join(sig, expr(
          """user_id = s_user_id AND
             rts BETWEEN ts - INTERVAL 15 MINUTES AND ts"""), "left")
          .groupBy(col("event_id"))
          .agg(count(col("rts")).as("n_recent_clicks"))
      },
      oracle = Some("""
        SELECT f.event_id,
               count(s.rts) AS n_recent_clicks
        FROM (SELECT event_id, ts, user_id FROM events
              WHERE event_type = 'purchase') f
        LEFT JOIN (SELECT ts AS rts, user_id AS s_user_id FROM events
                   WHERE event_type = 'click') s
          ON f.user_id = s.s_user_id
         AND s.rts BETWEEN f.ts - INTERVAL 15 MINUTE AND f.ts
        GROUP BY f.event_id"""),
      doc = "Interval join (batch twin of the stream-stream join): " +
        "clicks within 15 min before each purchase."),

    // ------------------------------------------------------------------
    "q34_zorder_key" -> QueryDef(
      fn = { (s, dir) =>
        // Morton (Z-order) clustering key over (l_partkey, l_suppkey),
        // both normalized to [0, 2^16) by integer division against the
        // table max — the layout key Layout.zorderWrite range-
        // partitions by so min/max skipping prunes files for EITHER
        // dimension's predicates. Pure integer bit ladder, fully
        // oracle-reproducible; the clustering EFFECT (bounding-box
        // shrinkage) is asserted in LayoutSpec.
        val li = T(s, dir).lineitem
        // The normalizers ride along as a broadcast 1-row frame
        // instead of a driver-side .head(): one distributed plan, no
        // synchronous extra pass before the main query (at 100 TB a
        // driver collect here is two full-column scans on the
        // critical path).
        val mx = li.agg((max(col("l_partkey")) + 1).as("__mp1"),
          (max(col("l_suppkey")) + 1).as("__ms1"))
        li.crossJoin(broadcast(mx))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            graft.operators.Layout.zValue(
              expr("l_partkey * 65536 div __mp1"),
              expr("l_suppkey * 65536 div __ms1")).as("zval"))
      },
      oracle = Some("""
        WITH n AS (
          SELECT l_orderkey, l_linenumber,
            (l_partkey * 65536) // ((SELECT max(l_partkey) + 1 FROM lineitem))
              AS xb,
            (l_suppkey * 65536) // ((SELECT max(l_suppkey) + 1 FROM lineitem))
              AS yb
          FROM lineitem),
        s1 AS (SELECT l_orderkey, l_linenumber,
            ((xb | (xb << 8)) & 16711935) AS x, ((yb | (yb << 8)) & 16711935) AS y
          FROM n),
        s2 AS (SELECT l_orderkey, l_linenumber,
            ((x | (x << 4)) & 252645135) AS x, ((y | (y << 4)) & 252645135) AS y
          FROM s1),
        s3 AS (SELECT l_orderkey, l_linenumber,
            ((x | (x << 2)) & 858993459) AS x, ((y | (y << 2)) & 858993459) AS y
          FROM s2),
        s4 AS (SELECT l_orderkey, l_linenumber,
            ((x | (x << 1)) & 1431655765) AS x, ((y | (y << 1)) & 1431655765) AS y
          FROM s3)
        SELECT l_orderkey, l_linenumber,
               CAST(x | (y << 1) AS BIGINT) AS zval
        FROM s4"""),
      doc = "Morton Z-order clustering key over two normalized " +
        "dimensions (bit-interleave ladder; layout key for 2-D " +
        "data skipping)."),

    // ------------------------------------------------------------------
    "q35_lateral_topk" -> QueryDef(
      fn = { (s, dir) =>
        // Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL
        // spelling of top-k-per-group. Catalyst decorrelates it into
        // the same window/group-limit machinery as c07; registered
        // through spark.sql to pin the LATERAL surface itself.
        val t = T(s, dir)
        t.nation.createOrReplaceTempView("nation")
        t.customer.createOrReplaceTempView("customer")
        s.sql("""
          SELECT n.n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
          FROM nation n,
          LATERAL (SELECT c_name, c_acctbal FROM customer
                   WHERE c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_name LIMIT 2) c""")
      },
      oracle = Some("""
        SELECT n.n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
        FROM nation n,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) c"""),
      doc = "Correlated LATERAL top-2-per-nation (decorrelated by " +
        "Catalyst into group-limit machinery)."),

    // ------------------------------------------------------------------
    "q36_multiset_ops" -> QueryDef(
      fn = { (s, dir) =>
        // Multiset (bag) set operations: EXCEPT ALL / INTERSECT ALL
        // preserve duplicate counts, unlike q07's distinct-set forms.
        // One hash shuffle each on the value — count-based, no sort.
        val li = T(s, dir).lineitem
        val a = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
        val b = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
        a.exceptAll(b).withColumn("op", lit("except_all"))
          .unionByName(
            a.intersectAll(b).withColumn("op", lit("intersect_all")))
      },
      oracle = Some("""
        SELECT l_suppkey, 'except_all' AS op FROM (
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
          EXCEPT ALL
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A')
        UNION ALL
        SELECT l_suppkey, 'intersect_all' AS op FROM (
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
          INTERSECT ALL
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A')"""),
      doc = "Multiset EXCEPT ALL / INTERSECT ALL (duplicate-count " +
        "preserving set ops)."),

    // ------------------------------------------------------------------
    "q37_histogram" -> QueryDef(
      fn = { (s, dir) =>
        // Data profiling: fixed-width value histogram of a measure
        // column — one hash-agg shuffle of (bucket) partials, the
        // ANALYZE-style distribution summary every lakehouse needs
        // before choosing layouts/filters. Fixed bucket edges (width
        // 5000 from 0) rather than min/max-derived ones: no pre-pass
        // over the data, and bucket ids are stable across snapshots
        // so histograms diff cleanly between corpus versions. Sum
        // runs through exact DECIMAL (order-independent), per the
        // oracle float discipline.
        T(s, dir).lineitem
          .groupBy(floor(col("l_extendedprice") / 5000).cast("long")
            .as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("l_extendedprice")).as("lo"),
            max(col("l_extendedprice")).as("hi"),
            sum(col("l_extendedprice").cast("decimal(12,2)"))
              .cast("double").as("sum_price"))
      },
      oracle = Some("""
        SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
               count(*) AS n,
               min(l_extendedprice) AS lo,
               max(l_extendedprice) AS hi,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_price
        FROM lineitem GROUP BY 1"""),
      doc = "Fixed-width value histogram of a measure column " +
        "(profiling pass: stable bucket ids, decimal-exact sums)."),

    // ------------------------------------------------------------------
    "q38_recursive_cte" -> QueryDef(
      fn = { (s, dir) =>
        // WITH RECURSIVE (new in Spark 4) — the SQL spelling of
        // iterative closure: every doc's ancestor chain in the
        // implicit binary-tree hierarchy parent = id div 2. Each
        // recursion step is one self-join; the recursion terminates
        // naturally when the chain reaches the root (ancestor < 2
        // stops recursing), after O(log n) rounds — the same
        // convergence shape clusterReps implements programmatically.
        // Spark requires the UNION ALL form; output is DISTINCT
        // (doc_id, ancestor) so the bag semantics can't diverge.
        T(s, dir).documents.createOrReplaceTempView("documents")
        s.sql("""
          WITH RECURSIVE anc AS (
            SELECT doc_id, doc_id DIV 2 AS ancestor
            FROM documents WHERE doc_id >= 2
            UNION ALL
            SELECT a.doc_id, a.ancestor DIV 2 AS ancestor
            FROM anc a WHERE a.ancestor >= 2)
          SELECT DISTINCT doc_id, ancestor FROM anc""")
      },
      oracle = Some("""
        WITH RECURSIVE anc AS (
          SELECT doc_id, doc_id // 2 AS ancestor
          FROM documents WHERE doc_id >= 2
          UNION ALL
          SELECT a.doc_id, a.ancestor // 2 AS ancestor
          FROM anc a WHERE a.ancestor >= 2)
        SELECT DISTINCT doc_id, ancestor FROM anc"""),
      doc = "Recursive CTE ancestor closure (Spark 4 WITH RECURSIVE; " +
        "O(log n) self-join rounds)."),

    // ------------------------------------------------------------------
    "q39_gapfill" -> QueryDef(
      fn = { (s, dir) =>
        // Time-series repair: densify daily order stats per priority
        // onto a complete calendar (generated from the data's own
        // min/max — a 1-row agg exploded, no driver action), then
        // forward-fill the price through missing days with
        // last(IGNORE NULLS) over an ordered window. The calendar
        // cross join is tiny-by-tiny; the fact side contributes one
        // hash agg — nothing here scales with anything but
        // days x priorities.
        val o = T(s, dir).orders
        val daily = o.groupBy(col("o_orderpriority").as("prio"),
            date_trunc("day", col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(12,2)"))
              .cast("double").as("day_price"))
        val cal = o
          .agg(date_trunc("day", min(col("o_orderdate"))).as("d0"),
            date_trunc("day", max(col("o_orderdate"))).as("d1"))
          .select(explode(
            sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
          .crossJoin(o.select(col("o_orderpriority").as("prio")).distinct())
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prio")).orderBy(col("day"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        cal.join(daily, Seq("prio", "day"), "left")
          .select(col("prio"), unix_micros(col("day")).as("day_us"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            last(col("day_price"), ignoreNulls = true).over(w)
              .as("ffill_price"))
      },
      oracle = Some("""
        WITH b AS (SELECT date_trunc('day', min(o_orderdate)) AS d0,
                          date_trunc('day', max(o_orderdate)) AS d1
                   FROM orders),
        cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                  AS day FROM b),
        p AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
        daily AS (SELECT o_orderpriority AS prio,
                         date_trunc('day', o_orderdate) AS day,
                         count(*) AS n_orders,
                         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                           AS DOUBLE) AS day_price
                  FROM orders GROUP BY 1, 2)
        SELECT p.prio, epoch_us(c.day) AS day_us,
               coalesce(d.n_orders, 0) AS n_orders,
               last_value(d.day_price IGNORE NULLS) OVER (
                 PARTITION BY p.prio ORDER BY c.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS ffill_price
        FROM cal c CROSS JOIN p
        LEFT JOIN daily d ON d.prio = p.prio AND d.day = c.day"""),
      doc = "Calendar gap-fill + forward-fill (densify daily series, " +
        "last IGNORE NULLS window carry)."),

    // ------------------------------------------------------------------
    "q40_column_profile" -> QueryDef(
      fn = { (s, dir) =>
        // ANALYZE-style column profile in one query: per-column null
        // counts, exact distinct cardinalities, min/max/avg — the
        // stats pass that drives layout and join-strategy choices.
        // Multiple COUNT(DISTINCT) in one aggregate plan via
        // Catalyst's Expand rewrite (rows x #distinct-columns — fine
        // for a profiling pass; the HLL variant q23 is the
        // sketch-budget alternative at 100 TB).
        T(s, dir).lineitem.agg(
          count(lit(1)).as("n_rows"),
          count(col("l_partkey")).as("n_partkey"),
          countDistinct(col("l_partkey")).as("d_partkey"),
          countDistinct(col("l_returnflag")).as("d_returnflag"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          // l_shipdate reads as TIMESTAMP_NTZ; the session tz is UTC,
          // so the cast to TIMESTAMP is identity on the epoch value
          unix_micros(min(col("l_shipdate")).cast("timestamp"))
            .as("min_ship_us"),
          unix_micros(max(col("l_shipdate")).cast("timestamp"))
            .as("max_ship_us"))
      },
      oracle = Some("""
        SELECT count(*) AS n_rows,
               count(l_partkey) AS n_partkey,
               count(DISTINCT l_partkey) AS d_partkey,
               count(DISTINCT l_returnflag) AS d_returnflag,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty,
               round(avg(l_quantity), 4) AS avg_qty,
               epoch_us(min(l_shipdate)) AS min_ship_us,
               epoch_us(max(l_shipdate)) AS max_ship_us
        FROM lineitem"""),
      doc = "One-pass column profile: nulls, exact distincts (Expand " +
        "rewrite), min/max/avg, integer-micros date bounds."),

    // ------------------------------------------------------------------
    "q41_anomaly" -> QueryDef(
      fn = { (s, dir) =>
        // Trailing-window z-score anomaly detection per user: a 20-row
        // ROWS frame, |z| > 2.5. One shuffle (the window partition),
        // then a single ordered pass per key — the standard streaming-
        // friendly anomaly shape. Engine-exactness: stddev_samp's
        // internal accumulation differs between engines, so the
        // variance is derived from DECIMAL window sums (exact, order-
        // free): var = (s2 - n*m*m)/(n-1) in an identical double
        // expression tree; sqrt is IEEE correctly-rounded in both.
        // The frame orders by integer micros (not raw ts): events.ts
        // is TIMESTAMP(NANOS) floored to micros on the Spark side, so
        // ordering by the raw ts could disagree within a microsecond.
        import org.apache.spark.sql.expressions.Window
        val vd = dec(col("value"))
        val win = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")), col("event_id"))
          .rowsBetween(-19, 0)
        val w = T(s, dir).events.select(
          col("user_id"), col("event_id"), col("ts"), vd.as("v"),
          sum(vd).over(win).as("s1"),
          sum(vd * vd).over(win).as("s2"),
          count(lit(1)).over(win).as("n"))
        val mean = col("s1").cast("double") / col("n")
        val vvar = (col("s2").cast("double") -
          ((col("n") * mean) * mean)) / (col("n") - 1)
        val z = (col("v").cast("double") - mean) / sqrt(vvar)
        w.filter(col("n") === 20)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            round(z, 6).as("z"), vvar.as("vr"), z.as("zraw"))
          .filter(col("vr") > 0 && abs(col("zraw")) > 2.5)
          .drop("vr", "zraw")
      },
      oracle = Some("""
        WITH w AS (
          SELECT user_id, event_id, ts,
                 CAST(value AS DECIMAL(12,2)) AS v,
                 sum(CAST(value AS DECIMAL(12,2))) OVER win AS s1,
                 sum(CAST(value AS DECIMAL(12,2)) *
                     CAST(value AS DECIMAL(12,2))) OVER win AS s2,
                 count(*) OVER win AS n
          FROM events
          WINDOW win AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        z AS (
          SELECT user_id, event_id, ts, v, n,
                 CAST(s1 AS DOUBLE) / n AS m,
                 (CAST(s2 AS DOUBLE) -
                  ((n * (CAST(s1 AS DOUBLE) / n)) *
                   (CAST(s1 AS DOUBLE) / n))) / (n - 1) AS vr
          FROM w WHERE n = 20)
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               round((CAST(v AS DOUBLE) - m) / sqrt(vr), 6) AS z
        FROM z
        WHERE vr > 0 AND abs((CAST(v AS DOUBLE) - m) / sqrt(vr)) > 2.5"""),
      doc = "Trailing 20-row z-score anomalies per user (decimal-exact " +
        "moments, engine-identical double tree)."),

    // ------------------------------------------------------------------
    "q42_funnel" -> QueryDef(
      fn = { (s, dir) =>
        // Ordered funnel attribution (view -> click -> purchase, each
        // stage strictly after the previous): ONE shuffle (the per-user
        // groupBy), then a codegen'd fold over the time-sorted event
        // list — vs the declarative 3-join form the oracle uses (and
        // which would shuffle events three times). The per-user list
        // is bounded by the user's event count; production funnels
        // window it first (q15's window() composes in front). Strict
        // '>' comparisons at equal micros match the oracle's MIN
        // semantics; sort key (us, event_id) is fully deterministic.
        val evs = T(s, dir).events.select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type"))
        val lists = evs.groupBy(col("user_id"))
          .agg(array_sort(collect_list(struct(
            col("us"), col("event_id"), col("event_type")))).as("evs"))
        val nullL = lit(null).cast("long")
        val state = aggregate(col("evs"),
          struct(nullL.as("v"), nullL.as("c"), nullL.as("p")),
          (acc, ev) => {
            val us = ev.getField("us")
            val t = ev.getField("event_type")
            val v = acc.getField("v")
            val c = acc.getField("c")
            val p = acc.getField("p")
            struct(
              when(v.isNull && t === "view", us).otherwise(v).as("v"),
              when(c.isNull && v.isNotNull && t === "click" && us > v, us)
                .otherwise(c).as("c"),
              when(p.isNull && c.isNotNull && t === "purchase" && us > c, us)
                .otherwise(p).as("p"))
          })
        lists.select(col("user_id"), state.as("f"))
          .select(col("user_id"), col("f.v").as("view_us"),
            col("f.c").as("click_us"), col("f.p").as("purchase_us"))
          .filter(col("view_us").isNotNull)
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        v AS (SELECT user_id, min(us) AS view_us
              FROM e WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(us) AS click_us
              FROM e JOIN v USING (user_id)
              WHERE event_type = 'click' AND us > view_us GROUP BY 1),
        p AS (SELECT e.user_id, min(us) AS purchase_us
              FROM e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND us > click_us GROUP BY 1)
        SELECT v.user_id, view_us, click_us, purchase_us
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""),
      doc = "Ordered view->click->purchase funnel per user: one " +
        "shuffle + sorted-list fold (vs the oracle's 3-join form)."),

    // ------------------------------------------------------------------
    "q43_cohort_retention" -> QueryDef(
      fn = { (s, dir) =>
        // Cohort retention: users grouped by first-activity week, then
        // distinct-active counts per (cohort, week offset) — the
        // product-analytics staple. Scale shape: one groupBy(user) for
        // cohorts, then the activity groupBy joins it back ON THE SAME
        // KEY (co-partitioned, no extra exchange under AQE), then a
        // small (cohort, week) agg. Weeks as integer micros
        // throughout; the offset is exact integer division by the
        // week's micros.
        val wk = date_trunc("week", col("ts"))
        val e = T(s, dir).events.select(col("user_id"),
          unix_micros(wk).as("week_us"))
        val cohorts = e.groupBy(col("user_id"))
          .agg(min(col("week_us")).as("cohort_us"))
        e.join(cohorts, Seq("user_id"))
          .groupBy(col("cohort_us"),
            ((col("week_us") - col("cohort_us")) / lit(604800000000L))
              .cast("long").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_us(date_trunc('week', ts)) AS week_us
          FROM events),
        c AS (SELECT user_id, min(week_us) AS cohort_us
              FROM e GROUP BY 1)
        SELECT cohort_us,
               (week_us - cohort_us) // 604800000000 AS week_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM e JOIN c USING (user_id)
        GROUP BY 1, 2"""),
      doc = "Weekly cohort retention (first-activity cohorts, exact " +
        "integer week offsets, co-partitioned joins)."),

    // ------------------------------------------------------------------
    "q44_range_window" -> QueryDef(
      fn = { (s, dir) =>
        // Time-RANGE window frames (the piece q05's ROWS frames left
        // out): trailing 7-day spend + order count per customer. The
        // frame is ordered by INTEGER micros (the float/oracle
        // discipline for timestamps) and money sums run in DECIMAL.
        // RANGE includes ALL peers of the current timestamp, so the
        // result is deterministic without an order tiebreak. One
        // shuffle (partitionBy customer); the frame scan is linear
        // per partition — the 100 TB shape for trailing-window
        // features.
        val o = T(s, dir).orders
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("us"))
          .rangeBetween(-604800000000L, 0L)
        // o_orderdate is TIMESTAMP_NTZ; the session runs UTC, so the
        // cast to TIMESTAMP yields the same micros DuckDB's epoch_us
        // reads off the naive parquet value
        o.select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
          col("o_totalprice"))
          .select(col("o_orderkey"), col("o_custkey"), col("us"),
            sum(dec(col("o_totalprice"))).over(w)
              .cast("double").as("trail7d_spend"),
            count(lit(1)).over(w).as("n_trail7d"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey,
               epoch_us(o_orderdate) AS us,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w
                 AS DOUBLE) AS trail7d_spend,
               count(*) OVER w AS n_trail7d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
                     RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)"""),
      doc = "Time-RANGE window frames over integer micros (trailing " +
        "7-day spend; DECIMAL-summed, tie-safe)."),

    // ------------------------------------------------------------------
    "q45_window_complete" -> QueryDef(
      fn = { (s, dir) =>
        // The rest of the SQL window-function surface: percent_rank /
        // cume_dist (exact rationals — both engines divide the same
        // integers in double, so the hash compare holds bitwise) and
        // first/last/nth_value over an explicit full frame with a
        // UNIQUE order (totalprice, orderkey) so value-functions are
        // deterministic. Same single-shuffle shape as q05.
        val o = T(s, dir).orders
        val byPrice = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val full = byPrice.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .select(col("o_orderkey"), col("o_custkey"),
            percent_rank().over(byPrice).as("pr"),
            cume_dist().over(byPrice).as("cd"),
            first_value(col("o_orderkey")).over(full).as("cheapest_key"),
            last_value(col("o_orderkey")).over(full).as("dearest_key"),
            nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               first_value(o_orderkey) OVER wf AS cheapest_key,
               last_value(o_orderkey) OVER wf AS dearest_key,
               nth_value(o_orderkey, 2) OVER wf AS second_key
        FROM orders
        WINDOW w  AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey),
               wf AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)"""),
      doc = "percent_rank / cume_dist / first / last / nth_value " +
        "with explicit frames and a unique order."),

    // ------------------------------------------------------------------
    "q46_approx_quantiles" -> QueryDef(
      fn = { (s, dir) =>
        // The quantile SKETCH to q28's exact percentiles — at 100 TB
        // exact quantiles need a full sort or two passes;
        // percentile_approx (Greenwald-Khanna) is one partial-agg
        // pass with a mergeable summary, rank error <= n/accuracy.
        // Sketch output is merge-order-dependent -> rows-only; the
        // rank-error bound vs the exact sorted values is pinned in
        // SketchSpec. Output is three SCALAR columns, not the raw
        // array<double>: the driver's row canonicalization cannot
        // sort/factorize array cells (q31's "engine-agnostic to
        // hash" rule — r05 showed an array output crashes the
        // checker and the query records nothing).
        val q = percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000))
        T(s, dir).lineitem
          .agg(q.as("qs"), count(lit(1)).as("n"))
          .select(
            element_at(col("qs"), 1).as("p50"),
            element_at(col("qs"), 2).as("p90"),
            element_at(col("qs"), 3).as("p99"),
            col("n"))
      },
      oracle = None,
      doc = "Greenwald-Khanna approximate quantiles (mergeable one-" +
        "pass sketch; rank-error spec vs exact percentiles)."),

    // ------------------------------------------------------------------
    "q47_null_semantics" -> QueryDef(
      fn = { (s, dir) =>
        // NOT IN tri-valued logic, exercised in PREDICATE position
        // where Catalyst's null-aware anti join implements the
        // standard exactly: a NULL planted in the subquery (nullif
        // against min(o_custkey), deterministic at every SF) makes
        // x NOT IN (S ∪ {NULL}) non-TRUE for every x, so the
        // with-null anti leg must count 0 — the classic trap for
        // engines that blindly rewrite NOT IN to plain anti join.
        // Projection position is deliberately avoided: Spark 4.1
        // rewrites a SELECT-list InSubquery through an existence
        // join that yields FALSE where the standard (and DuckDB)
        // yield NULL — found while building this query; the
        // predicate form is the one both engines agree the standard
        // on, and the one 100 TB filters actually use.
        T(s, dir).orders.createOrReplaceTempView("graft_orders")
        T(s, dir).customer.createOrReplaceTempView("graft_customer")
        s.sql("""
          SELECT 'in_plain' AS probe, count(*) AS n FROM graft_customer
          WHERE c_custkey IN (SELECT o_custkey FROM graft_orders
                              WHERE o_totalprice > 150000)
          UNION ALL
          SELECT 'not_in_plain', count(*) FROM graft_customer
          WHERE c_custkey NOT IN (SELECT o_custkey FROM graft_orders
                                  WHERE o_totalprice > 150000)
          UNION ALL
          SELECT 'in_with_null', count(*) FROM graft_customer
          WHERE c_custkey IN (
            SELECT nullif(o_custkey,
                     (SELECT min(o_custkey) FROM graft_orders))
            FROM graft_orders)
          UNION ALL
          SELECT 'not_in_with_null', count(*) FROM graft_customer
          WHERE c_custkey NOT IN (
            SELECT nullif(o_custkey,
                     (SELECT min(o_custkey) FROM graft_orders))
            FROM graft_orders)""")
      },
      oracle = Some("""
        SELECT 'in_plain' AS probe, count(*) AS n FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 150000)
        UNION ALL
        SELECT 'not_in_plain', count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 150000)
        UNION ALL
        SELECT 'in_with_null', count(*) FROM customer
        WHERE c_custkey IN (
          SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM orders))
          FROM orders)
        UNION ALL
        SELECT 'not_in_with_null', count(*) FROM customer
        WHERE c_custkey NOT IN (
          SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM orders))
          FROM orders)"""),
      doc = "IN / NOT IN tri-valued null semantics in predicate " +
        "position (null-aware anti join; with-null anti leg counts 0)."),

    // ------------------------------------------------------------------
    "q48_percentile_disc" -> QueryDef(
      fn = { (s, dir) =>
        // Discrete (inverse-distribution) percentiles: the smallest
        // actual value whose cume_dist reaches p — an ORDER STATISTIC,
        // not an interpolation, so the result is a real DECIMAL(12,2)
        // from the data and the compare is exact with NO rounding
        // (q28's continuous form needs round(4) to absorb the
        // interpolation arithmetic). Both engines implement the same
        // lower-bound rule (probed: {1,2,3,4} p=.5 -> 2, p=.25 -> 1).
        T(s, dir).orders
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
              .as("p50"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
              .as("p90"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.5) AS p50,
               quantile_disc(o_totalprice, 0.9) AS p90,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderpriority"""),
      doc = "Discrete percentiles per group (exact order statistics, " +
        "no interpolation, no rounding)."),

    // ------------------------------------------------------------------
    "q49_hll_sketch" -> QueryDef(
      fn = { (s, dir) =>
        // A HASH-CHECKED HyperLogLog — the cross-engine-exact twin of
        // q23's rows-only approx_count_distinct. Every ingredient is
        // deterministic and bitwise-portable: the item hash is the
        // md5-prefix 60-bit uniform (c26/c27's trick), the register is
        // a BIT LENGTH (length(bin(w)) — both engines print binary
        // without leading zeros), and the register SUM is kept exact
        // in int64 as sum(2^(53-rho)) <= 2^61, so the one double
        // division at the end is the same IEEE operation on the same
        // integers in both engines. The raw LogLog estimator is
        // emitted WITHOUT the small-range linear-counting correction
        // (it needs ln — libm, excluded by the oracle-exactness
        // rules); RelationalSpec pins the error bound instead. Scale
        // shape: two partial-agg shuffles carrying (group, bucket,
        // rho) then (group, 256-row register sets) — constant-size
        // state per group at any SF, the whole point of HLL.
        val m = 256
        val h = graft.functions.PortableHash
          .uniform60(col("l_orderkey").cast("string"))
        val w = expr(s"h div $m")
        val rho = when(w === 0L, lit(53))
          .otherwise(lit(53) - length(bin(w))).cast("int")
        val regs = T(s, dir).lineitem
          .select(col("l_returnflag"), col("l_orderkey"))
          .withColumn("h", h)
          .withColumn("bucket", pmod(col("h"), lit(m)))
          .withColumn("rho", rho)
          .groupBy(col("l_returnflag"), col("bucket"))
          .agg(max(col("rho")).as("reg"))
        val twoP53 = 9007199254740992L // 2^53 == rho 0 (absent bucket)
        regs.groupBy(col("l_returnflag"))
          .agg(
            (sum(expr("shiftleft(1L, 53 - reg)")) +
              (lit(m.toLong) - count(lit(1))) * lit(twoP53))
              .as("reg_sum"),
            (lit(m.toLong) - count(lit(1))).as("n_zero_buckets"))
          .withColumn("est_raw",
            lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) /
              (col("reg_sum").cast("double") / lit(9007199254740992.0)))
          .select(col("l_returnflag"), col("reg_sum"),
            col("n_zero_buckets"), col("est_raw"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT l_returnflag,
                 ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                   ::UBIGINT::BIGINT AS hv
          FROM lineitem),
        r AS (
          SELECT l_returnflag, hv % 256 AS bucket,
                 max(CASE WHEN hv // 256 = 0 THEN 53
                     ELSE 53 - length(bin(hv // 256)) END) AS reg
          FROM h GROUP BY 1, 2)
        SELECT l_returnflag,
               CAST(sum(1::BIGINT << (53 - reg)) +
                    (256 - count(*)) * 9007199254740992 AS BIGINT)
                 AS reg_sum,
               CAST(256 - count(*) AS BIGINT) AS n_zero_buckets,
               (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 /
                 (CAST(CAST(sum(1::BIGINT << (53 - reg)) +
                       (256 - count(*)) * 9007199254740992 AS BIGINT)
                       AS DOUBLE) / 9007199254740992.0) AS est_raw
        FROM r GROUP BY l_returnflag"""),
      doc = "Hash-checked HyperLogLog (m=256): md5-uniform hash, " +
        "bin()-derived registers, exact int64 register sums — the " +
        "sketch itself is cross-engine bitwise-reproducible."),

    // ------------------------------------------------------------------
    "q50_kmv_sketch" -> QueryDef(
      fn = { (s, dir) =>
        // KMV (k-minimum-values / bottom-k) distinct sketch WITH a
        // real sketch MERGE, all hash-checked — the third member of
        // the sketch family (q49 HLL = register max, t09 CMS = count
        // min, q50 KMV = order statistics). Every ingredient is
        // cross-engine exact: the md5-prefix 60-bit uniform hash
        // (q49's trick), the k-th minimum as an int64, bit_xor as an
        // order-free membership checksum, and one double division on
        // identical integers for the estimate (k-1) * 2^60 / kth_min.
        // The 'ALL' row is computed FROM the per-group sketches, not
        // from the data — KMV's union property (bottom-k of a union
        // equals bottom-k of the union of bottom-k sets) is what
        // makes it mergeable in a tree-agg at 100 TB, and the oracle
        // recomputing the same rows from scratch proves the merge
        // lossless. Scale shape: one distinct shuffle carrying
        // (group, hash), then a rank-over-window cut that
        // WindowGroupLimit prunes to k rows per partition BEFORE the
        // window's sort (same plan q06/c07 assert); the merge input
        // is <= groups * k rows — driver-free, constant-size state.
        val k = 64
        val h = graft.functions.PortableHash
          .uniform60(col("l_partkey").cast("string"))
        val hashes = T(s, dir).lineitem
          .select(col("l_returnflag").as("grp"), h.as("hv"))
          .distinct()
        val perGroup = hashes
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("grp")).orderBy(col("hv"))))
          .filter(col("rn") <= k)
          .select(col("grp"), col("hv"))
        // sketch merge: <= groups * k rows, no second pass over data
        val merged = perGroup.select(col("hv")).distinct()
          .withColumn("rn", row_number().over(Window.orderBy(col("hv"))))
          .filter(col("rn") <= k)
          .select(lit("ALL").as("grp"), col("hv"))
        val twoP60 = 1.152921504606846976e18 // 2^60, exact in double
        perGroup.unionByName(merged)
          .groupBy(col("grp"))
          .agg(count(lit(1)).cast("int").as("k_used"),
            max(col("hv")).as("kth_min"),
            expr("bit_xor(hv)").as("xor_check"))
          .withColumn("est_raw",
            (col("k_used") - 1).cast("double") * lit(twoP60) /
              col("kth_min").cast("double"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT DISTINCT l_returnflag AS grp,
                 ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                   ::UBIGINT::BIGINT AS hv
          FROM lineitem),
        bk AS (
          SELECT grp, hv FROM (
            SELECT grp, hv,
                   row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
            FROM h) WHERE rn <= 64),
        mg AS (
          SELECT 'ALL' AS grp, hv FROM (
            SELECT hv, row_number() OVER (ORDER BY hv) AS rn
            FROM (SELECT DISTINCT hv FROM bk)) WHERE rn <= 64),
        u AS (SELECT grp, hv FROM bk UNION ALL SELECT grp, hv FROM mg)
        SELECT grp, CAST(count(*) AS INT) AS k_used,
               max(hv) AS kth_min, bit_xor(hv) AS xor_check,
               CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0 /
                 CAST(max(hv) AS DOUBLE) AS est_raw
        FROM u GROUP BY grp"""),
      doc = "Hash-checked KMV bottom-k distinct sketch (md5-uniform " +
        "60-bit hash) with a lossless sketch merge for the union row."),

    // ------------------------------------------------------------------
    "q51_variant" -> QueryDef(
      fn = { (s, dir) =>
        // Spark 4 VARIANT: schema-on-read semi-structured access.
        // q14 parses with a DECLARED schema (from_json + StructType);
        // the VARIANT path needs none — parse_json builds the binary
        // variant encoding and variant_get extracts typed values by
        // path at read time, the shape engines (and open table
        // formats) now standardize for JSON-ish columns. A missing
        // path is SQL NULL, not an error — pinned by the
        // n_missing_present count (and the oracle's 0).
        T(s, dir).events
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'long')")
              .as("k"),
            expr("variant_get(parse_json(props), '$.absent', 'string')")
              .as("m"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            count(col("m")).as("n_missing_present"))
      },
      oracle = Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                 AS BIGINT) AS sum_k,
               CAST(0 AS BIGINT) AS n_missing_present
        FROM events GROUP BY event_type"""),
      doc = "Spark 4 VARIANT semi-structured access: parse_json + " +
        "variant_get by path, no declared schema; missing paths are " +
        "NULL (DuckDB replays via json_extract)."),

    // ------------------------------------------------------------------
    "q52_skew_join" -> QueryDef(
      fn = { (s, dir) =>
        // DELIBERATELY skewed shuffle join, salted (q24 proved the
        // salted AGG; this is the remaining skew hazard class — a
        // JOIN whose hot key would otherwise pile a third of the fact
        // table into one reduce partition). A third of lineitem folds
        // onto the synthetic hot key -1; the dim side (unique per
        // key: the surviving orders + one hot row) replicates per
        // salt and the join runs on (k, __salt), spreading the hot
        // key over 16 reducers. The dim side carries a SHUFFLE_HASH
        // hint: at 100 TB the dim is past broadcast size by
        // assumption, and the hint makes the registered plan the
        // honest shuffle-join shape rather than whatever the fixture
        // size estimate picks. Plan-asserted (PlanShapeSpec): the
        // join keys include __salt and the join is a shuffle join,
        // not a broadcast. Salting is content-derived and dropped
        // before output, so the oracle is the PLAIN join — identical
        // results by construction, hash-checked through decimal sums.
        val t = T(s, dir)
        val fact = t.lineitem.select(
          when(col("l_orderkey") % 3 === 0, lit(-1L))
            .otherwise(col("l_orderkey")).as("k"),
          col("l_returnflag"), dec(col("l_quantity")).as("qty"))
        val dim = t.orders.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey").as("k"),
            dec(col("o_totalprice")).as("attr"))
          .unionByName(s.range(1).select(lit(-1L).as("k"),
            dec(lit(0.0)).as("attr")))
          .hint("shuffle_hash")
        graft.operators.Layout.saltedJoin(fact, dim, "k", salts = 16)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("qty")).cast("double").as("sum_qty"),
            sum(col("attr")).cast("double").as("sum_attr"))
      },
      oracle = Some("""
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 3 = 0 THEN -1
                      ELSE l_orderkey END AS k,
                 l_returnflag,
                 CAST(l_quantity AS DECIMAL(12,2)) AS qty
          FROM lineitem),
        dim AS (
          SELECT o_orderkey AS k,
                 CAST(o_totalprice AS DECIMAL(12,2)) AS attr
          FROM orders WHERE o_orderkey % 3 <> 0
          UNION ALL
          SELECT -1, CAST(0.0 AS DECIMAL(12,2)))
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(qty) AS DOUBLE) AS sum_qty,
               CAST(sum(attr) AS DOUBLE) AS sum_attr
        FROM fact JOIN dim USING (k)
        GROUP BY l_returnflag"""),
      doc = "Deliberately skewed shuffle join through the salted-join " +
        "path: hot key spread over 16 (k, salt) reducers, dim " +
        "replicated per salt, results == the plain join " +
        "(hash-checked; plan-asserted shuffle join on the salt)."),

    // ------------------------------------------------------------------
    "q53_stream_stream_join" -> QueryDef(
      fn = { (s, dir) =>
        // The ACTUAL stream-stream watermarked interval join under
        // the gate (q33 is the batch twin; StreamingSpec covers the
        // API — this runs EventStreams.intervalJoin as a real
        // StreamingQuery and hash-checks its emitted rows). Both
        // sides read the same normalized event files as file
        // streams; AvailableNow with maxFilesPerTrigger UNSET plans
        // everything available into exactly one micro-batch, so the
        // watermark (which starts unset in batch 1) drops nothing
        // and the inner join's append-mode output equals the batch
        // join — the determinism the oracle needs. State boundedness
        // under MULTI-batch progress is StreamingSpec's job; result
        // parity under the gate is this entry's. Source prep writes
        // ONLY the two participating event types, in parallel (the
        // first cut coalesced the whole events table into one file —
        // 2/3 of the entry's wall was that single-task write, not
        // the streaming join it gates).
        val path = q53Dir(dir)
        val ev = T(s, dir).events
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"))
        ev.write.mode("overwrite").parquet(s"$path/src")
        // the stateful join instantiates (and checkpoints) one state
        // store per shuffle partition PER SIDE; at the session's 32
        // partitions that store scaffolding — not the join — was the
        // entry's wall clock. 4 partitions ~ the data's size; the
        // partition count is pinned in the checkpoint. The setting
        // lives on a CLONED session (shared context, own SQLConf) so
        // nothing planned concurrently on the shared session ever
        // sees 4-partition planning (r13 advice) — the memory-sink
        // view registers in the clone's temp catalog and the
        // returned frame carries it.
        val s2 = s.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", "4")
        def src() = s2.readStream.schema(ev.schema)
          .parquet(s"$path/src")
        val facts = src().filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("user_id"))
        val signals = src().filter(col("event_type") === "click")
          .select(col("ts").as("rts"), col("user_id").as("s_user_id"))
        val joined = graft.streaming.EventStreams
          .intervalJoin(facts, signals, lookback = "15 minutes")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("rts")).as("rts_us"))
        val name = s"q53_sink_${q53Seq.incrementAndGet()}"
        val q = joined.writeStream.format("memory").queryName(name)
          .option("checkpointLocation", s"$path/ckpt")
          .trigger(
            org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s2.table(name)
      },
      oracle = Some("""
        SELECT f.event_id, f.user_id,
               epoch_us(f.ts) AS ts_us, epoch_us(s.rts) AS rts_us
        FROM (SELECT event_id, ts, user_id FROM events
              WHERE event_type = 'purchase') f
        JOIN (SELECT ts AS rts, user_id FROM events
              WHERE event_type = 'click') s
          ON f.user_id = s.user_id
         AND s.rts BETWEEN f.ts - INTERVAL 15 MINUTE AND f.ts"""),
      doc = "Stream-stream watermarked interval join run as a REAL " +
        "StreamingQuery (file sources, AvailableNow, memory sink) — " +
        "emitted rows hash-match the batch join."))

  private val q53Seq = new java.util.concurrent.atomic.AtomicLong(0)
  private val q53Dirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }
  private def q53Dir(dir: String): String = {
    val path = q53Dirs.getOrElseUpdate(dir, {
      val f = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-q53-${Integer.toHexString(dir.hashCode)}-" +
          ProcessHandle.current().pid())
      Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(f)))
      f.toString
    })
    val f = new java.io.File(path)
    rmTree(f); f.mkdirs()
    path
  }
}
