package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The SQL operator surface from SURVEY.md §2B, re-expressed as
  * DataFrame/SQL queries over the synthetic star schema, each with an
  * ANSI-SQL DuckDB oracle (SparkEntry.oracleSql).
  *
  * Determinism rules (the driver hash-compares values against DuckDB):
  *  - double aggregation goes through exact DECIMAL casts, final result
  *    cast back to DOUBLE (identical value in both engines, regardless of
  *    summation order);
  *  - ratio/avg columns are computed as DOUBLE/DOUBLE of already-exact
  *    inputs (single IEEE op → bit-identical);
  *  - every top-k has a total tiebreak order.
  *
  * Reference surface citations (see SURVEY §2B): window predicates
  * `samples/tasks/partition_by_column/query.sql:1-4`, weekly aggregation
  * `samples/tasks/weekly_partitioned/query.sql:1-14`, IN UNNEST
  * `query.py:29`, MERGE partition replacement `query.py:6-62`.
  */
object RelationalQueries {
  import Tables.t

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def asD(c: Column): Column = c.cast(DoubleType)

  /** One q61 BFS hop: expand the frontier over the edge list, drop
    * already-reached nodes, stamp the depth. Package-private so
    * PlanAuditSpec audits the PRODUCTION hop shape (broadcast frontier,
    * no cartesian) instead of a replica that could drift.
    */
  private[graft] def reachabilityHop(frontier: DataFrame, edges: DataFrame,
      reached: DataFrame, depth: Int): DataFrame =
    frontier.join(edges, col("node") === col("src"))
      .select(col("dst").as("node")).distinct()
      .join(reached, Seq("node"), "left_anti")
      .withColumn("depth", lit(depth))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // --- scans / projection / filter pushdown --------------------------
    "q01_scan_filter_project" -> { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // --- TPC-H Q1-style pricing summary (groupBy + agg + exact math) ---
    "q02_pricing_summary" -> { (s, d) =>
      val li = t(s, d, "lineitem").where(col("l_shipdate") < lit("2000-01-01").cast(TimestampType))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asD(sum(dec(col("l_quantity")))).as("sum_qty"),
          asD(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          asD(sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("sum_disc_price"),
          (asD(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- windowed aggregate: partition_by_column sample shape ----------
    "q03_window_count_by_date" -> { (s, d) =>
      t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-03-01").cast(TimestampType))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("d"))
    },

    // --- GROUP BY ordinal (SQL path) -----------------------------------
    "q04_groupby_ordinal" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderstatus, count(1) AS cnt
              |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // --- SELECT DISTINCT ------------------------------------------------
    "q05_distinct" -> { (s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- inner equi-join, small side broadcast -------------------------
    "q06_join_broadcast" -> { (s, d) =>
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("order_cnt"),
          asD(sum(dec(col("o_totalprice")))).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

    // --- multi-way join through the dimension chain --------------------
    "q07_join_multiway" -> { (s, d) =>
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      val o = t(s, d, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("order_cnt"),
          asD(sum(dec(col("o_totalprice")))).as("revenue"))
        .orderBy(col("r_name"))
    },

    // --- left join with null-producing side ----------------------------
    "q08_join_left" -> { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").where(col("o_orderdate") >= lit("2001-01-01").cast(TimestampType))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("row_cnt"), count(col("o_orderkey")).as("order_cnt"))
        .orderBy(col("c_mktsegment"))
    },

    // --- full outer join ------------------------------------------------
    "q09_join_full_outer" -> { (s, d) =>
      val c = t(s, d, "customer").where(col("c_acctbal") > 0)
      val o = t(s, d, "orders").where(col("o_orderstatus") === "O")
      o.join(c, o("o_custkey") === c("c_custkey"), "full_outer")
        .agg(count(lit(1)).as("row_cnt"),
          count(col("o_orderkey")).as("with_order"),
          count(col("c_custkey")).as("with_cust"))
    },

    // --- self join ------------------------------------------------------
    "q10_join_self" -> { (s, d) =>
      val o1 = t(s, d, "orders").alias("o1")
      val o2 = t(s, d, "orders").alias("o2")
      o1.join(o2, col("o1.o_custkey") === col("o2.o_custkey") &&
          col("o1.o_orderkey") < col("o2.o_orderkey"))
        .groupBy(col("o1.o_orderstatus").as("s1"), col("o2.o_orderstatus").as("s2"))
        .agg(count(lit(1)).as("pair_cnt"))
        .orderBy(col("s1"), col("s2"))
    },

    // --- semi/anti joins (used by the REPLACE_MERGE rewrite) -----------
    "q11_join_semi_anti" -> { (s, d) =>
      val c = t(s, d, "customer")
      val recent = t(s, d, "orders").where(col("o_orderdate") >= lit("2001-01-01").cast(TimestampType))
      val semi = c.join(recent, c("c_custkey") === recent("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("cnt")).withColumn("kind", lit("semi"))
      val anti = c.join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt")).withColumn("kind", lit("anti"))
      semi.unionByName(anti).select(col("kind"), col("cnt")).orderBy(col("kind"))
    },

    // --- CTE + join (SQL path) -----------------------------------------
    "q12_cte_join" -> { (s, d) =>
      Tables.views(s, d, "orders", "customer")
      s.sql("""WITH cust_orders AS (
              |  SELECT o_custkey, count(1) AS n_orders
              |  FROM orders GROUP BY o_custkey
              |)
              |SELECT c.c_mktsegment, count(1) AS n_cust,
              |       sum(co.n_orders) AS total_orders
              |FROM customer c JOIN cust_orders co ON c.c_custkey = co.o_custkey
              |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
    },

    // --- subquery in FROM ----------------------------------------------
    "q13_subquery_from" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql("""SELECT n_orders, count(1) AS n_cust
              |FROM (SELECT o_custkey, count(1) AS n_orders FROM orders GROUP BY o_custkey) t
              |GROUP BY n_orders ORDER BY n_orders""".stripMargin)
    },

    // --- ORDER BY ordinal + LIMIT with total tiebreak ------------------
    "q14_sort_limit" -> { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // --- array_agg(DISTINCT DATE(col)) — the REPLACE_MERGE auto probe --
    "q15_collect_set_dates" -> { (s, d) =>
      t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1995-02-01").cast(TimestampType))
        .groupBy(col("o_orderpriority"))
        // serialized to a scalar at the gate boundary: the oracle compare
        // requires hashable (non-array) output columns
        .agg(concat_ws(",", sort_array(collect_set(date_format(col("o_orderdate"), "yyyy-MM-dd")))).as("dates"),
          countDistinct(to_date(col("o_orderdate"))).as("n_dates"))
        .orderBy(col("o_orderpriority"))
    },

    // --- CAST surface: NUMERIC / TIMESTAMP / DATE / string ↔ number ----
    "q16_casts" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(col("o_orderkey")).cast(DecimalType(38, 9)).cast(DoubleType).as("order_count"),
          max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("max_date"),
          max(col("o_orderdate").cast(TimestampType)).as("max_ts"))
        .orderBy(col("o_orderstatus"))
    },

    // --- date/time function surface ------------------------------------
    "q17_date_functions" -> { (s, d) =>
      t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-06-01").cast(TimestampType))
        .select(
          date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start_date"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("day_of_month"),
          date_format(date_sub(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("minus_30d"),
          lower(col("o_orderpriority")).as("prio_lower"),
          (dayofmonth(col("o_orderdate")).cast(LongType) + 8000).as("day_plus"))
        .groupBy(col("week_start_date"))
        .agg(count(lit(1)).as("cnt"), min(col("minus_30d")).as("min_minus_30d"),
          max(col("day_plus")).as("max_day_plus"),
          countDistinct(col("prio_lower")).as("n_prio"))
        .orderBy(col("week_start_date"))
    },

    // --- DATE(ts, 'Asia/Jakarta'): timezone-arg date -------------------
    "q18_tz_date" -> { (s, d) =>
      t(s, d, "events")
        .groupBy(date_format(from_utc_timestamp(col("ts"), "Asia/Jakarta"), "yyyy-MM-dd").as("jkt_date"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("jkt_date"))
    },

    // --- IN UNNEST(array) ----------------------------------------------
    "q19_in_unnest" -> { (s, d) =>
      t(s, d, "orders")
        .where(array_contains(array(lit("1-URGENT"), lit("2-HIGH")), col("o_orderpriority")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderpriority"))
    },

    // --- interval arithmetic (spillover predicate shape) ---------------
    "q20_interval_arith" -> { (s, d) =>
      t(s, d, "events")
        .where(col("ts") >= lit("2024-01-25 00:00:00").cast(TimestampType) - expr("INTERVAL 10 DAYS") &&
          col("ts") < lit("2024-01-25 00:00:00").cast(TimestampType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    },

    // --- SELECT AS STRUCT ----------------------------------------------
    "q21_struct" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("o_orderpriority"),
          // struct built, then JSON-serialized at the gate boundary (struct
          // output columns are unhashable in the oracle compare)
          to_json(struct(col("o_orderpriority").as("priority"), col("cnt"))).as("payload_json"))
        .orderBy(col("o_orderpriority"))
    },

    // --- UNION ALL / UNION DISTINCT ------------------------------------
    "q22_union" -> { (s, d) =>
      val o = t(s, d, "orders")
      val a = o.where(col("o_orderstatus") === "F").select(col("o_orderpriority"))
      val b = o.where(col("o_orderstatus") === "O").select(col("o_orderpriority"))
      a.union(b).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
        .union(a.union(b).distinct().groupBy(col("o_orderpriority")).agg((count(lit(1)) * -1).as("cnt")))
        .orderBy(col("o_orderpriority"), col("cnt"))
    },

    // --- window function (first order per customer) --------------------
    "q23_window_function" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(year(col("o_orderdate")).cast(LongType).as("first_order_year"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("first_order_year"))
    },

    // --- JSON payload access (events.props) ----------------------------
    "q24_json_extract" -> { (s, d) =>
      t(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"), col("event_type"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    },

    // --- ingestion-time partition model (_PARTITIONTIME → _ingest_date)
    "q25_ingestion_time" -> { (s, d) =>
      t(s, d, "events")
        .withColumn("_ingest_date", date_format(col("ts"), "yyyy-MM-dd"))
        .where(col("_ingest_date") >= "2024-01-10" && col("_ingest_date") < "2024-01-20")
        .groupBy(col("_ingest_date"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          asD(sum(dec(col("value")))).as("sum_value"))
        .orderBy(col("_ingest_date"), col("event_type"))
    },

    // --- REPLACE_MERGE partition-replacement semantics, modeled --------
    // dest = daily counts Jan–Jun 1996; source = recomputed March (only
    // 'F' rows). Result = dest rows outside source's partition set ∪ source
    // — exactly the generated MERGE of query.py:6-62 (delete matched
    // partitions, insert source).
    "q26_merge_replace_model" -> { (s, d) =>
      val o = t(s, d, "orders")
      val dest = o.where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-07-01").cast(TimestampType))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("cnt"))
      val source = o.where(col("o_orderdate") >= lit("1996-03-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01").cast(TimestampType) &&
          col("o_orderstatus") === "F")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("cnt"))
      val parts = source.select(col("d")).distinct()
      dest.join(parts, Seq("d"), "left_anti").unionByName(source)
        .orderBy(col("d"))
    },

    // --- APPEND load model: projection + execution-time literal --------
    "q27_append_model" -> { (s, d) =>
      t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-01-08").cast(TimestampType))
        .select(col("o_orderkey"), col("o_totalprice"),
          lit("2024-05-01 10:00:00").cast(TimestampType).as("load_timestamp"))
        .orderBy(col("o_orderkey"))
    },

    // --- REPLACE_ALL model: whole window into single partition ---------
    "q28_replace_all_model" -> { (s, d) =>
      t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1998-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-02-01").cast(TimestampType))
        .agg(count(lit(1)).as("cnt"),
          asD(sum(dec(col("o_totalprice")))).as("revenue"))
        .withColumn("partition_date", lit("1998-01-01"))
        .select(col("partition_date"), col("cnt"), col("revenue"))
    },

    // --- weekly_partitioned sample shape (Monday weeks, NUMERIC cast) --
    "q29_weekly_partitioned" -> { (s, d) =>
      t(s, d, "orders")
        .where(lower(col("o_orderstatus")) === "f")
        .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start_date"))
        .agg(count(col("o_orderkey")).cast(DecimalType(38, 9)).cast(DoubleType).as("order_count"))
        .orderBy(col("week_start_date"))
    },

    // --- HAVING / filter over aggregate --------------------------------
    "q30_having" -> { (s, d) =>
      Tables.views(s, d, "lineitem")
      s.sql("""SELECT l_orderkey, count(1) AS n_lines
              |FROM lineitem GROUP BY l_orderkey
              |HAVING count(1) >= 5 ORDER BY l_orderkey""".stripMargin)
    },

    // --- ROLLUP / GROUPING SETS (beyond-corpus Spark freebies) ---------
    "q31_rollup" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              |  coalesce(o_orderpriority, 'ALL') AS priority,
              |  count(1) AS cnt
              |FROM orders
              |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
              |ORDER BY status, priority""".stripMargin)
    },

    // --- skew mitigation: salted join of a hot key ---------------------
    // one synthetic hot key (all 'F' orders mapped to custkey 1) joined
    // against customer via an 8-way salt explode — the manual pattern
    // for pre-AQE skew handling; result equals the unsalted join.
    "q32_salted_skew_join" -> { (s, d) =>
      val salts = 8
      val o = t(s, d, "orders")
        .withColumn("k", when(col("o_orderstatus") === "F", lit(1L)).otherwise(col("o_custkey")))
        .withColumn("salt", (pmod(col("o_orderkey"), lit(salts))).cast(IntegerType))
      val c = t(s, d, "customer")
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      o.join(c, o("k") === c("c_custkey") && o("salt") === c("salt"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_mktsegment"))
    },

    // --- TPC-H Q3 shape: shipping-priority ranked revenue join --------
    "q33_shipping_priority" -> { (s, d) =>
      val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").where(col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val l = t(s, d, "lineitem").where(col("l_shipdate") > lit("1997-01-01").cast(TimestampType))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(asD(sum(dec(col("l_extendedprice")) *
          (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },

    // --- TPC-H Q10 shape: returned-item reporting ----------------------
    "q34_returned_items" -> { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-07-01").cast(TimestampType))
      val l = t(s, d, "lineitem").where(col("l_returnflag") === "R")
      val n = t(s, d, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(asD(sum(dec(col("l_extendedprice")) *
          (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // --- as-of join: each click matched to the latest same-user view at
    //     or before it. Implemented as union + running last_value over a
    //     single (user_id)-shuffled sort — NO join at all, the 100 TB
    //     shape (one shuffle, sort-based window, no candidate blow-up) --
    "q35_asof_join" -> { (s, d) =>
      val ev = t(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"))
      // side orders views before clicks at equal ts, so ties match
      // (ASOF semantics: a.ts >= b.ts)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(views)
        .withColumn("view_id",
          last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("view_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .where(col("side") === 1 && col("view_id").isNotNull)
        .select(col("event_id").as("click_id"), col("view_id"),
          expr("unix_micros(ts) - unix_micros(view_ts)").as("gap_us"))
        .orderBy(col("click_id"))
    },

    // --- range join via time-binning: count same-user clicks in the
    //     5 minutes before each error. Binning turns the inequality join
    //     into an equi-join on (user_id, bin) with a 2-bin probe fan-out,
    //     so Spark plans a shuffled hash join instead of a broadcast
    //     nested loop — the scale path for bounded-interval range joins -
    "q36_range_join_binned" -> { (s, d) =>
      val ev = t(s, d, "events")
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
        .withColumn("bin", expr("unix_seconds(click_ts) div 300"))
      // bins b-1 and b cover every click in [err_ts - 5 min, err_ts]
      val probes = errors.withColumn("bin",
        explode(expr("sequence(unix_seconds(err_ts) div 300 - 1, unix_seconds(err_ts) div 300)")))
      probes.join(clicks, Seq("user_id", "bin"), "left")
        .withColumn("hit", col("click_ts").isNotNull &&
          col("click_ts") >= col("err_ts") - expr("INTERVAL 5 MINUTES") &&
          col("click_ts") < col("err_ts"))
        .groupBy(col("err_id"))
        .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_clicks"))
        .orderBy(col("err_id"))
    },

    // --- PIVOT: priorities × status matrix ------------------------------
    "q37_pivot" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("notspec"),
          coalesce(col("5-LOW"), lit(0L)).as("low"))
        .orderBy(col("o_orderstatus"))
    },

    // --- correlated EXISTS / NOT EXISTS subqueries ----------------------
    "q38_exists_correlated" -> { (s, d) =>
      Tables.views(s, d, "customer", "orders")
      s.sql(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderpriority = '1-URGENT')
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    },

    // --- lateral explode: token frequencies over documents --------------
    "q39_lateral_explode" -> { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(length(col("token")) > 3)
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100)
    },

    // --- set operations: INTERSECT / EXCEPT -----------------------------
    "q40_set_ops" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
          |INTERSECT
          |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          |EXCEPT
          |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          |ORDER BY custkey""".stripMargin)
    },

    // --- CUBE grouping sets with grouping_id ----------------------------
    "q41_cube" -> { (s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          expr("cast(grouping_id(o_orderstatus, o_orderpriority) as bigint)").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    },

    // --- analytic window suite: lag / lead / ntile / first_value / rank -
    "q42_window_suite" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
          |  lag(o_orderkey) OVER w AS prev_order,
          |  lead(o_orderkey) OVER w AS next_order,
          |  cast(ntile(4) OVER w AS bigint) AS quartile,
          |  first_value(o_orderkey) OVER w AS first_order,
          |  cast(rank() OVER (PARTITION BY o_custkey
          |    ORDER BY o_totalprice DESC, o_orderkey) AS bigint) AS price_rank
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, odate, o_orderkey""".stripMargin)
    },

    // --- QUALIFY-style latest-record-per-key compaction -----------------
    "q43_latest_per_key" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  date_format(o_orderdate, 'yyyy-MM-dd') AS odate, o_totalprice
          |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
          |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          |      FROM orders)
          |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)
    },

    // --- rolling 7-day revenue per customer (RANGE frame over dates) ----
    "q44_rolling_range_window" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
          |  cast(sum(cast(o_totalprice AS decimal(18,2))) OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS double) AS rev_7d,
          |  cast(count(1) OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS bigint) AS n_7d
          |FROM orders
          |ORDER BY o_custkey, odate, o_orderkey""".stripMargin)
    },

    // --- date-spine gap filling (sequence + left join + zero fill) ------
    "q45_date_spine_gapfill" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql(
        """WITH spine AS (
          |  SELECT explode(sequence(DATE '1996-01-01', DATE '1996-01-31')) AS day
          |), daily AS (
          |  SELECT CAST(o_orderdate AS DATE) AS day, count(1) AS n_orders,
          |    cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS revenue
          |  FROM orders
          |  WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-02-01'
          |  GROUP BY 1
          |)
          |SELECT date_format(spine.day, 'yyyy-MM-dd') AS day,
          |  coalesce(n_orders, 0L) AS n_orders,
          |  coalesce(revenue, cast(0.0 AS double)) AS revenue
          |FROM spine LEFT JOIN daily ON spine.day = daily.day
          |ORDER BY day""".stripMargin)
    },

    // --- TPC-H Q5 shape: six-table join with regional filter ------------
    "q46_regional_revenue" -> { (s, d) =>
      Tables.views(s, d, "customer", "orders", "lineitem", "supplier", "nation", "region")
      s.sql(
        """SELECT n_name,
          |  cast(sum(cast(l_extendedprice AS decimal(18,2))
          |    * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
    },

    // --- explicit GROUPING SETS (beyond ROLLUP/CUBE) -------------------
    "q47_grouping_sets" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |  coalesce(o_orderpriority, 'ALL') AS priority,
          |  count(1) AS cnt,
          |  cast(grouping(o_orderstatus) AS bigint) AS g_status,
          |  cast(grouping(o_orderpriority) AS bigint) AS g_priority
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |  (o_orderstatus, o_orderpriority))
          |ORDER BY status, priority""".stripMargin)
    },

    // --- ordered ARRAY_AGG, CSV-serialized at the gate boundary --------
    "q48_array_agg_ordered" -> { (s, d) =>
      // BigQuery ARRAY_AGG(x ORDER BY y LIMIT n): Spark's collect_list
      // is unordered, so the deterministic form is sort_array over
      // (key, value) structs then a bounded slice — per-group arrays
      // stay n-bounded, never data-sized
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT o_orderpriority,
          |  array_join(transform(
          |    slice(array_sort(collect_list(struct(o_totalprice, o_orderkey))), 1, 3),
          |    x -> cast(x.o_orderkey AS string)), ',') AS cheapest3
          |FROM orders
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // --- UNPIVOT: wide per-status counts back to rows ------------------
    "q49_unpivot" -> { (s, d) =>
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT o_orderpriority, status, n FROM (
          |  SELECT o_orderpriority,
          |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_open,
          |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_finished,
          |    count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_pending
          |  FROM orders GROUP BY o_orderpriority
          |)
          |UNPIVOT (n FOR status IN (st_open, st_finished, st_pending))
          |ORDER BY o_orderpriority, status""".stripMargin)
    },

    // --- recursive CTE (Spark 4.1 UnionLoop): month spine + counts -----
    "q51_percentiles" -> { (s, d) =>
      // exact interpolated percentiles per group. Quarter fractions
      // keep lower + (upper − lower)·frac exact on the integer-valued
      // quantity doubles, so the DOUBLE outputs are engine-identical
      // (the same reason .9 or .99 would NOT be hash-safe here).
      Tables.views(s, d, "lineitem")
      s.sql(
        """SELECT l_returnflag,
          |  count(1) AS n,
          |  percentile(l_quantity, 0.25) AS q25,
          |  percentile(l_quantity, 0.5) AS median_qty,
          |  percentile(l_quantity, 0.75) AS q75,
          |  max(l_quantity) AS max_qty
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // --- LOCF gap-fill: IGNORE NULLS running last_value ----------------
    "q52_locf_ignore_nulls" -> { (s, d) =>
      // last-observation-carried-forward, the time-series gap-fill
      // idiom: the running last non-NULL value per key. One window
      // shuffle on the key; IGNORE NULLS keeps the frame scan inside
      // the window operator (no self-join restatement needed).
      Tables.views(s, d, "orders")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  CAST(DATE(o_orderdate) AS STRING) AS d,
          |  last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) IGNORE NULLS
          |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_f_price
          |FROM orders
          |WHERE o_custkey < 500
          |ORDER BY o_custkey, o_orderkey""".stripMargin)
    },

    // --- correlated LATERAL subquery in FROM ---------------------------
    "q53_lateral_subquery" -> { (s, d) =>
      // per-row dependent subquery — Catalyst decorrelates it into a
      // left outer aggregate join, so the plan is a join + agg, not a
      // nested loop per customer.
      Tables.views(s, d, "orders", "customer")
      s.sql(
        """SELECT c.c_custkey, t.max_price, t.n
          |FROM customer c,
          |LATERAL (SELECT max(o.o_totalprice) AS max_price, count(1) AS n
          |         FROM orders o WHERE o.o_custkey = c.c_custkey) t
          |WHERE c.c_custkey < 300
          |ORDER BY c.c_custkey""".stripMargin)
    },

    "q50_recursive_cte" -> { (s, d) =>
      // the recursion generates the calendar spine (80 rows — driver-
      // sized by the date range, not the data), then a left join
      // fills counts; months with no orders surface as zero instead of
      // silently disappearing, which a plain GROUP BY cannot do
      Tables.views(s, d, "orders")
      s.sql(
        """WITH RECURSIVE months(m) AS (
          |  SELECT DATE'1995-01-01'
          |  UNION ALL
          |  SELECT add_months(m, 1) FROM months WHERE m < DATE'2001-08-01'
          |)
          |SELECT date_format(m.m, 'yyyy-MM') AS month,
          |  coalesce(o.n, 0L) AS n_orders
          |FROM months m LEFT JOIN (
          |  SELECT date_format(o_orderdate, 'yyyy-MM') AS mo, count(1) AS n
          |  FROM orders GROUP BY 1
          |) o ON o.mo = date_format(m.m, 'yyyy-MM')
          |ORDER BY month""".stripMargin)
    },

    "q54_incremental_rollup" -> { (s, d) =>
      // Incremental materialized-view maintenance: when a new batch of
      // orders lands, the monthly rollup is NOT recomputed from full
      // history — partial aggregates (count + exact decimal sum) from
      // the frozen base and from the delta merge algebraically. The
      // gate runs base-partials ∪ delta-partials → merge; the DuckDB
      // oracle is the full recompute, so green means incremental ≡
      // full. At 100 TB this is the difference between scanning one
      // day and rescanning the table; count/sum/min/max all merge this
      // way (avg as sum÷count at read time).
      val cut = lit("2001-01-01").cast(TimestampType)
      val o = t(s, d, "orders")
      def partial(df: DataFrame): DataFrame = df
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("psum"))
      partial(o.where(col("o_orderdate") < cut))
        .unionByName(partial(o.where(col("o_orderdate") >= cut)))
        .groupBy(col("month"), col("o_orderstatus"))
        .agg(sum(col("cnt")).as("n_orders"), asD(sum(col("psum"))).as("sum_price"))
        .orderBy(col("month"), col("o_orderstatus"))
    },

    "q55_scd2_snapshot_diff" -> { (s, d) =>
      // Slowly-changing-dimension maintenance: the change set between
      // two dimension snapshots (insert / delete / update), derived by
      // a full outer equi-join on the business key comparing md5 row
      // fingerprints — the CDC feed that drives SCD2 valid_from/
      // valid_to splicing. One key-partitioned shuffle join at 100 TB;
      // fingerprints hash DECIMAL-rendered numerics so both engines
      // format identically. Snapshot 2 is derived deterministically:
      // %5==0 rebalanced (update), %17==0 churned (delete), clones
      // +100000 acquired (insert).
      val snap1 = t(s, d, "customer")
      val rowHash = md5(concat_ws("|", col("c_name"),
        col("c_nationkey").cast(StringType),
        col("c_acctbal").cast(DecimalType(18, 2)).cast(StringType),
        col("c_mktsegment")))
      val snap2 = snap1
        .where(col("c_custkey") % 17 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") + 10.0)
            .otherwise(col("c_acctbal")))
        .unionByName(snap1.where(col("c_custkey") % 13 === 0)
          .withColumn("c_custkey", col("c_custkey") + 100000L))
      val a = snap1.select(col("c_custkey"), rowHash.as("old_hash"))
      val b = snap2.select(col("c_custkey"), rowHash.as("new_hash"))
      a.join(b, Seq("c_custkey"), "full_outer")
        .withColumn("change_type",
          when(col("old_hash").isNull, "insert")
            .when(col("new_hash").isNull, "delete")
            .when(col("old_hash") =!= col("new_hash"), "update"))
        .where(col("change_type").isNotNull)
        .select(col("c_custkey"), col("change_type"), col("old_hash"), col("new_hash"))
        .orderBy(col("c_custkey"))
    },

    // --- gaps-and-islands sessionization (batch) ------------------------
    "q56_sessionize_islands" -> { (s, d) =>
      // The batch face of s02's streaming session_window: a new session
      // starts when the gap to the previous event of the same user
      // exceeds 2 h; session_id is the running sum of start flags — the
      // classic gaps-and-islands shape. ONE shuffle on user_id serves
      // both windows and the final groupBy (same partitioning), so at
      // 100 TB this is a single key-partitioned pass; (ts, event_id)
      // tie-break keeps the island assignment total-ordered.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("ts_us", expr("unix_micros(ts)"))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 7200000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // --- ordered conversion funnel --------------------------------------
    "q57_event_funnel" -> { (s, d) =>
      // Strictly-ordered view → click → purchase funnel: each stage's
      // first timestamp must follow the previous stage's. Three
      // conditional-min aggregates joined on user_id — every shuffle is
      // on the same key so AQE coalesces them into one partitioning at
      // scale; no window over the full event stream, no self-join
      // explosion.
      val ev = t(s, d, "events").withColumn("ts_us", expr("unix_micros(ts)"))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("view_us"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("ts_us") > col("view_us"))
        .groupBy(col("user_id"), col("view_us")).agg(min(col("ts_us")).as("click_us"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts_us") > col("click_us"))
        .groupBy(col("user_id"), col("view_us"), col("click_us"))
        .agg(min(col("ts_us")).as("purchase_us"))
      v.join(c.select(col("user_id"), col("click_us")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), col("purchase_us")), Seq("user_id"), "left")
        .withColumn("stage",
          when(col("purchase_us").isNotNull, 3L)
            .when(col("click_us").isNotNull, 2L).otherwise(1L))
        .orderBy(col("user_id"))
    },

    // --- weekly cohort retention ----------------------------------------
    "q58_cohort_retention" -> { (s, d) =>
      // Cohort users by first-activity week, then count distinct users
      // active at each week offset — the standard retention triangle.
      // Two aggregations clustered on user_id (first-seen) then
      // (cohort, offset); the per-user first-seen is a groupBy, not a
      // window over the full event stream. Weeks are epoch-day div 7
      // (fixed Thursday-anchored buckets), pure integer math in both
      // engines.
      val ev = t(s, d, "events")
        .withColumn("week", expr("unix_date(to_date(ts)) div 7"))
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      ev.join(firstSeen, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    "q59_correlated_scalar" -> { (s, d) =>
      // Correlated scalar aggregate subquery in WHERE (the TPC-H
      // Q2/Q17 shape: rows matching their group's min). Catalyst
      // decorrelates this to ONE aggregate + equi-join over lineitem —
      // never a per-row subquery re-execution (PlanAuditSpec pins the
      // physical shape); the supplier/nation dims broadcast.
      Tables.views(s, d, "lineitem", "supplier", "nation")
      s.sql(
        """SELECT l.l_partkey, l.l_suppkey,
          |  CAST(l.l_extendedprice AS DOUBLE) AS price, s.s_name, n.n_name
          |FROM lineitem l
          |JOIN supplier s ON s.s_suppkey = l.l_suppkey
          |JOIN nation n ON n.n_nationkey = s.s_nationkey
          |WHERE l.l_partkey < 200
          |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
          |                           FROM lineitem l2
          |                           WHERE l2.l_partkey = l.l_partkey)
          |ORDER BY l.l_partkey, l.l_suppkey""".stripMargin)
    },

    // --- rolling time-interval window frame -----------------------------
    "q60_rolling_revenue" -> { (s, d) =>
      // 7-day rolling revenue per customer: a RANGE frame over integer
      // epoch-days, so the frame bound is a data-value distance (two
      // orders 6 days apart share a frame no matter how many rows sit
      // between them) — the semantics ROWS frames can't express.
      // DECIMAL(18,2) running sums are exact in any accumulation order
      // → hash-stable across engines. Scale: one shuffle on o_custkey
      // (uniform key, no skew), frame scan is O(orders-per-customer).
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      t(s, d, "orders")
        .where(col("o_custkey") < 1000)
        .withColumn("day", expr("unix_date(to_date(o_orderdate))"))
        .withColumn("roll7", asD(sum(dec(col("o_totalprice"))).over(w)))
        .select(col("o_orderkey"), col("o_custkey"), col("day"), col("roll7"))
        .orderBy(col("o_orderkey"))
    },

    // --- bounded-depth graph reachability (recursive-CTE equivalent) ----
    "q61_graph_reachability" -> { (s, d) =>
      // BFS to depth 4 over a supplier→part edge graph (node domain =
      // key % 100; edges sparsified to ~1/97 of lineitem). The oracle
      // is DuckDB's WITH RECURSIVE; Spark has no recursive CTE, so the
      // idiomatic form is the frontier-expansion loop: each hop joins
      // the (≤ node-domain, broadcast-sized) frontier against the edge
      // table and anti-joins the reached set so every node keeps its
      // first (= minimum) depth. At 100 TB the edge table shuffles
      // once; each hop is a broadcast join — no growing lineage risk
      // at 4 fixed rounds.
      import s.implicits._
      // Lineage discipline (optimization guide §3.3): without per-round
      // checkpoints, `reached`/`frontier` re-embed every prior round's
      // plan into the next — the unrolled 4-hop plan reached 3,425
      // lines / 268 Exchanges / 66 parquet scans (plans/r12/
      // q61_graph_reachability_before.txt) and Catalyst planning, not
      // the ≤ 100-row data, dominated the gate. Edges materialize once
      // (≤ node-domain² rows) and each hop's frontier is checkpointed,
      // so every round plans against flat leaves. Identical fixpoint,
      // identical output — only the plan is truncated. Checkpoints.cut
      // = localCheckpoint locally, reliable checkpoint when a
      // checkpoint dir is configured (durable at cluster scale).
      val edges = graft.core.Checkpoints.cut(t(s, d, "lineitem")
        .where(col("l_orderkey") % 97 === 0)
        .select((col("l_suppkey") % 100).as("src"), (col("l_partkey") % 100).as("dst"))
        .distinct())
      var reached = Seq((0L, 0)).toDF("node", "depth")
      var frontier = reached.select(col("node"))
      for (i <- 1 to 4) {
        val next = graft.core.Checkpoints.cut(
          reachabilityHop(frontier, edges, reached, i))
        reached = reached.unionByName(next)
        frontier = next.select(col("node"))
      }
      reached.groupBy(col("node")).agg(min(col("depth")).as("min_depth"))
        .orderBy(col("node"))
    },

    // --- three-valued-logic null semantics --------------------------------
    "q62_null_semantics" -> { (s, d) =>
      // Pins the ANSI corners engines most often get wrong: NOT IN
      // against a subquery CONTAINING a NULL is never true (n_not_in
      // must be 0 — Catalyst plans a null-aware anti join), NOT EXISTS
      // ignores the NULLs (n_not_exists > 0), and IS NOT DISTINCT FROM
      // is null-safe equality usable as a hash-join key. One scalar
      // row, three subqueries — semantics gate, not a volume gate.
      Tables.views(s, d, "customer", "orders")
      s.sql(RelationalQueries.nullSemanticsSql)
    },

    // --- LATERAL correlated top-N per key ---------------------------------
    "q63_lateral_topn" -> { (s, d) =>
      // Correlated LATERAL subquery with ORDER BY + LIMIT — the
      // "top 2 orders per customer" idiom. Catalyst decorrelates the
      // lateral to a ranked window join, never a per-row re-execution;
      // identical SQL text runs on both engines. Prices pass through
      // unarithmetic'd (stored doubles), so the compare is exact.
      Tables.views(s, d, "customer", "orders")
      s.sql(RelationalQueries.lateralTopnSql)
    },

    // --- GROUPING SETS + grouping() flags ---------------------------------
    "q64_grouping_sets" -> { (s, d) =>
      // Explicit GROUPING SETS (the generalization CUBE/ROLLUP sugar
      // over — q41 covers CUBE): per-(status, priority), per-status,
      // and grand-total rows in one pass, disambiguated by grouping()
      // flags. NULLS FIRST is pinned — Spark defaults asc-nulls-first,
      // DuckDB asc-nulls-last, and the rolled-up rows are NULL-keyed.
      Tables.views(s, d, "orders")
      s.sql(RelationalQueries.groupingSetsSql)
    },

    // --- multiset set operations (INTERSECT ALL / EXCEPT ALL) -------------
    "q65_set_ops_all" -> { (s, d) =>
      // The ALL variants keep DUPLICATE multiplicity (min(m_a, m_b) for
      // INTERSECT ALL, max(0, m_a − m_b) for EXCEPT ALL) — a different
      // physical plan from q40's distinct set ops; the gate pins the
      // multiplicities by re-counting them per key.
      Tables.views(s, d, "orders")
      s.sql(RelationalQueries.setOpsAllSql)
    },

    // --- rank-family windows (dense_rank / percent_rank / cume_dist) ------
    "q66_rank_windows" -> { (s, d) =>
      // percent_rank = (rank−1)/(n−1) and cume_dist = peers≤current / n
      // are single integer divisions → bit-identical doubles across
      // engines; dense_rank pins gap-free ranking next to q42's rank.
      Tables.views(s, d, "orders")
      s.sql(RelationalQueries.rankWindowsSql)
    },

    // --- cumulative distinct users (first-touch rewrite) ------------------
    "q67_cumulative_distinct" -> { (s, d) =>
      // "Distinct users to date, per day" — COUNT(DISTINCT) OVER a
      // running frame isn't supported (and would hold per-frame sets).
      // The scalable rewrite: a user contributes on exactly their
      // FIRST day, so cumulative-distinct = running sum of first-seen
      // counts — one groupBy(user) + one day-sized window instead of
      // per-frame distinct state. The oracle computes the naive
      // correlated form; the two must agree exactly.
      val ev = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      val days = ev.select(col("day")).distinct()
      days.join(firstSeen, Seq("day"), "left").na.fill(0L, Seq("n_new"))
        .withColumn("n_distinct_to_date", sum(col("n_new")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_new"), col("n_distinct_to_date"))
        .orderBy(col("day"))
    },

    // --- UNPIVOT (wide metrics → long form) -------------------------------
    "q68_unpivot" -> { (s, d) =>
      // The inverse of q37's PIVOT: wide per-status metrics melted to
      // (status, metric, val) rows — the shape metric stores and
      // chart layers consume. Identical SQL text both engines. The
      // price metric is exact cents (decimal × 100 → integral) because
      // DECIMAL→BIGINT casts DIVERGE on fractions: Spark truncates,
      // DuckDB rounds half-up.
      Tables.views(s, d, "orders")
      s.sql(RelationalQueries.unpivotSql)
    }
  )

  /** Shared verbatim with the DuckDB oracle. */
  val unpivotSql: String =
    """SELECT o_orderstatus, metric, val FROM (
      |  SELECT o_orderstatus,
      |    CAST(count(1) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
      |  FROM orders GROUP BY 1)
      |UNPIVOT (val FOR metric IN (n_orders, total_cents))
      |ORDER BY o_orderstatus, metric""".stripMargin

  /** Shared verbatim with the DuckDB oracle. */
  val setOpsAllSql: String =
    """WITH a AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
      |     b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT 'intersect_all' AS op, custkey, count(1) AS n FROM (
      |  SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1, 2
      |UNION ALL
      |SELECT 'except_all' AS op, custkey, count(1) AS n FROM (
      |  SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1, 2
      |ORDER BY op, custkey""".stripMargin

  /** Shared verbatim with the DuckDB oracle. */
  val rankWindowsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist
      |FROM orders WHERE o_custkey < 300
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, drank""".stripMargin

  /** Shared verbatim with the DuckDB oracle. */
  val lateralTopnSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_custkey < 200
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  /** Shared verbatim with the DuckDB oracle. */
  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(1) AS n,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY g_status, g_prio,
      |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Shared verbatim with the DuckDB oracle — the point IS identical
    * ANSI behavior on identical text.
    */
  val nullSemanticsSql: String =
    """WITH sub AS (
      |  SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END AS k
      |  FROM orders WHERE o_custkey < 500
      |)
      |SELECT
      |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT k FROM sub)) AS n_not_in,
      |  (SELECT count(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)) AS n_not_exists,
      |  (SELECT count(*) FROM customer c JOIN sub ON c.c_custkey IS NOT DISTINCT FROM sub.k)
      |    AS n_nullsafe_pairs""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q62_null_semantics" -> nullSemanticsSql,
    "q63_lateral_topn" -> lateralTopnSql,
    "q64_grouping_sets" -> groupingSetsSql,
    "q65_set_ops_all" -> setOpsAllSql,
    "q66_rank_windows" -> rankWindowsSql,
    "q68_unpivot" -> unpivotSql,

    // naive correlated form — must equal the first-touch rewrite
    "q67_cumulative_distinct" ->
      """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        |fs AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
        |), nn AS (
        |  SELECT day, CAST(count(1) AS BIGINT) AS n_new FROM fs GROUP BY 1
        |)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |  coalesce(nn.n_new, 0) AS n_new,
        |  (SELECT count(DISTINCT e.user_id) FROM events e
        |   WHERE CAST(e.ts AS DATE) <= d.day) AS n_distinct_to_date
        |FROM days d LEFT JOIN nn ON d.day = nn.day
        |ORDER BY day""".stripMargin,

    "q60_rolling_revenue" ->
      """SELECT o_orderkey, o_custkey,
        |  (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll7
        |FROM orders WHERE o_custkey < 1000
        |ORDER BY o_orderkey""".stripMargin,

    "q61_graph_reachability" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT l_suppkey % 100 AS src, l_partkey % 100 AS dst
        |  FROM lineitem WHERE l_orderkey % 97 = 0
        |), r AS (
        |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
        |  UNION ALL
        |  SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.node
        |  WHERE r.depth < 4
        |)
        |SELECT node, min(depth) AS min_depth FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q59_correlated_scalar" ->
      """SELECT l.l_partkey, l.l_suppkey,
        |  CAST(l.l_extendedprice AS DOUBLE) AS price, s.s_name, n.n_name
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE l.l_partkey < 200
        |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
        |                           FROM lineitem l2
        |                           WHERE l2.l_partkey = l.l_partkey)
        |ORDER BY l.l_partkey, l.l_suppkey""".stripMargin,

    "q54_incremental_rollup" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  count(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY month, o_orderstatus""".stripMargin,

    "q55_scd2_snapshot_diff" ->
      """WITH h AS (
        |  SELECT c_custkey, md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|'
        |    || CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) || '|' || c_mktsegment) AS rh
        |  FROM customer
        |), h2 AS (
        |  SELECT c_custkey, md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|'
        |    || CAST(CAST(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END
        |        AS DECIMAL(18,2)) AS VARCHAR) || '|' || c_mktsegment) AS rh
        |  FROM customer WHERE c_custkey % 17 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 100000, md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|'
        |    || CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) || '|' || c_mktsegment)
        |  FROM customer WHERE c_custkey % 13 = 0
        |)
        |SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
        |  CASE WHEN a.c_custkey IS NULL THEN 'insert'
        |       WHEN b.c_custkey IS NULL THEN 'delete'
        |       WHEN a.rh <> b.rh THEN 'update' END AS change_type,
        |  a.rh AS old_hash, b.rh AS new_hash
        |FROM h a FULL OUTER JOIN h2 b ON a.c_custkey = b.c_custkey
        |WHERE (a.c_custkey IS NULL OR b.c_custkey IS NULL OR a.rh <> b.rh)
        |ORDER BY c_custkey""".stripMargin,

    "q56_sessionize_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
        |), g AS (
        |  SELECT *, ts_us - lag(ts_us) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us
        |  FROM e
        |), f AS (
        |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 7200000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM g
        |), sid AS (
        |  SELECT *, SUM(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS session_id
        |  FROM f
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(1) AS n_events, count(DISTINCT event_type) AS n_types,
        |  CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) AS BIGINT) AS end_us,
        |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS dur_us
        |FROM sid GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q57_event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |), v AS (
        |  SELECT user_id, CAST(min(ts_us) AS BIGINT) AS view_us
        |  FROM e WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, CAST(min(e.ts_us) AS BIGINT) AS click_us
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > v.view_us GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, CAST(min(e.ts_us) AS BIGINT) AS purchase_us
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > c.click_us GROUP BY e.user_id
        |)
        |SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
        |  CAST(CASE WHEN p.purchase_us IS NOT NULL THEN 3
        |            WHEN c.click_us IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "q58_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) // 7 AS week
        |  FROM events
        |), fs AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
        |)
        |SELECT fs.cohort_week, e.week - fs.cohort_week AS week_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN fs ON e.user_id = fs.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q52_locf_ignore_nulls" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
        |  last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_f_price
        |FROM orders
        |WHERE o_custkey < 500
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q53_lateral_subquery" ->
      """SELECT c.c_custkey, t.max_price, t.n
        |FROM customer c,
        |LATERAL (SELECT max(o.o_totalprice) AS max_price, count(1) AS n
        |         FROM orders o WHERE o.o_custkey = c.c_custkey) t
        |WHERE c.c_custkey < 300
        |ORDER BY c.c_custkey""".stripMargin,

    "q51_percentiles" ->
      """SELECT l_returnflag,
        |  count(1) AS n,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_qty,
        |  COUNT(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_window_count_by_date" ->
      """SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d, count(1) AS cnt
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-03-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q04_groupby_ordinal" ->
      "SELECT o_orderstatus, count(1) AS cnt FROM orders GROUP BY 1 ORDER BY 1",

    "q05_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q06_join_broadcast" ->
      """SELECT c_mktsegment, count(1) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q07_join_multiway" ->
      """SELECT r_name, count(1) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q08_join_left" ->
      """SELECT c_mktsegment, count(1) AS row_cnt, count(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |) o ON c_custkey = o.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q09_join_full_outer" ->
      """SELECT count(1) AS row_cnt, count(o_orderkey) AS with_order,
        |  count(c_custkey) AS with_cust
        |FROM (SELECT * FROM orders WHERE o_orderstatus = 'O') o
        |FULL OUTER JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
        |  ON o.o_custkey = c.c_custkey""".stripMargin,

    "q10_join_self" ->
      """SELECT o1.o_orderstatus AS s1, o2.o_orderstatus AS s2, count(1) AS pair_cnt
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_join_semi_anti" ->
      """WITH recent AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01')
        |SELECT 'anti' AS kind, count(1) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'semi' AS kind, count(1) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
        |ORDER BY kind""".stripMargin,

    "q12_cte_join" ->
      """WITH cust_orders AS (
        |  SELECT o_custkey, count(1) AS n_orders FROM orders GROUP BY o_custkey
        |)
        |SELECT c.c_mktsegment, count(1) AS n_cust, CAST(sum(co.n_orders) AS BIGINT) AS total_orders
        |FROM customer c JOIN cust_orders co ON c.c_custkey = co.o_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "q13_subquery_from" ->
      """SELECT n_orders, count(1) AS n_cust
        |FROM (SELECT o_custkey, count(1) AS n_orders FROM orders GROUP BY o_custkey) t
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,

    "q14_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q15_collect_set_dates" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT CAST(CAST(o_orderdate AS DATE) AS VARCHAR))), ',') AS dates,
        |  count(DISTINCT CAST(o_orderdate AS DATE)) AS n_dates
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-02-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q16_casts" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(count(o_orderkey) AS DECIMAL(38,9)) AS DOUBLE) AS order_count,
        |  max(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS max_date,
        |  max(CAST(o_orderdate AS TIMESTAMP)) AS max_ts
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q17_date_functions" ->
      """WITH base AS (
        |  SELECT CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR) AS week_start_date,
        |    CAST(extract(day FROM o_orderdate) AS BIGINT) AS day_of_month,
        |    CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 30 DAY AS DATE) AS VARCHAR) AS minus_30d,
        |    lower(o_orderpriority) AS prio_lower,
        |    CAST(extract(day FROM o_orderdate) AS BIGINT) + 8000 AS day_plus
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-06-01'
        |)
        |SELECT week_start_date, count(1) AS cnt,
        |  min(minus_30d) AS min_minus_30d,
        |  max(day_plus) AS max_day_plus,
        |  count(DISTINCT prio_lower) AS n_prio
        |FROM base GROUP BY week_start_date ORDER BY week_start_date""".stripMargin,

    "q18_tz_date" ->
      """SELECT CAST(CAST(ts + INTERVAL 7 HOUR AS DATE) AS VARCHAR) AS jkt_date, count(1) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_in_unnest" ->
      """SELECT o_orderpriority, count(1) AS cnt FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_interval_arith" ->
      """SELECT event_type, count(1) AS cnt FROM events
        |WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' - INTERVAL 10 DAY
        |  AND ts < TIMESTAMP '2024-01-25 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_struct" ->
      """SELECT o_orderpriority,
        |  CAST(to_json({'priority': o_orderpriority, 'cnt': count(1)}) AS VARCHAR) AS payload_json
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q22_union" ->
      """WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
        |b AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT * FROM (
        |  SELECT o_orderpriority, count(1) AS cnt FROM u GROUP BY 1
        |  UNION ALL
        |  SELECT o_orderpriority, -1 * count(1) AS cnt
        |  FROM (SELECT DISTINCT o_orderpriority FROM u) GROUP BY o_orderpriority
        |) ORDER BY o_orderpriority, cnt""".stripMargin,

    "q23_window_function" ->
      """WITH firsts AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders
        |)
        |SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS first_order_year,
        |  count(1) AS n_customers
        |FROM firsts WHERE rn = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_json_extract" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(1) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q25_ingestion_time" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS _ingest_date, event_type, count(1) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(ts AS DATE) >= DATE '2024-01-10' AND CAST(ts AS DATE) < DATE '2024-01-20'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q26_merge_replace_model" ->
      """WITH dest AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d, count(1) AS cnt FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |  GROUP BY 1
        |), source AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d, count(1) AS cnt FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-03-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |    AND o_orderstatus = 'F'
        |  GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT * FROM dest WHERE d NOT IN (SELECT d FROM source)
        |  UNION ALL SELECT * FROM source
        |) ORDER BY d""".stripMargin,

    "q27_append_model" ->
      """SELECT o_orderkey, o_totalprice,
        |  TIMESTAMP '2024-05-01 10:00:00' AS load_timestamp
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-01-08'
        |ORDER BY o_orderkey""".stripMargin,

    "q28_replace_all_model" ->
      """SELECT '1998-01-01' AS partition_date, count(1) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1998-02-01'""".stripMargin,

    "q29_weekly_partitioned" ->
      """SELECT CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR) AS week_start_date,
        |  CAST(CAST(count(o_orderkey) AS DECIMAL(38,9)) AS DOUBLE) AS order_count
        |FROM orders WHERE lower(o_orderstatus) = 'f'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q30_having" ->
      """SELECT l_orderkey, count(1) AS n_lines FROM lineitem
        |GROUP BY l_orderkey HAVING count(1) >= 5 ORDER BY l_orderkey""".stripMargin,

    "q31_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(1) AS cnt
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q32_salted_skew_join" ->
      """SELECT c_mktsegment, count(1) AS cnt
        |FROM (SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE o_custkey END AS k FROM orders) o
        |JOIN customer ON o.k = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q33_shipping_priority" ->
      """SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
        |  o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,

    "q34_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(1) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q35_asof_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS view_id,
        |  epoch_us(a.ts) - epoch_us(b.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts
        |ORDER BY click_id""".stripMargin,

    "q36_range_join_binned" ->
      """SELECT e.event_id AS err_id, count(c.event_id) AS n_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id
        | AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts < e.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q37_pivot" ->
      """SELECT o_orderstatus,
        |  count(1) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |  count(1) FILTER (o_orderpriority = '2-HIGH') AS high,
        |  count(1) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        |  count(1) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec,
        |  count(1) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q38_exists_correlated" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q39_lateral_explode" ->
      """SELECT token, count(1) AS cnt, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id,
        |        unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |      FROM documents)
        |WHERE length(token) > 3
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin,

    "q40_set_ops" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q41_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "q42_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  lag(o_orderkey) OVER w AS prev_order,
        |  lead(o_orderkey) OVER w AS next_order,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  CAST(rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, odate, o_orderkey""".stripMargin,

    "q43_latest_per_key" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q44_rolling_range_window" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d,
        |  CAST(count(1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM orders
        |ORDER BY o_custkey, odate, o_orderkey""".stripMargin,

    "q45_date_spine_gapfill" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-01-31', INTERVAL 1 DAY))::DATE AS day
        |), daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(1) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
        |  GROUP BY 1
        |)
        |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY day""".stripMargin,

    "q46_regional_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q47_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(1) AS cnt,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority))
        |ORDER BY status, priority""".stripMargin,

    "q48_array_agg_ordered" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_transform(
        |    list_sort(list({'o_totalprice': o_totalprice, 'o_orderkey': o_orderkey}))[1:3],
        |    x -> CAST(x.o_orderkey AS VARCHAR)), ',') AS cheapest3
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // UNION ALL restatement of the unpivot (stable across DuckDB's
    // UNPIVOT quirks)
    "q49_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_open,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_finished,
        |    count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_pending
        |  FROM orders GROUP BY o_orderpriority
        |)
        |SELECT o_orderpriority, status, n FROM (
        |  SELECT o_orderpriority, 'st_open' AS status, st_open AS n FROM wide
        |  UNION ALL
        |  SELECT o_orderpriority, 'st_finished' AS status, st_finished AS n FROM wide
        |  UNION ALL
        |  SELECT o_orderpriority, 'st_pending' AS status, st_pending AS n FROM wide
        |)
        |ORDER BY o_orderpriority, status""".stripMargin,

    "q50_recursive_cte" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months WHERE m < DATE '2001-08-01'
        |)
        |SELECT strftime(m.m, '%Y-%m') AS month,
        |  CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
        |FROM months m LEFT JOIN (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS mo, count(1) AS n
        |  FROM orders GROUP BY 1
        |) o ON o.mo = strftime(m.m, '%Y-%m')
        |ORDER BY month""".stripMargin
  )
}
