package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Relational surface — the SURVEY §2.3 "explicitly absent" categories the
 * Spark engine provides as built-ins (joins, aggregation, windows, sorts,
 * set ops, scalar functions, event-time windows). Each query is written the
 * way the 100 TB plan should look: broadcast hints on dims, partial
 * aggregation, TakeOrderedAndProject for top-k.
 *
 * FP-determinism convention for oracles: double columns that get *aggregated*
 * are first cast to DECIMAL (exact, association-free) and the exact sum is
 * converted back to DOUBLE — both engines then produce bit-identical values
 * regardless of partitioning/order. Raw pass-through doubles are safe as-is.
 */
object RelationalQueries {

  /** `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` — exact distributed sum. */
  private def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  def all: Seq[QueryDef] = Seq(aggQ1, aggDistinct, aggRollup, aggCube, pivotEvents,
    joinBroadcast, joinShuffle, joinSemiAnti, windowRank, windowRunning, topK, setOps,
    scalarFuncs, dateFuncs, streamWindow, streamSession, saltedAgg, approxDistinct,
    windowLag, joinRange, joinAsof, aggPercentile, unpivotLineitem,
    funnelEvents, jsonFuncs, aggGroupingSets)

  /** Multi-stage conversion funnel (view → click within 24 h → purchase
    * within 72 h), each stage the user's FIRST qualifying event after the
    * previous stage. ONE scan of events (stage predicates share it; only
    * the three funnel event types survive the pushed filter) and ONE
    * exchange: each stage is a per-user window minimum over the previous
    * stage's column, and chained windows plus the final fold all reuse the
    * same `user_id` hash partitioning — at 100 TB the events table is read
    * once instead of once per stage. */
  val funnelEvents: QueryDef = QueryDef("funnel_events",
    (s, d) => {
      val w = Window.partitionBy("user_id")
      val staged = Tables.events(s, d)
        .where(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" &&
            col("ts") > col("t_view") &&
            col("ts") <= col("t_view") + expr("INTERVAL 24 HOURS"),
            col("ts"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("t_click") &&
            col("ts") <= col("t_click") + expr("INTERVAL 72 HOURS"),
            col("ts"))).over(w))
      // stage columns are per-user constants: the fold to one row per user
      // reuses the window's partitioning (no second hash exchange)
      staged.groupBy("user_id")
        .agg(min("t_view").as("t_view"), min("t_click").as("t_click"),
          min("t_purchase").as("t_purchase"))
        .where(col("t_view").isNotNull)
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          (lit(1) + col("t_click").isNotNull.cast("int") +
            col("t_purchase").isNotNull.cast("int")).cast("long").as("stage"))
        .orderBy("user_id")
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
           |          WHERE event_type = 'view' GROUP BY 1),
           |c AS (SELECT e.user_id, min(e.ts) AS t_click
           |      FROM events e JOIN v ON e.user_id = v.user_id
           |      WHERE e.event_type = 'click' AND e.ts > v.t_view
           |        AND e.ts <= v.t_view + INTERVAL 24 HOUR GROUP BY 1),
           |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
           |      FROM events e JOIN c ON e.user_id = c.user_id
           |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
           |        AND e.ts <= c.t_click + INTERVAL 72 HOUR GROUP BY 1)
           |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           |  (1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT)::BIGINT AS stage
           |FROM v LEFT JOIN c ON v.user_id = c.user_id
           |       LEFT JOIN p ON v.user_id = p.user_id
           |ORDER BY v.user_id""".stripMargin))

  /** JSON scalar extraction over the `props` payload column (the §2.3
    * json-function category) — per-row, codegen'd, no shuffle. */
  val jsonFuncs: QueryDef = QueryDef("json_funcs",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(col("props"), "$.k").as("k_str"))
      .orderBy("event_id"),
    Some("""SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k,
           |  json_extract_string(props, '$.k') AS k_str
           |FROM events ORDER BY event_id""".stripMargin))

  /** Exact percentiles (median/p95, linear interpolation) per group — the
    * distributed exact form sorts only within each group's aggregation
    * buffer; round(6) absorbs the one-ulp interpolation-formula difference
    * between engines. */
  val aggPercentile: QueryDef = QueryDef("agg_percentile",
    (s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5D)"), 6).as("p50"),
        round(expr("percentile(value, 0.95D)"), 6).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
           |  round(quantile_cont(value, 0.5), 6) AS p50,
           |  round(quantile_cont(value, 0.95), 6) AS p95,
           |  count(*)::BIGINT AS n
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** UNPIVOT (wide → long melt, the inverse of pivot_events): three measure
    * columns become (metric, val) rows — a generator expression per row, no
    * shuffle. */
  val unpivotLineitem: QueryDef = QueryDef("unpivot_lineitem",
    (s, d) => Tables.lineitem(s, d)
      .where(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity").as("l_quantity"),
          col("l_extendedprice").as("l_extendedprice"),
          col("l_discount").as("l_discount")),
        "metric", "val")
      .orderBy("l_orderkey", "l_linenumber", "metric"),
    Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
           |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
           |  FROM lineitem WHERE l_orderkey < 100
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
           |  FROM lineitem WHERE l_orderkey < 100
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
           |  FROM lineitem WHERE l_orderkey < 100)
           |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin))

  /** Backward as-of join (kdb aj / DuckDB ASOF): each click picks up the
    * most recent purchase of the same user at or before its timestamp, via
    * [[graft.operators.AsofJoin]]'s union-and-sweep (one shuffle, one sort,
    * no range self-join); oracle is DuckDB's native ASOF LEFT JOIN. The
    * purchase side is pre-deduped per (user, ts) with a max-event_id
    * tie-break so the matched payload is well-defined in both engines. */
  val joinAsof: QueryDef = QueryDef("join_asof",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val purchases = ev.where(col("event_type") === "purchase")
        .withColumn("__rn", row_number().over(pw)).where(col("__rn") === 1)
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_event_id"), col("value").as("purchase_value"))
      graft.operators.AsofJoin.backward(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_event_id", "purchase_value"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |p0 AS (SELECT user_id, ts, event_id, value,
           |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           |  FROM events WHERE event_type = 'purchase'),
           |p AS (SELECT user_id, ts, event_id AS purchase_event_id,
           |    value AS purchase_value FROM p0 WHERE rn = 1)
           |SELECT c.event_id, c.user_id, c.ts, p.purchase_event_id, p.purchase_value
           |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
           |ORDER BY c.event_id""".stripMargin))

  /** TPC-H Q1-shaped grouped aggregation (partial+final, exact sums). */
  val aggQ1: QueryDef = QueryDef("agg_q1",
    (s, d) => Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
           |  sum(l_quantity) AS sum_qty,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           |    AS sum_disc_price,
           |  count(*) AS count_order,
           |  round(sum(l_quantity) / count(*), 6) AS avg_qty
           |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Exact distinct aggregation per group. */
  val aggDistinct: QueryDef = QueryDef("agg_distinct",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** ROLLUP grouping sets over the region⋈nation dim join. */
  val aggRollup: QueryDef = QueryDef("agg_rollup",
    (s, d) => Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"), col("n"))
      .orderBy("region_name", "nation_name"),
    Some("""SELECT coalesce(r_name, 'ALL') AS region_name,
           |  coalesce(n_name, 'ALL') AS nation_name, count(*) AS n
           |FROM nation JOIN region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP (r_name, n_name) ORDER BY region_name, nation_name""".stripMargin))

  /** Explicit GROUPING SETS (the general form ROLLUP/CUBE desugar to):
    * per-flag, per-status, and grand-total groups in ONE pass — the
    * Expand operator replicates each input row once per matching set, so
    * three aggregations cost one scan and one partial+final agg. */
  val aggGroupingSets: QueryDef = QueryDef("agg_grouping_sets",
    (s, d) => Tables.lineitem(s, d)
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
           |  coalesce(l_linestatus, 'ALL') AS ls,
           |  count(*) AS n, sum(l_quantity) AS sum_qty
           |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY rf, ls""".stripMargin))

  /** CUBE grouping sets over two independent dimensions. */
  val aggCube: QueryDef = QueryDef("agg_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))
      .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
           |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY rf, ls""".stripMargin))

  /** PIVOT: per-user event counts fanned across event types. */
  val pivotEvents: QueryDef = QueryDef("pivot_events",
    (s, d) => Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id"),
    Some("""SELECT user_id,
           |  count(*) FILTER (WHERE event_type = 'click') AS click,
           |  count(*) FILTER (WHERE event_type = 'view') AS view,
           |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
           |  count(*) FILTER (WHERE event_type = 'error') AS error
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Star join with broadcast dims: orders ⋈ customer ⋈ nation. */
  val joinBroadcast: QueryDef = QueryDef("join_broadcast",
    (s, d) => Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("total"))
      .orderBy("n_name"),
    Some("""SELECT n_name, count(*) AS n_orders,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Large-table shuffle join (sort-merge/shuffled-hash territory at scale). */
  val joinShuffle: QueryDef = QueryDef("join_shuffle",
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .where(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_orderkey")).as("n_orders"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
           |  sum(l_quantity) AS sum_qty
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Semi/anti joins: customers with vs without orders. */
  val joinSemiAnti: QueryDef = QueryDef("join_semi_anti",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(lit("no_orders").as("tag"), col("c_custkey"))
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(lit("has_orders").as("tag"), col("c_custkey"))
      without.unionAll(withO).orderBy("tag", "c_custkey")
    },
    Some("""SELECT 'no_orders' AS tag, c_custkey FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |UNION ALL
           |SELECT 'has_orders' AS tag, c_custkey FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |ORDER BY tag, c_custkey""".stripMargin))

  /** Ranking window: top-3 orders per customer. */
  val windowRank: QueryDef = QueryDef("window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           |  SELECT *, row_number() OVER (PARTITION BY o_custkey
           |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
           |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin))

  /** Running-frame window: cumulative per-user value (exact decimal sum —
    * DuckDB's segment-tree window aggregation would otherwise differ in FP
    * association from Spark's sequential frame). */
  val windowRunning: QueryDef = QueryDef("window_running",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("run_sum",
          sum(col("value").cast(DecimalType(14, 2))).over(w).cast("double"))
        .select("event_id", "user_id", "run_sum")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
           |  CAST(sum(CAST(value AS DECIMAL(14,2))) OVER (PARTITION BY user_id
           |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_sum
           |FROM events ORDER BY event_id""".stripMargin))

  /** Analytic window: lead/lag deltas per user (exact decimal deltas). */
  val windowLag: QueryDef = QueryDef("window_lag",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_value",
          lag(col("value").cast(DecimalType(14, 2)), 1).over(w))
        .withColumn("delta",
          (col("value").cast(DecimalType(14, 2)) - col("prev_value")).cast("double"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          col("prev_value").cast("double").as("prev_value"), col("delta"), col("next_type"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
           |  CAST(lag(CAST(value AS DECIMAL(14,2)), 1) OVER w AS DOUBLE) AS prev_value,
           |  CAST(CAST(value AS DECIMAL(14,2)) - lag(CAST(value AS DECIMAL(14,2)), 1) OVER w
           |       AS DOUBLE) AS delta,
           |  lead(event_type, 1) OVER w AS next_type
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |ORDER BY event_id""".stripMargin))

  /** Range (theta) join: orders bucketed into literal price bands — plans as
    * a broadcast nested-loop against the tiny band table (the correct shape:
    * broadcast the bands, never shuffle the facts for a non-equi join). */
  val joinRange: QueryDef = QueryDef("join_range",
    (s, d) => {
      import s.implicits._
      val bands = Seq(("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0),
        ("high", 300000.0, 1e9)).toDF("band", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), exactSum(col("o_totalprice")).as("total"))
        .orderBy("band")
    },
    Some("""WITH bands(band, lo, hi) AS (VALUES
           |  ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0), ('high', 300000.0, 1e9))
           |SELECT band, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
           |GROUP BY band ORDER BY band""".stripMargin))

  /** Top-k: planned as TakeOrderedAndProject (no full sort at scale). */
  val topK: QueryDef = QueryDef("topk",
    (s, d) => Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin))

  /** Set operations: INTERSECT + EXCEPT with tags. */
  val setOps: QueryDef = QueryDef("set_ops",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val o = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val both = c.intersect(o).select(lit("both").as("tag"), col("k"))
      val custOnly = c.except(o).select(lit("cust_only").as("tag"), col("k"))
      both.unionAll(custOnly).orderBy("tag", "k")
    },
    Some("""SELECT 'both' AS tag, k FROM
           |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
           |UNION ALL
           |SELECT 'cust_only' AS tag, k FROM
           |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
           |ORDER BY tag, k""".stripMargin))

  /** Scalar string/math function battery. */
  val scalarFuncs: QueryDef = QueryDef("scalar_funcs",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 5).as("sub"),
        length(col("p_name")).cast("long").as("len"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
        regexp_replace(col("p_type"), " ", "_").as("repl"),
        abs(col("p_size") - 25).cast("long").as("ab"),
        round(col("p_retailprice") * 1.1, 2).as("adj"),
        when(col("p_size") > 30, "big").otherwise("small").as("sz"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 5) AS sub,
           |  length(p_name)::BIGINT AS len, concat(p_brand, '-', p_type) AS cat,
           |  replace(p_type, ' ', '_') AS repl, abs(p_size - 25)::BIGINT AS ab,
           |  round(p_retailprice * 1.1, 2) AS adj,
           |  CASE WHEN p_size > 30 THEN 'big' ELSE 'small' END AS sz
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Date/time function battery. */
  val dateFuncs: QueryDef = QueryDef("date_funcs",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, year(o_orderdate)::BIGINT AS y,
           |  month(o_orderdate)::BIGINT AS m, day(o_orderdate)::BIGINT AS dom,
           |  date_trunc('month', o_orderdate)::TIMESTAMP AS mon_start,
           |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS days_since
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Event-time tumbling window aggregation (Structured Streaming `window()`
    * semantics, batch-checked; streaming run covered in StreamingSpec). */
  val streamWindow: QueryDef = QueryDef("stream_window",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(14, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type"),
    Some("""SELECT date_trunc('hour', ts)::TIMESTAMP AS win_start, event_type,
           |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Skew pattern: salted two-phase aggregation — partial aggregate on
    * (key, salt) spreads a hot key over the cluster, final aggregate merges.
    * Result must equal the plain GROUP BY (the oracle) exactly; exact
    * decimal sums make the two-phase re-association safe. */
  val saltedAgg: QueryDef = QueryDef("salted_agg",
    (s, d) => {
      val salted = Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast(DecimalType(18, 2))).as("pv"))
      salted.groupBy("event_type")
        .agg(sum(col("pn")).as("n"), sum(col("pv")).cast("double").as("sum_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** HLL approximate distinct. Sketch internals are engine-specific, so the
    * oracle gates the *error bound* instead of the estimate: the emitted
    * boolean `within_bound` (relative error ≤ 5% at rsd 0.02) must
    * hash-match DuckDB's literal TRUE; exactness itself is covered by
    * agg_distinct. */
  val approxDistinct: QueryDef = QueryDef("approx_distinct",
    (s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("within_bound"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
           |  TRUE AS within_bound
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Session windows (10-minute gap) per user — `session_window` vs the
    * classic gaps-and-islands SQL. */
  val streamSession: QueryDef = QueryDef("stream_session",
    (s, d) => Tables.events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))
      .orderBy("user_id", "session_start"),
    Some("""WITH g AS (
           |  SELECT user_id, ts, event_id,
           |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |              > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
           |  FROM events),
           |s AS (
           |  SELECT user_id, ts,
           |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM g)
           |SELECT user_id, min(ts) AS session_start,
           |  max(ts) + INTERVAL 10 MINUTE AS session_end, count(*) AS n
           |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin))
}
