package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2-§2.6) expressed over the
  * driver's TPC-H-ish tables, each with a DuckDB-equivalent oracle.
  *
  * Numeric-parity conventions (Spark vs DuckDB hash compare):
  * - money sums go through DECIMAL(18,2) (exact, associative — safe under
  *   any partitioning), then CAST AS DOUBLE in both engines;
  * - ratios are double divisions of exact sums (identical IEEE result);
  * - floating aggregates (stddev/percentile) are rounded to 4 decimals;
  * - every result carries an ORDER BY on a unique key.
  */
object RelationalQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  val fns: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3/A4: groupBy rollup with exact decimal sums (TPC-H Q1 shape).
    "q1_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_price"),
          (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Pivot (wide rollup): exact order totals per month × status — the
    // reshape step reporting sinks want. One shuffle on the month key.
    "q42_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("mth", month(col("o_orderdate")).cast("long"))
        .groupBy("mth")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(sum(dec("o_totalprice")).cast("double"))
        .orderBy("mth")
    }),

    // Skew-salted shuffle join: events (hot event_type keys) ⋈ a dim on the
    // salted composite key — result must equal the plain join (the oracle).
    "q47_skew_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val dim = events.select(col("event_type")).distinct()
        .withColumn("type_len", length(col("event_type")).cast("long"))
      graft.operators.SkewJoin.saltedJoin(events, dim, "event_type", salt = 16)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec("value")).cast("double").as("sum_v"),
          max("type_len").as("type_len"))
        .orderBy("event_type")
    }),

    // Binned range join: events contained in ±2-minute windows around every
    // 100th event — equi-join on the time bin, no nested-loop join.
    "q48_range_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val ivals = events.filter(col("event_id") % 100 === 0)
        .select(col("event_id").as("ival_id"),
          (col("ts") - expr("INTERVAL 2 MINUTES")).as("t_start"),
          (col("ts") + expr("INTERVAL 2 MINUTES")).as("t_end"))
      graft.operators.RangeJoin.pointInInterval(
          events.select(col("event_id"), col("ts"), col("value")),
          ivals, "ts", "t_start", "t_end", binSizeSec = 120)
        .groupBy("ival_id")
        .agg(count(lit(1)).as("n"),
          sum(dec("value")).cast("double").as("sum_v"))
        .orderBy("ival_id")
    }),

    // Sketch aggregates: HLL++ approx distinct + approx percentile — the
    // single-pass, bounded-memory substitutes for exact distinct/percentile
    // at 100 TB (exactness bound asserted in SketchSpec; golden-pinned).
    "q49_sketch_stats" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count_distinct(col("user_id")).as("exact_users"),
          round(percentile_approx(col("value"), lit(0.5), lit(1000)), 4).as("p50_approx"),
          round(percentile_approx(col("value"), lit(0.9), lit(1000)), 4).as("p90_approx"))
        .orderBy("event_type")
    }),

    // P1/P2/P3: contains + equality + IN filters with pushdown, projection.
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" &&
          col("o_orderpriority").contains("1") &&
          col("o_custkey").isin(1L to 200L: _*))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // J1: multi-way equi join; dims are broadcast (small sides).
    "q3_join_enrich" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
          sum(dec("c_acctbal")).cast("double").as("sum_bal"))
        .orderBy("r_name")
    }),

    // J2: left join with default for missing matches (coalesce-on-null).
    "q4_left_join_default" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), sum(dec("o_totalprice")).as("tot"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"),
          coalesce(col("tot").cast("double"), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey")
    }),

    // O2: top-k by ascending metric with unique-key tiebreak.
    "q5_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        .limit(10)
    }),

    // P6/U4/A5: difficulty-split labeling + unionByName + per-split rollup.
    "q6_union_split" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val base = o.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("split", lit("base"))
      val advanced = o.filter(col("o_orderpriority") =!= "1-URGENT")
        .withColumn("split", lit("advanced"))
      base.unionByName(advanced)
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_totalprice") > 100000.0, 1).otherwise(0)).as("n_large"),
          sum(dec("o_totalprice")).cast("double").as("sum_price"))
        .orderBy("split")
    }),

    // A8: latency-stats shape — mean/stddev/median/P90/P95/P99 (interpolated).
    "q7_percentiles" -> ((s, dir) => {
      // ONE percentile aggregate with an array of percentages: four scalar
      // percentile() calls each kept their own per-group value buffer (the
      // whole column collected four times per group); the array form sorts
      // one buffer and interpolates all four points from it — values are
      // computed by the identical Percentile interpolation, element per
      // element (the oracle's QUANTILE_CONT per point is unchanged)
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round((sum(dec("value")).cast("double") / count(lit(1))), 4).as("mean_v"),
          round(stddev_samp(col("value")), 4).as("stdev_v"),
          percentile(col("value"),
            array(lit(0.5), lit(0.9), lit(0.95), lit(0.99))).as("_ps"))
        .select(col("event_type"), col("n"), col("mean_v"), col("stdev_v"),
          round(element_at(col("_ps"), 1), 4).as("p50"),
          round(element_at(col("_ps"), 2), 4).as("p90"),
          round(element_at(col("_ps"), 3), 4).as("p95"),
          round(element_at(col("_ps"), 4), 4).as("p99"))
        .orderBy("event_type")
    }),

    // A6/A7: binary presence confusion matrix + accuracy (per user: does an
    // 'error' event predict a 'click' event?).
    "q8_confusion" -> ((s, dir) => {
      val flags = t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          max(when(col("event_type") === "error", 1).otherwise(0)).as("pred"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("actual"))
      flags.agg(
        sum(when(col("pred") === 1 && col("actual") === 1, 1).otherwise(0)).as("tp"),
        sum(when(col("pred") === 1 && col("actual") === 0, 1).otherwise(0)).as("fp"),
        sum(when(col("pred") === 0 && col("actual") === 1, 1).otherwise(0)).as("fn"),
        sum(when(col("pred") === 0 && col("actual") === 0, 1).otherwise(0)).as("tn"),
        count(lit(1)).as("total"))
    }),

    // O1 + scalar functions: per-day event rollup (date truncation, string ops).
    "q9_daily_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec("value")).cast("double").as("sum_v"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day", "event_type")
    }),

    // CUBE rollup: all grouping-set combinations in one pass.
    "q32_cube" -> ((s, dir) => {
      t(s, dir, "events")
        .cube(col("event_type"), dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n"), sum(dec("value")).cast("double").as("sum_v"))
        .orderBy(col("event_type").asc_nulls_first, col("dow").asc_nulls_first)
    }),

    // Window functions: per-user running sum + inter-event gap (lag).
    "q33_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      t(s, dir, "events")
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"),
          sum(dec("value")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_v"),
          coalesce(col("event_id") - lag(col("event_id"), 1).over(w), lit(-1L)).as("gap"),
          row_number().over(w).as("rn"))
        .orderBy("user_id", "event_id")
    }),

    // As-of join: each click event picks up the latest prior error value of
    // the same user (point-in-time lookup; DuckDB-native ASOF JOIN oracle).
    "q35_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value").as("last_error_value"))
      graft.operators.AsOfJoin.asofLeft(clicks, errors, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
          coalesce(round(col("last_error_value"), 2), lit(-1.0)).as("last_error_value"))
        .orderBy("event_id")
    }),

    // Vocabulary stats: exact distinct tokens per language (explode + agg).
    "q34_vocab_stats" -> ((s, dir) => {
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("lang"), explode(graft.functions.TextFunctions.tokensLower(col("text"))).as("tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_distinct"))
        .orderBy("lang")
    }))

  val sql: Map[String, String] = Map(
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderpriority LIKE '%1%'
        |  AND o_custkey BETWEEN 1 AND 200
        |ORDER BY o_orderkey""".stripMargin,
    "q3_join_enrich" ->
      """SELECT r_name, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_left_join_default" ->
      """SELECT c_custkey,
        | COALESCE(cnt, 0) AS n_orders,
        | COALESCE(CAST(tot AS DOUBLE), 0.0) AS total_spend
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS cnt,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
        |  FROM orders GROUP BY 1) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q5_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q6_union_split" ->
      """SELECT split, COUNT(*) AS n,
        | CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT *, 'base' AS split FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT *, 'advanced' AS split FROM orders WHERE o_orderpriority <> '1-URGENT'
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_percentiles" ->
      """SELECT event_type, COUNT(*) AS n,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS mean_v,
        | ROUND(STDDEV_SAMP(value), 4) AS stdev_v,
        | ROUND(QUANTILE_CONT(value, 0.5), 4) AS p50,
        | ROUND(QUANTILE_CONT(value, 0.9), 4) AS p90,
        | ROUND(QUANTILE_CONT(value, 0.95), 4) AS p95,
        | ROUND(QUANTILE_CONT(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_confusion" ->
      """SELECT
        | CAST(SUM(CASE WHEN pred=1 AND actual=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        | CAST(SUM(CASE WHEN pred=1 AND actual=0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        | CAST(SUM(CASE WHEN pred=0 AND actual=1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        | CAST(SUM(CASE WHEN pred=0 AND actual=0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        | COUNT(*) AS total
        |FROM (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS pred,
        |    MAX(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS actual
        |  FROM events GROUP BY 1)""".stripMargin,
    "q9_daily_rollup" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q48_range_join" ->
      """WITH i AS (
        |  SELECT event_id AS ival_id,
        |         ts - INTERVAL 2 MINUTE AS t_start,
        |         ts + INTERVAL 2 MINUTE AS t_end
        |  FROM events WHERE event_id % 100 = 0)
        |SELECT i.ival_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events e JOIN i ON e.ts >= i.t_start AND e.ts <= i.t_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q47_skew_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) AS type_len
        |  FROM events)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  MAX(d.type_len) AS type_len
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_pivot" ->
      """SELECT CAST(month(o_orderdate) AS BIGINT) AS mth,
        | CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
        | CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        | CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_cube" ->
      """SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY CUBE(event_type, dayofweek(ts) + 1)
        |ORDER BY event_type ASC NULLS FIRST, dow ASC NULLS FIRST""".stripMargin,
    "q33_window_running" ->
      """SELECT user_id, event_id,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
        |   (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_v,
        | COALESCE(event_id - LAG(event_id, 1) OVER
        |   (PARTITION BY user_id ORDER BY event_id), -1) AS gap,
        | CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS INT) AS rn
        |FROM events WHERE user_id < 10 ORDER BY user_id, event_id""".stripMargin,
    "q35_asof_join" ->
      """SELECT c.event_id, c.user_id,
        | COALESCE(ROUND(e.value, 2), -1.0) AS last_error_value
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type='click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type='error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin,
    "q34_vocab_stats" ->
      """SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
        |FROM (SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |      FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
