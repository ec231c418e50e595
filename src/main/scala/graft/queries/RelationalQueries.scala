package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational skeleton of the reference's operator inventory (SURVEY.md §2),
  * expressed over the driver's TPC-H-ish tables so every operator is
  * DuckDB-oracle checkable.
  *
  * Determinism notes (the driver hash-compares Spark vs DuckDB values):
  *  - Sums of k-decimal doubles are rounded back to their exact decimal
  *    grid (`round(sum(x), k)`): the true sum is a multiple of 10^-k and
  *    the accumulated IEEE error (~1e-9 at 60k rows) never reaches the
  *    rounding boundary, so any summation order yields the same output.
  *  - Running/cumulative sums use integer cents so window frames are exact.
  *  - Timestamps are projected as DATE or epoch seconds/micros (every
  *    timestamp column is microsecond-precision parquet; both engines
  *    read it exactly, and the session timezone is pinned to UTC).
  */
object RelationalQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1: grouped main-table scan — one group per partition key tuple.
    // Reference: xova/apps/xova/app.py:162-178 (GROUP_COLS grouping).
    "s1_scan_grouped" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"))),

    // S2: column-pruned pre-scan computing planning stats.
    // Reference: xova/apps/xova/app.py:162-165 (TIME/INTERVAL/UVW prescan).
    "s2_column_pruned_stats" -> ((s, d) =>
      lineitem(s, d)
        .select("l_quantity", "l_extendedprice")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))),

    // S5: TAQL-style filtered scan (ANTENNA1 != ANTENNA2 autocorrelation
    // removal). Reference: xova/apps/xova/arguments.py:219-220.
    "s5_filtered_scan" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_suppkey") =!= col("l_partkey") % 100)
        .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))),

    // S6: computed-column scan (SHAPE(DATA) analog).
    // Reference: xova/apps/xova/check.py:25-26.
    "s6_computed_column" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderkey") % 997 === 0)
        .select(
          col("o_orderkey"),
          length(col("o_orderpriority")).as("pri_len"),
          to_date(col("o_orderdate")).as("order_date"))),

    // P2/P3: partition selection by key list (--fields / --scan-numbers).
    // Reference: xova/apps/xova/averaging.py:218-222.
    "p2_isin_selection" -> ((s, d) =>
      nation(s, d)
        .filter(col("n_regionkey").isin(0, 2))
        .select("n_nationkey", "n_name", "n_regionkey")),

    // P6: constant-ID projection (ARRAY_ID/OBSERVATION_ID/... = 0).
    // Reference: xova/apps/xova/utils.py:7-14.
    "p6_const_projection" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderkey") <= 200)
        .select(
          col("o_orderkey"),
          lit(0).cast("int").as("array_id"),
          lit(0).cast("int").as("observation_id"),
          col("o_orderstatus"))),

    // A1-shape: time-bin grouped aggregation (uniform time averaging:
    // TIME=mean, INTERVAL=sum, per 2h bin per user).
    // Reference: xova/apps/xova/averaging.py:251-255.
    // (ts is parquet timestamp[us]; unix_micros of the UTC-pinned cast
    // recovers exact integer micros, and integer `div` truncates toward
    // zero, matching the oracle's floor only for nonnegative epochs;
    // the events table is post-1970 by construction.)
    "a1_time_bin_agg" -> ((s, d) =>
      events(s, d)
        .withColumn("tu", graft.ops.EventOps.epochUs(col("ts")))
        .withColumn("bin", expr("tu div 7200000000"))
        .groupBy("user_id", "bin")
        .agg(
          count(lit(1)).as("n_samples"),
          round(sum(col("value")), 2).as("sum_value"),
          min(col("event_id")).as("first_event"))),

    // A5: SELECT DISTINCT as a tree aggregation.
    // Reference: xova/apps/xova/averaging.py:409-433.
    "a5_distinct" -> ((s, d) =>
      lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()),

    // A7: chunk-planning stats — per unique time: row count + interval sum.
    // Reference: xova/apps/xova/chunking.py:13-65.
    "a7_chunk_stats" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("ship_date"))
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("n_rows") >= 40)),

    // F2 + sort/limit: argmax row by squared norm, deterministic tiebreak.
    // Reference: xova/apps/xova/chunking.py:21-26 (max-|uvw| row).
    "f2_argmax_row" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * col("l_extendedprice") + col("l_quantity") * col("l_quantity"), 4).as("norm2"))
        .orderBy(desc("norm2"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(1)),

    // F1: baseline_index quadratic pairing function (pure int arithmetic).
    // Reference: xova/apps/xova/fixvis.py:39-71.
    "f1_baseline_index" -> ((s, d) => {
      val na = lit(26L)
      val sup = supplier(s, d)
      val a1 = col("s_suppkey") % 26L
      val a2 = col("s_nationkey").cast("bigint")
      val lo = least(a1, a2)
      sup.select(
        col("s_suppkey"),
        (lo * (-lo + lit(2L) * na + lit(1L)) / lit(2L) + abs(a1 - a2))
          .cast("bigint").as("baseline_id"))
    }),

    // J1: FK lookup-join chain main ⋈ dim ⋈ dim. orders/customer scale
    // with SF, so no forced broadcast — AQE picks the join strategy
    // (broadcast at test scale, shuffle-hash/sort-merge at 100 TB).
    // Reference: xova/apps/xova/averaging.py:306-308.
    "j1_lookup_join" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))),

    // J2: two-key equi join (DDID remap analog).
    // Reference: xova/apps/xova/averaging.py:545-547,693-698.
    "j2_twokey_join" -> ((s, d) => {
      val li = lineitem(s, d)
      val dim = li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("combo_rows"))
      li.join(broadcast(dim), Seq("l_returnflag", "l_linestatus"))
        .groupBy("l_returnflag", "l_linestatus", "combo_rows")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    // J4: skew-mitigated salted join — fact (events) ⋈ dim (customer)
    // on a key whose histogram is heavy-tailed at scale. The salt
    // spreads each hot key over 8 shuffle partitions; the result is
    // bit-identical to the plain inner join, which is what the oracle
    // asserts. See graft.ops.SaltedJoin for the plan rationale.
    "j4_salted_join" -> ((s, d) =>
      graft.ops.SaltedJoin.join(
        events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        customer(s, d).select(
          col("c_custkey"), col("c_name"), col("c_nationkey")),
        "user_id", "c_custkey", col("event_id"), salts = 8)
        .select("event_id", "user_id", "event_type", "cents",
          "c_name", "c_nationkey")),

    // J5: co-located join via bucketed table layout — pay the shuffle
    // once at write time, then the fact ⋈ dim join on the bucket key
    // plans with no exchange on either side (PlanShapeSpec asserts the
    // shuffle-free plan; this entry asserts the RESULT is identical to
    // the plain join over raw parquet). The standing answer at 100 TB
    // to "every downstream query joins this table on the same key".
    "j5_bucketed_join" -> ((s, d) => {
      // per-process path: a concurrent Verify/Bench JVM must not
      // clobber this one's bucket files mid-scan (table names are
      // safe as-is — the in-memory catalog is per-JVM)
      val root = s"/tmp/graft_bucketed_${ProcessHandle.current().pid()}"
      graft.ops.BucketedLayout.writeBucketed(
        events(s, d).select(col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        "graft_ev_bucketed", "user_id", 16, s"$root/ev")
      graft.ops.BucketedLayout.writeBucketed(
        customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        "graft_cust_bucketed", "c_custkey", 16, s"$root/cust")
      graft.ops.BucketedLayout.coLocatedJoin(s,
          "graft_ev_bucketed", "graft_cust_bucketed",
          "user_id", "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
    }),

    // J3-shape: anti-join conformance count (rows violating an FK).
    // Reference: xova/apps/xova/check.py:38-52.
    "j3_anti_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers_without_orders"))),

    // W1: monotonicity / gap check via lag window.
    // Reference: xova/apps/xova/chunking.py:267,287-289.
    "w1_lag_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        // second-TRUNCATED difference (div before subtract), matching
        // the oracle's date_trunc('second') — raw-micros differencing
        // diverges on sub-second alignment
        .withColumn("_tu", graft.ops.EventOps.epochUs(col("ts")))
        .withColumn("_ptu", graft.ops.EventOps.epochUs(col("prev_ts")))
        .filter(col("prev_ts").isNotNull &&
          (expr("_tu div 1000000") - expr("_ptu div 1000000")) > 3600L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"))
    }),

    // W2: running-sum time-bin assignment (accumulate INTERVAL until the
    // bin is full). Integer cents keep the running sum exact; the bin is
    // integer division of the running Long (Spark `div` and DuckDB `//`
    // both truncate toward zero), exact at any scale — no double rounding.
    // Reference: xova/apps/xova/chunking.py:107-166.
    "w2_running_bin" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("bigint"))
        .withColumn("run", sum(col("cents")).over(w))
        .withColumn("bin", expr("run div 100000"))
        .groupBy("user_id", "bin")
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
    })
  )

  // Column-name parity with the Spark side is load-bearing: the driver
  // sorts columns by name before hashing.
  val oracleSql: Map[String, String] = Map(
    "s1_scan_grouped" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2""",
    "s2_column_pruned_stats" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty,
                min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
         FROM lineitem""",
    "s5_filtered_scan" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem WHERE l_suppkey <> l_partkey % 100""",
    "s6_computed_column" ->
      """SELECT o_orderkey, length(o_orderpriority) AS pri_len,
                CAST(o_orderdate AS DATE) AS order_date
         FROM orders WHERE o_orderkey % 997 = 0""",
    "p2_isin_selection" ->
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation WHERE n_regionkey IN (0, 2)""",
    "p6_const_projection" ->
      """SELECT o_orderkey, CAST(0 AS INTEGER) AS array_id,
                CAST(0 AS INTEGER) AS observation_id, o_orderstatus
         FROM orders WHERE o_orderkey <= 200""",
    "a1_time_bin_agg" ->
      """SELECT user_id, CAST(floor(epoch(date_trunc('second', ts)) / 7200) AS BIGINT) AS bin,
                count(*) AS n_samples, round(sum(value), 2) AS sum_value,
                min(event_id) AS first_event
         FROM events GROUP BY 1, 2""",
    "a5_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "a7_chunk_stats" ->
      """SELECT CAST(l_shipdate AS DATE) AS ship_date, count(*) AS n_rows,
                round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY 1 HAVING count(*) >= 40""",
    "f2_argmax_row" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice * l_extendedprice + l_quantity * l_quantity, 4) AS norm2
         FROM lineitem ORDER BY norm2 DESC, l_orderkey, l_linenumber LIMIT 1""",
    "f1_baseline_index" ->
      """SELECT s_suppkey,
                CAST(least(s_suppkey % 26, CAST(s_nationkey AS BIGINT))
                     * (-least(s_suppkey % 26, CAST(s_nationkey AS BIGINT)) + 2 * 26 + 1) / 2
                     + abs(s_suppkey % 26 - CAST(s_nationkey AS BIGINT)) AS BIGINT) AS baseline_id
         FROM supplier""",
    "j1_lookup_join" ->
      """SELECT c_mktsegment, count(*) AS n_rows,
                round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY 1""",
    "j2_twokey_join" ->
      """SELECT l.l_returnflag, l.l_linestatus, dim.combo_rows,
                round(sum(l.l_quantity), 2) AS sum_qty
         FROM lineitem l
         JOIN (SELECT l_returnflag, l_linestatus, count(*) AS combo_rows
               FROM lineitem GROUP BY 1, 2) dim
           ON l.l_returnflag = dim.l_returnflag AND l.l_linestatus = dim.l_linestatus
         GROUP BY 1, 2, 3""",
    // The UNSALTED join: salting must be invisible in the result.
    "j4_salted_join" ->
      """SELECT event_id, user_id, event_type,
                CAST(round(value * 100) AS BIGINT) AS cents,
                c_name, c_nationkey
         FROM events JOIN customer ON user_id = c_custkey""",
    // The layout must be invisible in the result: plain join + agg.
    "j5_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1""",
    "j3_anti_join" ->
      """SELECT count(*) AS n_customers_without_orders
         FROM customer WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "w1_lag_gaps" ->
      """SELECT user_id, count(*) AS n_gaps FROM (
           SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events) t
         WHERE prev_ts IS NOT NULL
           AND epoch(date_trunc('second', ts)) - epoch(date_trunc('second', prev_ts)) > 3600
         GROUP BY 1""",
    "w2_running_bin" ->
      """SELECT user_id, bin, count(*) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents FROM (
           SELECT user_id,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) // 100000 AS BIGINT) AS bin
           FROM events) t
         GROUP BY 1, 2"""
  )
}
