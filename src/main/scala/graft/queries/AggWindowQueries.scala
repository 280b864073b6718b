package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked queries for aggregations, set operations, sorts,
  * limits and index materialization (SURVEY §2.4 A2/A5/A7/A8,
  * §2.5 W1/W2/W5, §2.6).
  */
object AggWindowQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2 distinct column (custom_search_extraction.py:162,170)
    "a02_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))),

    // A5 count over predicate (get_similarity.py:154)
    "a05_count_predicate" -> ((s, dir) =>
      t(s, dir, "lineitem").filter(col("l_quantity") > 30.0)
        .agg(count(lit(1)).as("n"))),

    // A7 symmetric set difference (custom_search_extraction.py:44-47):
    // customers-with-orders vs all customers
    "a07_symmetric_diff" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
        .distinct()
      val b = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .distinct()
      a.except(b).union(b.except(a)).orderBy(col("custkey"))
    }),

    // A8 seeded sample + head-k (custom_search_extraction.py:32,187-189):
    // deterministic "shuffle" by md5 of the key so the oracle reproduces
    // the same 100-row sample
    "a08_seeded_sample" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(md5(col("o_orderkey").cast("string").cast("binary")))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // W1 multi-key sort — output order IS the result
    // (assos_..._to_spreadsheets.py:87)
    "w01_multikey_sort" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))),

    // A9 exact discrete percentiles per group (ANSI percentile_disc:
    // smallest value whose cumulative distribution >= p). Picking an
    // element — not interpolating — keeps the result bit-exact across
    // engines; distributed as a sort-based aggregate, no driver state.
    "a09_percentiles" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("graft_a09_events")
      s.sql("""SELECT event_type,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
        percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
        FROM graft_a09_events GROUP BY event_type ORDER BY event_type""")
    }),

    // Quantiles from a DETERMINISTIC 1/64 hash sample (md5 of the row
    // key < '04'/256) — the 100 TB estimation path: reproducible
    // across engines and runs (unlike TABLESAMPLE), order-free, and
    // percentile_disc picks an ELEMENT so even the estimate is
    // bit-exact. The exact quantiles ride along as the gate-scale
    // error demonstrator; a production run computes only the sample
    // side (1/64 of the scan feeding the sort-based aggregate).
    "a10_sampled_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("graft_a10_li")
      s.sql("""WITH s AS (SELECT l_returnflag, l_extendedprice
          FROM graft_a10_li
          WHERE substring(md5(CAST(CAST(l_orderkey AS STRING) || '-' ||
            CAST(l_linenumber AS STRING) AS BINARY)), 1, 2) < '04'),
        ags AS (SELECT l_returnflag, COUNT(*) AS n_sampled,
            percentile_disc(0.5) WITHIN GROUP
              (ORDER BY l_extendedprice) AS p50_est,
            percentile_disc(0.95) WITHIN GROUP
              (ORDER BY l_extendedprice) AS p95_est
          FROM s GROUP BY l_returnflag),
        age AS (SELECT l_returnflag,
            percentile_disc(0.5) WITHIN GROUP
              (ORDER BY l_extendedprice) AS p50_exact,
            percentile_disc(0.95) WITHIN GROUP
              (ORDER BY l_extendedprice) AS p95_exact
          FROM graft_a10_li GROUP BY l_returnflag)
        SELECT ags.l_returnflag, n_sampled, p50_est, p95_est,
          p50_exact, p95_exact
        FROM ags JOIN age ON ags.l_returnflag = age.l_returnflag
        ORDER BY ags.l_returnflag""")
    }),

    // W6 sliding-frame window aggregate: per-user rolling sum/count of
    // the last 4 events (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW).
    // Sums ride floor(x*100+0.5) integer cents — sliding-window sums
    // are subtract-on-slide optimized in some engines, so a double sum
    // would accumulate different rounding on each side.
    "w06_rolling_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-3, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          (sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
            .over(w).cast("double") / 100.0).as("roll_sum"),
          count(lit(1)).over(w).as("roll_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // A11 pivot (the pandas pivot_table shape): events reshaped to one
    // row per day with one count column per event type — Spark's
    // native pivot with the value set PINNED (an unpinned pivot scans
    // once to discover values; pinning is both the determinism and the
    // scale answer — one pass, map-side partial aggregation, missing
    // cells NULL). The oracle replays it as conditional aggregation.
    "a11_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .orderBy(col("d"))),

    // A12 unpivot/melt — the inverse reshape: the pivoted wide frame
    // back to (d, event_type, n) rows via Spark's native unpivot, NULL
    // cells dropped (pandas melt + dropna). Round-tripping through
    // pivot proves the two reshapes compose; the oracle is the direct
    // long-form aggregation the round trip must land on.
    "a12_unpivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .unpivot(Array(col("d")), types.map(col).toArray,
          "event_type", "n")
        .filter(col("n").isNotNull)
        .orderBy(col("d"), col("event_type"))
    }),

    // A13 rollup: subtotals at every prefix level (status+priority,
    // status, grand total) in ONE pass — grouping_id disambiguates a
    // rolled-up NULL from a data NULL. Sums ride integer cents; NULLS
    // FIRST pinned explicitly on both engines (their defaults differ).
    "a13_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
            .cast("long")).cast("double") / 100.0).as("total"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // W7 grouped top-k (k>1): each customer's 3 highest-value orders
    // with their per-group rank — the general form of w04's top-1
    // (one rank window per key partition, integer tie-break, no
    // global sort). At scale the window shuffles once on the group
    // key and the rank cut happens before any downstream join.
    "w07_grouped_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // W2 limit / head-k (custom_search_extraction.py:189-190)
    "w02_limit_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // W5 index materialization (reset_index,
    // assos_..._to_spreadsheets.py:86). A global row index needs a total
    // order; at 100 TB prefer zipWithIndex on a sorted partitioning —
    // here the windowed form matches the reference's small sink frames.
    "w05_index" -> ((s, dir) =>
      t(s, dir, "customer")
        .withColumn("idx",
          row_number().over(Window.orderBy(col("c_name"))) - 1)
        .select(col("idx"), col("c_custkey"), col("c_name"))
        .orderBy(col("idx")))
  )

  val oracle: Map[String, String] = Map(
    "a02_distinct" ->
      """SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment""",
    "a05_count_predicate" ->
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 30.0",
    "a07_symmetric_diff" ->
      """(SELECT DISTINCT o_custkey AS custkey FROM orders
          EXCEPT SELECT DISTINCT c_custkey AS custkey FROM customer)
         UNION
         (SELECT DISTINCT c_custkey AS custkey FROM customer
          EXCEPT SELECT DISTINCT o_custkey AS custkey FROM orders)
         ORDER BY custkey""",
    "a08_seeded_sample" ->
      """SELECT o_orderkey, o_totalprice FROM (
           SELECT * FROM orders
           ORDER BY md5(CAST(o_orderkey AS VARCHAR)) LIMIT 100)
         ORDER BY o_orderkey""",
    "a09_percentiles" ->
      """SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
         FROM events GROUP BY event_type ORDER BY event_type""",
    "a10_sampled_percentiles" ->
      """WITH s AS (SELECT l_returnflag, l_extendedprice FROM lineitem
           WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
             CAST(l_linenumber AS VARCHAR)), 1, 2) < '04'),
         ags AS (SELECT l_returnflag, COUNT(*) AS n_sampled,
             percentile_disc(0.5) WITHIN GROUP
               (ORDER BY l_extendedprice) AS p50_est,
             percentile_disc(0.95) WITHIN GROUP
               (ORDER BY l_extendedprice) AS p95_est
           FROM s GROUP BY l_returnflag),
         age AS (SELECT l_returnflag,
             percentile_disc(0.5) WITHIN GROUP
               (ORDER BY l_extendedprice) AS p50_exact,
             percentile_disc(0.95) WITHIN GROUP
               (ORDER BY l_extendedprice) AS p95_exact
           FROM lineitem GROUP BY l_returnflag)
         SELECT ags.l_returnflag, n_sampled, p50_est, p95_est,
           p50_exact, p95_exact
         FROM ags JOIN age ON ags.l_returnflag = age.l_returnflag
         ORDER BY ags.l_returnflag""",
    "w06_rolling_sum" ->
      """SELECT user_id, event_id, ts::TIMESTAMP AS ts,
         CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) OVER w
           AS DOUBLE) / CAST(100.0 AS DOUBLE) AS roll_sum,
         COUNT(*) OVER w AS roll_n
         FROM events
         WINDOW w AS (PARTITION BY user_id
           ORDER BY ts::TIMESTAMP ASC, event_id ASC
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "w01_multikey_sort" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         ORDER BY o_orderdate ASC, o_orderkey ASC""",
    "w07_grouped_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "a11_pivot" ->
      """SELECT ts::DATE AS d,
         SUM(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         SUM(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         SUM(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         SUM(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY d ORDER BY d""",
    "a12_unpivot" ->
      """SELECT ts::DATE AS d, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY d, event_type ORDER BY d, event_type""",
    "a13_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
           AS DOUBLE) / CAST(100.0 AS DOUBLE) AS total,
         CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY gid, o_orderstatus NULLS FIRST,
           o_orderpriority NULLS FIRST""",
    "w02_limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "w05_index" ->
      """SELECT CAST(row_number() OVER (ORDER BY c_name) - 1 AS INT) AS idx,
                c_custkey, c_name
         FROM customer ORDER BY idx"""
  )
}
