package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup
import graft.queries.{AggWindowQueries, CondQueries, ConnectorQueries,
  DateQueries, EventQueries, FilterQueries, IoQueries, JoinQueries,
  LlmQueries, StringQueries}
import graft.sim.Fuzzy

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` on the same
  * parquet tables (column names aligned on both sides).
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    base ++ StringQueries.queries ++ DateQueries.queries ++
      CondQueries.queries ++ FilterQueries.queries ++
      JoinQueries.queries ++ AggWindowQueries.queries ++
      LlmQueries.queries ++ EventQueries.queries ++ IoQueries.queries ++
      ConnectorQueries.queries

  def oracleSql: Map[String, String] =
    baseOracle ++ StringQueries.oracle ++ DateQueries.oracle ++
      CondQueries.oracle ++ FilterQueries.oracle ++
      JoinQueries.oracle ++ AggWindowQueries.oracle ++
      LlmQueries.oracle ++ EventQueries.oracle ++ IoQueries.oracle ++
      ConnectorQueries.oracle

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 group-aggregate (reference wp_export_data.py:39 group-count,
    // generalized to the TPC-H Q1 shape). Sums run over
    // floor(x*scale + 0.5) integer cents: pure IEEE double arithmetic
    // that every engine evaluates bit-identically (the scaled sums are
    // exact integers far below 2^53 at gate scale), and the result is
    // emitted as DOUBLE — decimal renderings differ across engines even
    // when values agree, so gate outputs stay in binary floating point.
    "q01_pricing_summary" -> ((s, dir) => {
      def cents(c: Column, scale: Double): Column =
        floor(c * lit(scale) + lit(0.5)).cast("long")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(cents(col("l_quantity"), 100.0)).cast("double") / 100.0)
            .as("sum_qty"),
          (sum(cents(col("l_extendedprice"), 100.0)).cast("double") / 100.0)
            .as("sum_base_price"),
          (sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
                     10000.0)).cast("double") / 10000.0)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // S5 table scan (SELECT * FROM t; get_associations_raw_data.sql:1-2).
    "s05_table_scan" -> ((s, dir) =>
      t(s, dir, "region").orderBy(col("r_regionkey"))),

    // S6 parameterized scan: projection + rename + predicate
    // (sql/get_products_id.sql:1-3 via update_open_data.py:59-61).
    "s06_param_scan" -> ((s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderstatus") === lit("O"))
        .select(col("o_orderkey").as("key"),
                col("o_totalprice").as("price"),
                col("o_orderpriority").as("priority"))
        .orderBy(col("key"))),

    // S6 via the SQL-template path: the same parameterized scan executed
    // from a template file with {0} substitution and warehouse-id
    // translation (sql/get_products_id.sql:1-3 + update_open_data.py:
    // 59-61) — must be byte-identical to s06_param_scan's DataFrame form.
    "s06_template_scan" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft_s06t_").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stage/get_open_orders.sql"),
        """SELECT o_orderkey AS key, o_totalprice AS price, o_orderpriority AS priority
          |FROM `graft.main.orders`
          |WHERE o_orderstatus = '{0}'""".stripMargin.getBytes("UTF-8"))
      graft.sql.SqlTemplates.registerTable(s, "orders",
        t(s, dir, "orders"))
      graft.sql.SqlTemplates
        .runFile(s, s"$stage/get_open_orders.sql", "O")
        .orderBy(col("key"))
    }),

    // S6 verbatim-corpus gate: the reference's own template asset
    // (sql/get_rna_waldec_filtered_data.sql:1-3) runs UNMODIFIED — read,
    // translated (three-part id → view name) and executed over a view
    // carrying the column surface it expects; the oracle replicates the
    // view derivation + filter in plain SQL. The template resolves from
    // the reference checkout when present (GRAFT_REFERENCE_ROOT), else
    // from the vendored byte-identical fixture, so the gate runs on any
    // machine.
    "s10_template_verbatim" -> ((s, dir) => {
      graft.sql.SqlTemplates.registerTable(s, "rna_waldec_filtered",
        t(s, dir, "customer").withColumn("filtered_cat",
          when(col("c_mktsegment") === "BUILDING", "yes").otherwise("no")))
      graft.sql.SqlTemplates
        .runReferenceTemplate(s, "get_rna_waldec_filtered_data.sql")
        .orderBy(col("c_custkey"))
    }),

    // F3 regex contains + negated contains with na=false semantics
    // (custom_search_extraction.py:101; assos_..._to_spreadsheets.py:88).
    "f03_regex_filter" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(coalesce(col("p_type").rlike("^ECO"), lit(false)) &&
                !coalesce(col("p_name").rlike("green|red"), lit(false)))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))),

    // J1 broadcast left-outer lookup join (custom_search_extraction.py:96-97).
    "j01_broadcast_lookup" -> ((s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")),
              col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))),

    // A3 order-dependent dedup keep-last, made explicit
    // (assos_validation_retreatment.py:106; SURVEY §7.4(1)).
    "a03_dedup_keep_last" -> ((s, dir) =>
      Dedup.dedupKeepLast(t(s, dir, "orders"), Seq("o_custkey"),
                          col("o_orderdate"), col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"))
        .orderBy(col("o_custkey"))),

    // W4 top-1 per key window (the J5/A3 pattern; SURVEY §2.5).
    "w04_top1_per_key" -> ((s, dir) =>
      Dedup.dedupKeepLast(t(s, dir, "orders"), Seq("o_custkey"),
                          col("o_totalprice"), col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
                col("o_totalprice"))
        .orderBy(col("o_custkey"))),

    // J5 fuzzy top-1 similarity join with full left payload, banded +
    // thresholded at 60 (get_similarity.py:148-154: best match attached
    // to full rows, score>60 = candidate; below-threshold rows keep a
    // null match, which downstream banding maps to no_fb_account).
    "j05_fuzzy_top1" -> ((s, dir) =>
      Fuzzy.fuzzyTop1JoinBanded(t(s, dir, "customer"), "c_name",
                                t(s, dir, "supplier"), "s_name", 60)
        .select(col("c_custkey"), col("c_name"), col("s_name"),
                col("similarity"))
        .orderBy(col("c_name")))
  )

  private def baseOracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "s05_table_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "s06_param_scan" ->
      """SELECT o_orderkey AS key, o_totalprice AS price,
         o_orderpriority AS priority
         FROM orders WHERE o_orderstatus = 'O' ORDER BY key""",
    "s06_template_scan" ->
      """SELECT o_orderkey AS key, o_totalprice AS price,
         o_orderpriority AS priority
         FROM orders WHERE o_orderstatus = 'O' ORDER BY key""",
    "s10_template_verbatim" ->
      """SELECT *, 'yes' AS filtered_cat FROM customer
         WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""",
    "f03_regex_filter" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE COALESCE(regexp_matches(p_type, '^ECO'), false)
           AND NOT COALESCE(regexp_matches(p_name, 'green|red'), false)
         ORDER BY p_partkey""",
    "j01_broadcast_lookup" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
         LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey""",
    "a03_dedup_keep_last" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "w04_top1_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "j05_fuzzy_top1" ->
      """WITH l AS (SELECT DISTINCT c_name FROM customer),
              r AS (SELECT DISTINCT s_name FROM supplier),
              scored AS (
                SELECT c_name, s_name,
                  CASE WHEN GREATEST(LENGTH(c_name), LENGTH(s_name)) = 0 THEN 100
                       ELSE CAST(FLOOR(100.0 *
                           (GREATEST(LENGTH(c_name), LENGTH(s_name))
                            - levenshtein(c_name, s_name))
                           / GREATEST(LENGTH(c_name), LENGTH(s_name))) AS INT)
                  END AS similarity
                FROM l CROSS JOIN r),
              best AS (
                SELECT c_name, s_name, similarity FROM (
                  SELECT *, row_number() OVER (PARTITION BY c_name
                    ORDER BY similarity DESC, s_name DESC) AS rn
                  FROM scored WHERE similarity >= 60)
                WHERE rn = 1)
         SELECT c.c_custkey, c.c_name, b.s_name, b.similarity
         FROM customer c LEFT JOIN best b USING (c_name)
         ORDER BY c.c_name"""
  )
}
