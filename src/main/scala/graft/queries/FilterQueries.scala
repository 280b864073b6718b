package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.CondOps

/** Oracle-checked queries for filters and projections (SURVEY §2.2
  * F1-F9, P1-P3; P4 lives with the string family).
  */
object FilterQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 not-null filter (process_open_data.py:46) — nulls synthesized
    // with nullif since the testdata has none
    "f01_notnull" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(nullif(col("o_orderpriority"), lit("3-MEDIUM")).isNotNull)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))),

    // F2 comparison predicates (process_open_data.py:91; wp_export:38)
    "f02_comparison" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_totalprice") >= 100000.0 &&
                col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // F4 set-membership / semi-join (process_open_data.py:262;
    // assos_..._to_spreadsheets.py:57)
    "f04_semi_membership" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "supplier").select(col("s_nationkey")),
              col("c_nationkey") === col("s_nationkey"), "left_semi")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // F5 anti-membership / anti-join (assos_..._to_spreadsheets.py:68-69)
    "f05_anti_membership" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // F6 disjunctive filter (assos_validation_retreatment.py:70)
    "f06_disjunctive" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" ||
                col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // F7 inequality filter (assos_..._to_spreadsheets.py:73)
    "f07_inequality" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") =!= "O" &&
                col("o_orderpriority") =!= "5-LOW")
        .select(col("o_orderkey"), col("o_orderstatus"),
                col("o_orderpriority"))
        .orderBy(col("o_orderkey"))),

    // F8 limit(0) kill-switch — intentional live behavior
    // (process_open_data.py:268)
    "f08_limit0" -> ((s, dir) =>
      t(s, dir, "orders").limit(0)
        .select(col("o_orderkey"), col("o_orderstatus"))),

    // F9 row-mask conditional filter (update_open_data.py:80,88)
    "f09_row_mask" -> ((s, dir) =>
      t(s, dir, "customer")
        .withColumn("flag", CondOps.flagYesNo(col("c_acctbal") < 0))
        .filter(col("flag") === "no")
        .select(col("c_custkey"), col("c_acctbal"), col("flag"))
        .orderBy(col("c_custkey"))),

    // P1 column projection / reorder (custom_search_extraction.py:201-202)
    "p01_projection" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_type"), col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))),

    // P2 drop column (custom_search_extraction.py:158)
    "p02_drop" -> ((s, dir) =>
      t(s, dir, "nation").drop("n_regionkey")
        .orderBy(col("n_nationkey"))),

    // P3 rename (process_open_data.py:73)
    "p03_rename" -> ((s, dir) =>
      t(s, dir, "supplier")
        .withColumnRenamed("s_name", "supplier_name")
        .withColumnRenamed("s_acctbal", "balance")
        .select(col("s_suppkey"), col("supplier_name"), col("balance"))
        .orderBy(col("s_suppkey")))
  )

  val oracle: Map[String, String] = Map(
    "f01_notnull" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
         WHERE NULLIF(o_orderpriority, '3-MEDIUM') IS NOT NULL
         ORDER BY o_orderkey""",
    "f02_comparison" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice >= 100000.0 AND o_orderstatus = 'O'
         ORDER BY o_orderkey""",
    "f04_semi_membership" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
           AND c_mktsegment IN ('BUILDING', 'MACHINERY')
         ORDER BY c_custkey""",
    "f05_anti_membership" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "f06_disjunctive" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' OR o_totalprice > 200000.0
         ORDER BY o_orderkey""",
    "f07_inequality" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
         WHERE o_orderstatus <> 'O' AND o_orderpriority <> '5-LOW'
         ORDER BY o_orderkey""",
    "f08_limit0" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE FALSE",
    "f09_row_mask" ->
      """WITH b AS (SELECT c_custkey, c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'yes' ELSE 'no' END AS flag
           FROM customer)
         SELECT c_custkey, c_acctbal, flag FROM b
         WHERE flag = 'no' ORDER BY c_custkey""",
    "p01_projection" ->
      "SELECT p_type, p_partkey, p_name FROM part ORDER BY p_partkey",
    "p02_drop" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    "p03_rename" ->
      """SELECT s_suppkey, s_name AS supplier_name, s_acctbal AS balance
         FROM supplier ORDER BY s_suppkey"""
  )
}
