package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.CondOps

/** Oracle-checked queries for the conditional/mapping family (SURVEY §2.7
  * C1-C7). The arrondissement-map oracle CASE is generated from the same
  * Scala map the Spark expression uses.
  */
object CondQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1 masked yes/no flag (process_open_data.py:184-186)
    "c01_flag_yes_no" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          CondOps.flagYesNo(col("o_orderstatus") === "O").as("flag"))
        .orderBy(col("o_orderkey"))),

    // C2 3-way banding, ==100 checked before >=70 (get_similarity.py:185-188)
    "c02_score_banding" -> ((s, dir) => {
      val score = floor(abs(col("c_acctbal"))).cast("int") % 101
      t(s, dir, "customer").select(col("c_custkey"), score.as("score"),
          CondOps.band3(score, "fb_account", "potential_fb_account",
                        "no_fb_account").as("band"))
        .orderBy(col("c_custkey"))
    }),

    // C3 np.where ternary (get_similarity.py:125)
    "c03_ternary" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          when(col("o_orderstatus") === "F",
               concat(lit("archived:"), col("o_orderpriority")))
            .otherwise(concat(lit("live:"), col("o_orderpriority")))
            .as("link"))
        .orderBy(col("o_orderkey"))),

    // C4 dict map lookup, unmapped → null (process_open_data.py:102-125)
    "c04_map_lookup" -> ((s, dir) => {
      val code = col("c_nationkey") + lit(75001)
      t(s, dir, "customer").select(col("c_custkey"), code.as("code"),
          CondOps.mapLookup(CondOps.arrondissementMap, code)
            .as("arrondissement"))
        .orderBy(col("c_custkey"))
    }),

    // C5 null-coalesce / fill (update_assos_validation_retreatment.py:105;
    // wp_export_data.py:33,46)
    "c05_coalesce_fill" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_filled"),
          coalesce(nullif(col("o_orderpriority"), lit("5-LOW")), lit("NONE"))
            .as("prio_filled"))
        .orderBy(col("o_orderkey"))),

    // C6 cast (custom_search_extraction.py:205-207, update_open_data.py:62).
    // Half-up rounding to 2 places is done explicitly via
    // floor(x*100+0.5)/100 (IEEE-exact in every engine) and emitted as
    // DOUBLE — decimal renderings differ across engines even when
    // values agree, so gate outputs stay in binary floating point.
    "c06_cast" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          (floor(col("o_totalprice") * lit(100.0) + lit(0.5)) / lit(100.0))
            .cast("double").as("price_dec"),
          col("o_custkey").cast("double").as("cust_dbl"))
        .orderBy(col("o_orderkey"))),

    // C7 literal columns (custom_search_extraction.py:193,
    // assos_..._to_spreadsheets.py:81-84)
    "c07_literal" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          lit("wopen").as("src"), lit(1).as("one"),
          to_date(lit("2026-01-01")).as("asof"))
        .orderBy(col("o_orderkey")))
  )

  private val arrCaseSql: String =
    "CASE c_nationkey + 75001 " +
      CondOps.arrondissementMap.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN $k THEN '$v'" }.mkString(" ") +
      " ELSE NULL END"

  val oracle: Map[String, String] = Map(
    "c01_flag_yes_no" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN 'yes' ELSE 'no' END AS flag
         FROM orders ORDER BY o_orderkey""",
    "c02_score_banding" ->
      """WITH b AS (SELECT c_custkey,
           CAST(floor(abs(c_acctbal)) AS INT) % 101 AS score FROM customer)
         SELECT c_custkey, score,
           CASE WHEN score = 100 THEN 'fb_account'
                WHEN score >= 70 THEN 'potential_fb_account'
                ELSE 'no_fb_account' END AS band
         FROM b ORDER BY c_custkey""",
    "c03_ternary" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 'archived:' || o_orderpriority
              ELSE 'live:' || o_orderpriority END AS link
         FROM orders ORDER BY o_orderkey""",
    "c04_map_lookup" ->
      s"""SELECT c_custkey, c_nationkey + 75001 AS code,
          $arrCaseSql AS arrondissement
          FROM customer ORDER BY c_custkey""",
    "c05_coalesce_fill" ->
      """SELECT o_orderkey,
         COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
         COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'NONE') AS prio_filled
         FROM orders ORDER BY o_orderkey""",
    "c06_cast" ->
      """SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS key_str,
         CAST(FLOOR(o_totalprice * 100.0 + 0.5) / 100.0 AS DOUBLE)
           AS price_dec,
         CAST(o_custkey AS DOUBLE) AS cust_dbl
         FROM orders ORDER BY o_orderkey""",
    "c07_literal" ->
      """SELECT o_orderkey, 'wopen' AS src, 1 AS one,
         DATE '2026-01-01' AS asof
         FROM orders ORDER BY o_orderkey"""
  )
}
