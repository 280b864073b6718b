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
    "w01_multikey_sort" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         ORDER BY o_orderdate ASC, o_orderkey ASC""",
    "w02_limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "w05_index" ->
      """SELECT CAST(row_number() OVER (ORDER BY c_name) - 1 AS INT) AS idx,
                c_custkey, c_name
         FROM customer ORDER BY idx"""
  )
}
