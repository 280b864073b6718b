package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.StringOps

/** Oracle-checked queries for the string scalar family (SURVEY §2.7
  * X1-X11). One query per operator; every oracle carries the same
  * deterministic ORDER BY as the Spark side.
  */
object StringQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1 literal replace (process_open_data.py:47 ';'→'_')
    "x01_literal_replace" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
          regexp_replace(col("p_name"), " ", "_").as("slug"))
        .orderBy(col("p_partkey"))),

    // X2 regex replace (get_similarity.py:137-138 digit strip)
    "x02_regex_replace" -> ((s, dir) =>
      t(s, dir, "supplier").select(col("s_suppkey"),
          regexp_replace(col("s_name"), "[0-9]+", "").as("s_base"))
        .orderBy(col("s_suppkey"))),

    // X3 regex extract (get_similarity.py:131 URL last segment)
    "x03_regex_extract" -> ((s, dir) =>
      t(s, dir, "supplier").select(col("s_suppkey"),
          regexp_extract(col("s_name"), "#([0-9]+)", 1).as("s_digits"),
          regexp_extract(col("s_name"), "#([0-9]+)", 1).cast("bigint")
            .as("s_num"))
        .orderBy(col("s_suppkey"))),

    // X4 split → array (process_open_data.py:48). The array itself is
    // covered in OpsSpec; the gate serializes it (the driver's pandas
    // canonicalization cannot sort array cells) and carries its size so
    // the array shape still gates.
    "x04_split_array" -> ((s, dir) => {
      val words = split(col("p_name"), " ")
      t(s, dir, "part").select(col("p_partkey"),
          array_join(words, "|").as("words"),
          size(words).as("n_words"))
        .orderBy(col("p_partkey"))
    }),

    // X5 split → positional columns (process_open_data.py:72-73 lat/lon)
    "x05_split_positional" -> ((s, dir) => {
      val base = concat_ws(",", round(col("c_acctbal"), 2).cast("string"),
                           col("c_nationkey").cast("string"))
      t(s, dir, "customer").select(col("c_custkey"),
          split(base, ",").getItem(0).as("lat"),
          split(base, ",").getItem(1).as("lon"))
        .orderBy(col("c_custkey"))
    }),

    // X6 upper / lower / capitalize / title (get_similarity.py:117,132,139;
    // python capitalize ≠ initcap, SURVEY §2.7 X6)
    "x06_case_functions" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_type")).as("lo"),
          StringOps.capitalizeFirst(col("p_name")).as("cap"),
          initcap(col("p_name")).as("title"))
        .orderBy(col("p_partkey"))),

    // X7 trim (get_similarity.py:133,140)
    "x07_trim" -> ((s, dir) => {
      val padded = concat(lit("  "), col("p_name"), lit("  "))
      t(s, dir, "part").select(col("p_partkey"),
          trim(padded).as("t"), ltrim(padded).as("l"), rtrim(padded).as("r"))
        .orderBy(col("p_partkey"))
    }),

    // X8 substring (process_open_data.py:82-83 str[:10])
    "x08_substring" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
          substring(col("p_name"), 1, 10).as("sub10"),
          substring(col("p_name"), 3, 5).as("sub35"))
        .orderBy(col("p_partkey"))),

    // X9 concat with cast (process_open_data.py:127 combined_address)
    "x09_concat_cast" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
          concat_ws(", ", col("p_name"), col("p_size").cast("string"),
                    col("p_brand")).as("combined"))
        .orderBy(col("p_partkey"))),

    // X10 array join with delimiter (process_open_data.py:65 '|'.join)
    "x10_array_join" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
          array_join(slice(split(col("p_name"), " "), 1, 2), "|")
            .as("joined"))
        .orderBy(col("p_partkey"))),

    // X11/U4 clean_image chain (update_open_data.py:32-47)
    "x11_clean_image" -> ((s, dir) => {
      val img = concat(lit("https://img.example/storage/abc123/"),
                       col("p_brand"), lit("-"),
                       regexp_replace(col("p_name"), " ", "_"),
                       lit(".jpg,backup.png"))
      t(s, dir, "part").select(col("p_partkey"),
          StringOps.cleanImage(img).as("cleaned"))
        .orderBy(col("p_partkey"))
    }),

    // P4 value-level slugify (process_open_data.py:39-43 normalization
    // applied to values; column-name form covered by unit tests)
    "p04_slugify" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          StringOps.slugifyCol(col("o_orderpriority")).as("slug"))
        .orderBy(col("o_orderkey")))
  )

  val oracle: Map[String, String] = Map(
    "x01_literal_replace" ->
      """SELECT p_partkey, replace(p_name, ' ', '_') AS slug
         FROM part ORDER BY p_partkey""",
    "x02_regex_replace" ->
      """SELECT s_suppkey, regexp_replace(s_name, '[0-9]+', '', 'g') AS s_base
         FROM supplier ORDER BY s_suppkey""",
    "x03_regex_extract" ->
      """SELECT s_suppkey, regexp_extract(s_name, '#([0-9]+)', 1) AS s_digits,
         CAST(regexp_extract(s_name, '#([0-9]+)', 1) AS BIGINT) AS s_num
         FROM supplier ORDER BY s_suppkey""",
    "x04_split_array" ->
      """SELECT p_partkey,
         array_to_string(string_split(p_name, ' '), '|') AS words,
         CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
         FROM part ORDER BY p_partkey""",
    "x05_split_positional" ->
      """WITH b AS (SELECT c_custkey,
             CAST(round(c_acctbal, 2) AS VARCHAR) || ',' ||
             CAST(c_nationkey AS VARCHAR) AS base FROM customer)
         SELECT c_custkey, string_split(base, ',')[1] AS lat,
                string_split(base, ',')[2] AS lon
         FROM b ORDER BY c_custkey""",
    "x06_case_functions" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_type) AS lo,
         upper(substring(p_name, 1, 1)) ||
           lower(substring(p_name, 2, length(p_name))) AS cap,
         array_to_string(list_transform(string_split(p_name, ' '),
           w -> upper(substring(w, 1, 1)) ||
                lower(substring(w, 2, length(w)))), ' ') AS title
         FROM part ORDER BY p_partkey""",
    "x07_trim" ->
      """WITH b AS (SELECT p_partkey, '  ' || p_name || '  ' AS padded
                    FROM part)
         SELECT p_partkey, trim(padded) AS t, ltrim(padded) AS l,
                rtrim(padded) AS r
         FROM b ORDER BY p_partkey""",
    "x08_substring" ->
      """SELECT p_partkey, substring(p_name, 1, 10) AS sub10,
                substring(p_name, 3, 5) AS sub35
         FROM part ORDER BY p_partkey""",
    "x09_concat_cast" ->
      """SELECT p_partkey, concat_ws(', ', p_name,
                CAST(p_size AS VARCHAR), p_brand) AS combined
         FROM part ORDER BY p_partkey""",
    "x10_array_join" ->
      """SELECT p_partkey,
         array_to_string(string_split(p_name, ' ')[1:2], '|') AS joined
         FROM part ORDER BY p_partkey""",
    "x11_clean_image" ->
      """WITH b AS (SELECT p_partkey,
             'https://img.example/storage/abc123/' || p_brand || '-' ||
             replace(p_name, ' ', '_') || '.jpg,backup.png' AS img FROM part)
         SELECT p_partkey,
           regexp_replace(regexp_replace(regexp_replace(
             split_part(img, ',', 1), '\.[^./]*$', ''), '.*/', ''),
             '^[^-]*-', '') AS cleaned
         FROM b ORDER BY p_partkey""",
    "p04_slugify" ->
      """SELECT o_orderkey,
         regexp_replace(replace(replace(replace(o_orderpriority,
           'é', 'e'), 'è', 'e'), 'à', 'a'), '[ '':-]', '_', 'g') AS slug
         FROM orders ORDER BY o_orderkey"""
  )
}
