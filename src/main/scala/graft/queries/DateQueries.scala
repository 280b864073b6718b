package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Availability, DateOps}

/** Oracle-checked queries for the date family (SURVEY §2.7 D1-D9) and the
  * availability algebra built on it (A4/A6/U6).
  *
  * The French-date oracle SQL is *generated* from the same
  * `DateOps.frenchDays`/`frenchMonths` arrays the Spark expression uses —
  * one source of truth on both sides of the gate.
  */
object DateQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def d: Column = col("o_orderdate").cast("date")

  /** DuckDB rendering of DateOps.frenchLongDate over SQL expression `e`. */
  private def frSql(e: String): String = {
    val days = DateOps.frenchDays.zipWithIndex
      .map { case (n, i) => s"WHEN ${i + 1} THEN '$n'" }.mkString(" ")
    val months = DateOps.frenchMonths.zipWithIndex
      .map { case (n, i) => s"WHEN ${i + 1} THEN '$n'" }.mkString(" ")
    s"((CASE isodow($e) $days END) || ' ' || strftime($e, '%d') || ' ' || " +
      s"(CASE month($e) $months END) || ' ' || CAST(year($e) AS VARCHAR))"
  }

  /** Synthetic per-row date list: one / consecutive / scattered by key
    * (exercises the unique/consecutive/sparse branches of
    * update_open_data.py:121-135). */
  private def datesArr(dd: Column, key: Column): Column =
    when(key % 3 === 0, array(dd))
      .when(key % 3 === 1, array(dd, date_add(dd, 1), date_add(dd, 2)))
      .otherwise(array(dd, date_add(dd, 2), date_add(dd, 7)))

  private val datesArrSql =
    """CASE o_orderkey % 3
         WHEN 0 THEN [o_orderdate::DATE]
         WHEN 1 THEN [o_orderdate::DATE, o_orderdate::DATE + 1,
                      o_orderdate::DATE + 2]
         ELSE [o_orderdate::DATE, o_orderdate::DATE + 2,
               o_orderdate::DATE + 7] END"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1 parse %d/%m/%Y and %Y%m%d (process_open_data.py:59,86-87;
    // custom_search_extraction.py:199)
    "d01_date_parse" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          to_date(date_format(d, "dd/MM/yyyy"), "dd/MM/yyyy").as("d_dmy"),
          to_date(date_format(d, "yyyyMMdd"), "yyyyMMdd").as("d_ymd"))
        .orderBy(col("o_orderkey"))),

    // D2 WP date key %-d-%m-%Y — day unpadded, month padded
    // (process_open_data.py:28,60-61; SURVEY §7.4(5))
    "d02_wp_date_key" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          DateOps.wpDateKey(d).as("wp_key"))
        .orderBy(col("o_orderkey"))),

    // D3 French long date (process_open_data.py:95, Locale pinned)
    "d03_french_date" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          DateOps.frenchLongDate(d).as("fr"))
        .orderBy(col("o_orderkey"))),

    // D4 injectable clock: >= fixed as-of date (process_open_data.py:90-91)
    "d04_asof_filter" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(d >= to_date(lit("1998-01-01")))
        .select(col("o_orderkey"), d.as("d"))
        .orderBy(col("o_orderkey"))),

    // D5 date-range generation (process_open_data.py:24-29)
    "d05_date_sequence" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          array_join(transform(sequence(d, date_add(d, 3)),
            x => date_format(x, "d-MM-yyyy")), "|").as("span4"))
        .orderBy(col("o_orderkey"))),

    // D6 datediff (process_open_data.py:93)
    "d06_datediff" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          datediff(d, to_date(lit("1995-01-01"))).as("days_since"))
        .orderBy(col("o_orderkey"))),

    // D7 consecutiveness via ordinal math (update_open_data.py:121-131)
    "d07_consecutive" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          Availability.isConsecutive(datesArr(d, col("o_orderkey")))
            .as("is_consec"))
        .orderBy(col("o_orderkey"))),

    // D8 duration pretty-print "N jour(s)" (update_open_data.py:120-126)
    "d08_duration_pretty" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          Availability.durationPretty(datesArr(d, col("o_orderkey")))
            .as("dur"))
        .orderBy(col("o_orderkey"))),

    // D9 date-span pretty-print (update_open_data.py:127-135)
    "d09_date_span" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          Availability.dateSpanPretty(datesArr(d, col("o_orderkey")))
            .as("span"))
        .orderBy(col("o_orderkey"))),

    // A4 per-row array stats: min / distinct count / consecutive
    "a04_array_stats" -> ((s, dir) => {
      val arr = datesArr(d, col("o_orderkey"))
      t(s, dir, "orders").select(col("o_orderkey"),
          array_min(arr).as("first_date"),
          Availability.nDistinctDates(arr).as("n_distinct"),
          Availability.isConsecutive(arr).as("is_consec"))
        .orderBy(col("o_orderkey"))
    }),

    // A6 calendar set-difference (process_open_data.py:24-32,63-64)
    "a06_calendar_diff" -> ((s, dir) => {
      val cal = Availability.calendar("1995-01-01", "1995-03-01")
      t(s, dir, "orders")
        .filter(d.between(lit("1995-01-01"), lit("1995-02-15")))
        .select(col("o_orderkey"),
          Availability.availability(cal, datesArr(d, col("o_orderkey")))
            .as("avail"))
        .orderBy(col("o_orderkey"))
    }),

    // U6 whole availability algebra in one pass (update_open_data.py:98-151)
    "u06_availability" -> ((s, dir) => {
      val arr = datesArr(d, col("o_orderkey"))
      val cal = Availability.calendar("1995-01-01", "1995-03-01")
      t(s, dir, "orders")
        .filter(d.between(lit("1995-01-01"), lit("1995-02-15")))
        .select(col("o_orderkey"),
          Availability.availability(cal, arr).as("avail"),
          Availability.durationPretty(arr).as("dur"),
          Availability.dateSpanPretty(arr).as("span"))
        .orderBy(col("o_orderkey"))
    })
  )

  private val calSql =
    """list_transform(generate_series(DATE '1995-01-01',
         DATE '1995-03-01', INTERVAL 1 DAY), x -> x::DATE)"""

  private def availSql(cal: String, used: String): String =
    s"""array_to_string(list_transform(
          list_filter($cal, x -> NOT list_contains($used, x)),
          x -> strftime(x, '%-d-%m-%Y')), '|')"""

  private def spanSql(arr: String): String =
    s"""CASE WHEN len(list_distinct($arr)) = 1
          THEN ${frSql(s"list_aggregate($arr, 'min')")}
        WHEN date_diff('day', list_aggregate($arr, 'min'),
                       list_aggregate($arr, 'max'))
             = len(list_distinct($arr)) - 1
          THEN 'Du ' || ${frSql(s"list_aggregate($arr, 'min')")} ||
               ' au ' || ${frSql(s"list_aggregate($arr, 'max')")}
        ELSE array_to_string(list_transform($arr, x -> ${frSql("x")}), ', ')
        END"""

  val oracle: Map[String, String] = Map(
    "d01_date_parse" ->
      """SELECT o_orderkey,
         strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')::DATE
           AS d_dmy,
         strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d')::DATE AS d_ymd
         FROM orders ORDER BY o_orderkey""",
    "d02_wp_date_key" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%-d-%m-%Y') AS wp_key
         FROM orders ORDER BY o_orderkey""",
    "d03_french_date" ->
      s"""SELECT o_orderkey, ${frSql("o_orderdate::DATE")} AS fr
          FROM orders ORDER BY o_orderkey""",
    "d04_asof_filter" ->
      """SELECT o_orderkey, o_orderdate::DATE AS d FROM orders
         WHERE o_orderdate::DATE >= DATE '1998-01-01' ORDER BY o_orderkey""",
    "d05_date_sequence" ->
      """SELECT o_orderkey, array_to_string(list_transform(
           generate_series(o_orderdate::DATE, o_orderdate::DATE + 3,
                           INTERVAL 1 DAY),
           x -> strftime(x, '%-d-%m-%Y')), '|') AS span4
         FROM orders ORDER BY o_orderkey""",
    "d06_datediff" ->
      """SELECT o_orderkey,
         CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS INT)
           AS days_since
         FROM orders ORDER BY o_orderkey""",
    "d07_consecutive" ->
      s"""WITH b AS (SELECT o_orderkey, $datesArrSql AS arr FROM orders)
          SELECT o_orderkey,
            date_diff('day', list_aggregate(arr, 'min'),
                      list_aggregate(arr, 'max'))
              = len(list_distinct(arr)) - 1 AS is_consec
          FROM b ORDER BY o_orderkey""",
    "d08_duration_pretty" ->
      s"""WITH b AS (SELECT o_orderkey, $datesArrSql AS arr FROM orders)
          SELECT o_orderkey,
            CAST(len(list_distinct(arr)) AS VARCHAR) ||
            (CASE WHEN len(list_distinct(arr)) = 1 THEN ' jour'
                  ELSE ' jours' END) AS dur
          FROM b ORDER BY o_orderkey""",
    "d09_date_span" ->
      s"""WITH b AS (SELECT o_orderkey, $datesArrSql AS arr FROM orders)
          SELECT o_orderkey, ${spanSql("arr")} AS span
          FROM b ORDER BY o_orderkey""",
    "a04_array_stats" ->
      s"""WITH b AS (SELECT o_orderkey, $datesArrSql AS arr FROM orders)
          SELECT o_orderkey, list_aggregate(arr, 'min') AS first_date,
            CAST(len(list_distinct(arr)) AS INT) AS n_distinct,
            date_diff('day', list_aggregate(arr, 'min'),
                      list_aggregate(arr, 'max'))
              = len(list_distinct(arr)) - 1 AS is_consec
          FROM b ORDER BY o_orderkey""",
    "a06_calendar_diff" ->
      s"""WITH b AS (SELECT o_orderkey, $datesArrSql AS arr FROM orders
            WHERE o_orderdate::DATE BETWEEN DATE '1995-01-01'
              AND DATE '1995-02-15')
          SELECT o_orderkey, ${availSql(calSql, "arr")} AS avail
          FROM b ORDER BY o_orderkey""",
    "u06_availability" ->
      s"""WITH b AS (SELECT o_orderkey, $datesArrSql AS arr FROM orders
            WHERE o_orderdate::DATE BETWEEN DATE '1995-01-01'
              AND DATE '1995-02-15')
          SELECT o_orderkey, ${availSql(calSql, "arr")} AS avail,
            CAST(len(list_distinct(arr)) AS VARCHAR) ||
            (CASE WHEN len(list_distinct(arr)) = 1 THEN ' jour'
                  ELSE ' jours' END) AS dur,
            ${spanSql("arr")} AS span
          FROM b ORDER BY o_orderkey"""
  )
}
