package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar-availability algebra (SURVEY §2.7 A4/A6/D5/D7-D9, U6).
  *
  * The reference computes per-row date-set algebra in a Python loop
  * (process_open_data.py:50-67, update_open_data.py:98-151): parse a
  * delimited date list, dedup, min/max, consecutiveness, a 3-year-calendar
  * set difference, and two pretty-printed strings. Here each piece is a
  * higher-order array expression — vectorized, codegen'd, no UDF, no
  * driver collection — so a 100-TB column of date arrays distributes like
  * any other column.
  */
object Availability {

  /** D5: fixed calendar as an array literal column —
    * `sequence(d1, d2, interval 1 day)`, both ends inclusive
    * (reference: pd.date_range('2019-01-01','2022-01-01'),
    * process_open_data.py:24-29). */
  def calendar(from: String, to: String): Column =
    sequence(to_date(lit(from)), to_date(lit(to)),
             expr("interval 1 day"))

  /** A4: number of distinct dates. */
  def nDistinctDates(dates: Column): Column = size(array_distinct(dates))

  /** A4/D7: consecutiveness — max-min ordinal span equals distinct count
    * minus one (update_open_data.py:121-131 toordinal math). */
  def isConsecutive(dates: Column): Column =
    datediff(array_max(dates), array_min(dates)) ===
      size(array_distinct(dates)) - 1

  /** A6/U6: availability = calendar − used, serialized with '|' in the
    * WP date-key format (process_open_data.py:63-65: Diff(mydates, used)
    * then '|'.join). Output order follows the calendar (deterministic),
    * unlike the reference's set() ordering. */
  def availability(cal: Column, used: Column): Column =
    array_join(transform(array_except(cal, used),
                         d => date_format(d, "d-MM-yyyy")), "|")

  /** D9: date-span pretty-print (update_open_data.py:127-135):
    * one distinct date → that date; consecutive → "Du X au Y";
    * else the comma-joined list — all in French long format. */
  def dateSpanPretty(dates: Column): Column = {
    val n = size(array_distinct(dates))
    when(n === 1, DateOps.frenchLongDate(array_min(dates)))
      .when(isConsecutive(dates),
        concat(lit("Du "), DateOps.frenchLongDate(array_min(dates)),
               lit(" au "), DateOps.frenchLongDate(array_max(dates))))
      .otherwise(array_join(
        transform(dates, d => DateOps.frenchLongDate(d)), ", "))
  }

  /** D8 over an array: "N jour(s)" on the distinct-date count. */
  def durationPretty(dates: Column): Column =
    DateOps.durationPretty(nDistinctDates(dates))
}
