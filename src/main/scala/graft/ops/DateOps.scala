package graft.ops

import java.time.format.DateTimeFormatter
import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time operators (SURVEY §2.7 D1-D9).
  *
  * The French long format (D3, reference `strftime('%A %d %B %Y')` under a
  * fr_FR locale — process_open_data.py:95, update_open_data.py:116) is
  * implemented as a pure expression over name-lookup arrays so it stays in
  * whole-stage codegen; `frenchLongDateUdf` is the Locale.FRENCH
  * formatter equivalent kept for cross-checking in tests.
  */
object DateOps {

  /** Monday-first, matching java.time DayOfWeek ordinals. */
  val frenchDays: Seq[String] = Seq(
    "lundi", "mardi", "mercredi", "jeudi", "vendredi", "samedi", "dimanche")

  val frenchMonths: Seq[String] = Seq(
    "janvier", "février", "mars", "avril", "mai", "juin", "juillet",
    "août", "septembre", "octobre", "novembre", "décembre")

  /** D3 as a codegen-friendly expression: "EEEE dd MMMM yyyy" in French.
    * `weekday` is 0=Monday..6=Sunday, aligning with [[frenchDays]]. */
  def frenchLongDate(c: Column): Column =
    concat_ws(" ",
      element_at(typedLit(frenchDays), weekday(c) + 1),
      date_format(c, "dd"),
      element_at(typedLit(frenchMonths), month(c)),
      year(c).cast("string"))

  private val frenchFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("EEEE dd MMMM yyyy", Locale.FRENCH)

  private def fmtFrench(d: java.sql.Date): String =
    if (d == null) null else d.toLocalDate.format(frenchFmt)

  /** Locale-pinned formatter UDF — test oracle for [[frenchLongDate]]. */
  val frenchLongDateUdf = udf(fmtFrench _)

  /** D2: the reference's WP date key `%-d-%m-%Y` — day unpadded, month
    * padded (process_open_data.py:28,60-61; SURVEY §7.4(5)). */
  def wpDateKey(c: Column): Column = date_format(c, "d-MM-yyyy")

  /** D8: duration pretty-print "N jour(s)" over a distinct-date count
    * (update_open_data.py:120-126). */
  def durationPretty(nDays: Column): Column =
    concat(nDays.cast("string"),
      when(nDays === 1, lit(" jour")).otherwise(lit(" jours")))
}
