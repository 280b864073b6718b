package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to every left row the latest right
  * row with rightTime <= leftTime in the same key group — the
  * feature-store / event-enrichment lookup that Spark has no built-in
  * operator for.
  *
  * Implemented as the union-and-running-window encoding rather than a
  * range join: tag both sides, union them, and take the running
  * last-non-null right payload over (key) ordered by (time, side). A
  * per-key range join (`l JOIN r ON key AND r.t <= l.t` + arg-max)
  * materializes O(|L|·|R|) rows per key before pruning; the window form
  * is one shuffle on the key and one sort — the same cost as a
  * sort-merge join regardless of how many right rows precede each left
  * row, so it survives 100× scale and hot keys alike.
  */
object AsOfJoin {

  /** For each left row, the matching right row with equal `key` under
    * `direction` — the pandas `merge_asof` direction family:
    *   backward  latest right with rightTime <= leftTime (default)
    *   forward   earliest right with rightTime >= leftTime
    *   nearest   whichever of the two is closer in time; an exact tie
    *             takes the backward match (the pandas rule)
    * The right row's `attach` columns are appended as `asof_<name>`
    * (null when no row matches). Right rows sharing (key, time) are
    * reduced to the one with the highest `rightSeq`, so the operator
    * is deterministic under timestamp collisions; matches are
    * inclusive in both directions (a right row at exactly left.time
    * wins either way).
    *
    * All three directions stay the union-and-running-window encoding:
    * forward is the same running last-non-null scanned in DESCENDING
    * time (the most recent right row seen is then the earliest one at
    * or after the left row), and nearest evaluates both windows over
    * the one unioned frame — one shuffle on the key regardless of
    * direction, never a per-key pair explosion. Nearest distances
    * compare as `cast(time AS double)` (exact for timestamps —
    * fractional seconds — and for numeric time columns alike). */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           rightSeq: String, attach: Seq[String],
           prefix: String = "asof_",
           direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"AsOfJoin: unknown direction '$direction' — use 'backward', " +
        "'forward' or 'nearest'")
    val byKeyTime = Window.partitionBy(col(key), col(time))
      .orderBy(col(rightSeq).desc)
    // the right time rides INSIDE the match struct (as __rt, a double)
    // so nearest can compare distances without a second join
    val r = right
      .withColumn("__rn", row_number().over(byKeyTime))
      .filter(col("__rn") === 1)
      .select(col(key), col(time),
        struct(attach.map(col) :+
          col(time).cast("double").as("__rt"): _*).as("__att"))
    // right rows (side 0) sort before left rows (side 1) at equal time
    // under BOTH scan orders, making both directions inclusive of
    // rightTime == leftTime
    val unioned = left.withColumn("__side", lit(1))
      .unionByName(r.withColumn("__side", lit(0)),
        allowMissingColumns = true)
    def run(desc: Boolean) = {
      val t = if (desc) col(time).desc else col(time).asc
      Window.partitionBy(col(key)).orderBy(t, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val withMatch = direction match {
      case "backward" => unioned.withColumn("__match",
        last(col("__att"), ignoreNulls = true).over(run(desc = false)))
      case "forward" => unioned.withColumn("__match",
        last(col("__att"), ignoreNulls = true).over(run(desc = true)))
      case "nearest" =>
        val lt = col(time).cast("double")
        unioned
          .withColumn("__mb",
            last(col("__att"), ignoreNulls = true)
              .over(run(desc = false)))
          .withColumn("__mf",
            last(col("__att"), ignoreNulls = true)
              .over(run(desc = true)))
          .withColumn("__match",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when((lt - col("__mb").getField("__rt")) <=
                (col("__mf").getField("__rt") - lt), col("__mb"))
              .otherwise(col("__mf")))
    }
    val matched = withMatch.filter(col("__side") === 1)
    attach.foldLeft(matched) { (d, a) =>
      d.withColumn(prefix + a, col("__match").getField(a))
    }.drop("__side", "__att", "__match", "__mb", "__mf")
  }
}
