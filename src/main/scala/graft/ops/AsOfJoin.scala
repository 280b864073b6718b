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

  /** For each left row, the latest right row with `right.time <=
    * left.time` and equal `key`; its `attach` columns are appended as
    * `asof_<name>` (null when no right row precedes). Right rows sharing
    * (key, time) are reduced to the one with the highest `rightSeq`, so
    * the operator is deterministic under timestamp collisions; the match
    * is inclusive (a right row at exactly left.time wins).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           rightSeq: String, attach: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    val byKeyTime = Window.partitionBy(col(key), col(time))
      .orderBy(col(rightSeq).desc)
    val r = right
      .withColumn("__rn", row_number().over(byKeyTime))
      .filter(col("__rn") === 1)
      .select(col(key), col(time), struct(attach.map(col): _*).as("__att"))
    // right rows (side 0) sort before left rows (side 1) at equal time,
    // making the running last-non-null inclusive of rightTime == leftTime
    val unioned = left.withColumn("__side", lit(1))
      .unionByName(r.withColumn("__side", lit(0)),
        allowMissingColumns = true)
    val run = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__att"), ignoreNulls = true).over(run))
      .filter(col("__side") === 1)
    attach.foldLeft(matched) { (d, a) =>
      d.withColumn(prefix + a, col("__match").getField(a))
    }.drop("__side", "__att", "__match")
  }
}
