package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-sequence funnels — "how many users signed up, then
  * viewed, then purchased, IN THAT ORDER": the product-analytics
  * counterpart of the sessionize/as-of family. A user reaches stage k
  * when an event of stage k's type occurs STRICTLY AFTER their
  * earliest stage-(k−1) reach time (the standard ordered-funnel rule;
  * first-touch attribution — the earliest qualifying event is the
  * stage's reach time).
  *
  * Scale shape: stage k is one filtered equi-join against the
  * stage-(k−1) reach frame followed by a partial-aggregated min — all
  * joins and aggregations key on the user column, so every stage
  * reuses one hash partitioning and the per-stage state is one
  * (user, timestamp) row, never an event list. No window over event
  * history, no collect, stage count bounds the plan depth.
  */
object Funnel {

  /** Per-user reach times: one row per user who completed the whole
    * sequence prefix ending at each stage — (user, t1..tk) for users
    * who reached stage k (users stop appearing at the stage they fail
    * to reach). `stages` are event-type values, in funnel order. */
  def stageTimes(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "Funnel: need at least one stage")
    require(stages.distinct.size == stages.size,
      s"Funnel: duplicate stage types in ${stages.mkString(",")} — " +
        "a repeated type makes the ordered semantics ambiguous")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    stages.tail.zipWithIndex.scanLeft(first) {
      case (prev, (tpe, i)) =>
        events.filter(col(typeCol) === tpe)
          .join(prev.select(col(userCol), col(s"t${i + 1}")), userCol)
          .filter(col(tsCol) > col(s"t${i + 1}"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t${i + 2}"))
    }.toSeq
  }

  /** The funnel report: one row per stage with how many users reached
    * it — (stage_ord, stage, users), descending by construction. */
  def report(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame =
    stageTimes(events, userCol, typeCol, tsCol, stages).zipWithIndex
      .map { case (df, i) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("stage_ord"),
            lit(stages(i)).as("stage"), col("users"))
      }.reduce(_.unionAll(_))
}
