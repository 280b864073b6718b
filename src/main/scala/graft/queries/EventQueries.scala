package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked queries over the `events` stream table: tumbling-window
  * aggregation and gap-based sessionization — the batch forms of the
  * Structured Streaming operators in graft.streaming (same logical
  * plans; the streaming variants add watermarks/state).
  */
object EventQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling one-hour window per event type: count + value sum
    "ev01_hourly_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"),
                 date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"),
             // floor(x*100+0.5) cents keep the sum IEEE-exact in every
             // engine; emitted as DOUBLE — decimal renderings differ
             // across engines even when values agree (see q01)
             (sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
                .cast("double") / 100.0)
               .as("total"))
        .orderBy(col("event_type"), col("hour"))),

    // Gap-based sessionization (30-minute inactivity, per user):
    // session index via cumulative count of gap-opens
    "ev02_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val prev = lag(col("ts"), 1).over(byUser)
      val isNew = when(prev.isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(prev) > 1800, 1L)
        .otherwise(0L)
      t(s, dir, "events")
        .withColumn("session_id",
          sum(isNew).over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("event_id"), col("ts"),
                col("session_id"))
        .orderBy(col("user_id"), col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "ev01_hourly_agg" ->
      """SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS hour,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
              AS DOUBLE) / CAST(100.0 AS DOUBLE) AS total
         FROM events GROUP BY event_type, hour
         ORDER BY event_type, hour""",
    "ev02_sessionize" ->
      """WITH b AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts,
           lag(ts::TIMESTAMP) OVER (PARTITION BY user_id
             ORDER BY ts::TIMESTAMP ASC, event_id ASC) AS prev
           FROM events),
         m AS (SELECT user_id, event_id, ts,
           CASE WHEN prev IS NULL
                  OR date_diff('second', prev, ts) > 1800
                THEN 1 ELSE 0 END AS is_new FROM b)
         SELECT user_id, event_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
         FROM m ORDER BY user_id, event_id"""
  )
}
