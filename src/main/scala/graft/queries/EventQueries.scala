package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.AsOfJoin

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
    }),

    // As-of join: each purchase picks up the latest preceding click of
    // the same user (point-in-time enrichment; DuckDB's ASOF LEFT JOIN
    // is the oracle). Union + running-window encoding: one shuffle on
    // user_id, no per-key pair explosion.
    "ev03_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "event_id",
          Seq("ts", "value"))
        .select(col("event_id"), col("user_id"), col("ts"),
                col("asof_ts"), col("asof_value"))
        .orderBy(col("event_id"))
    }),

    // Typed JSON extraction from the props payload column (schema-on-read
    // over a semi-structured field), rolled up per event type. from_json
    // with an explicit schema, not a UDF — stays in codegen.
    "ev04_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
             max(col("k")).as("max_k"))
        .orderBy(col("event_type")))
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
         FROM m ORDER BY user_id, event_id""",
    "ev03_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts
           FROM events WHERE event_type = 'purchase'),
         r0 AS (SELECT user_id, ts::TIMESTAMP AS ts, value,
             row_number() OVER (PARTITION BY user_id, ts
               ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, ts, value FROM r0 WHERE rn = 1)
         SELECT l.event_id, l.user_id, l.ts,
                r.ts AS asof_ts, r.value AS asof_value
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",
    "ev04_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
           AS BIGINT) AS sum_k,
         MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
