package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream — the streaming
  * twins of the batch ev01/ev02 queries: same logical aggregation, plus
  * watermark/state management. Works identically on a batch frame (the
  * functions only use streaming-legal operations), which is how the
  * batch oracle gates their logic.
  */
object EventsStream {

  /** Hourly tumbling counts/sums per event type, 2h watermark for late
    * data. Streaming twin of ev01_hourly_agg — same double-typed
    * floor-cents sum as the batch form so batch/stream outputs agree
    * bit-exactly. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           (sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
              .cast("double") / 100.0).as("total"))
      .select(col("window.start").as("hour"), col("event_type"),
              col("n"), col("total"))

  /** Streaming exact dedup on a content key, watermark-bounded state —
    * the streaming twin of `Dedup.exactDedup` for an ingestion pipeline
    * (duplicate events re-delivered within the lateness bound are
    * dropped; state for keys older than the watermark is reclaimed, so
    * state size tracks the window, not the stream).
    * `dropDuplicatesWithinWatermark` is streaming-only (batch planning
    * rejects it), so the batch twin is plain `dropDuplicates` — same
    * key-set output, which is what the agreement test asserts. */
  def dedupEvents(events: DataFrame,
                  keyCols: Seq[String] = Seq("user_id", "event_type"),
                  lateness: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  final case class Ev(user_id: Long, event_id: Long,
                      ts: java.sql.Timestamp)
  final case class SessState(lastMs: Long, sessionId: Long)
  final case class SessOut(user_id: Long, event_id: Long, session_id: Long)

  final case class AsOfEv(user_id: Long, event_id: Long,
                          ts: java.sql.Timestamp, side: Int, value: Double)
  final case class AsOfMatch(ms: Long, value: Double)
  final case class AsOfOut(user_id: Long, event_id: Long,
                           asof_ms: Option[Long], asof_value: Option[Double])

  /** Streaming as-of enrichment — the stateful twin of
    * [[graft.ops.AsOfJoin]]: per-key state carries the latest right row
    * (side 0) seen so far; left rows (side 1) emit the state match at
    * their timestamp. Within a micro-batch rows are ordered
    * (ts, side, event_id) — right before left at equal ts, and a
    * same-ts right overwrite keeps the highest event_id — matching the
    * batch encoding's inclusive bound and collision tie-break. With
    * per-key in-order delivery (or same-batch arrival) the output
    * equals the batch operator's; on a batch frame each key arrives as
    * one group, so agreement is exact. */
  def asOfEnrich(events: Dataset[AsOfEv]): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfMatch, AsOfOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[AsOfEv], state: GroupState[AsOfMatch]) =>
          val sorted = evs.toSeq
            .sortBy(e => (e.ts.getTime, e.side, e.event_id))
          var st = state.getOption
          val out = Seq.newBuilder[AsOfOut]
          sorted.foreach { e =>
            if (e.side == 0) {
              if (st.forall(_.ms <= e.ts.getTime))
                st = Some(AsOfMatch(e.ts.getTime, e.value))
            } else {
              out += AsOfOut(uid, e.event_id, st.map(_.ms),
                st.map(_.value))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Gap-based sessionization with explicit per-user state
    * (flatMapGroupsWithState) — streaming twin of ev02_sessionize.
    * Events within a micro-batch are ordered by (ts, event_id); state
    * carries the last-seen timestamp and running session index across
    * batches. */
  def sessionize(events: Dataset[Ev],
                 gapSeconds: Long = 1800): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
          val out = sorted.map { e =>
            val ms = e.ts.getTime
            val isNew = st.lastMs == Long.MinValue ||
              (ms / 1000 - st.lastMs / 1000) > gapSeconds
            st = SessState(ms,
              if (isNew) st.sessionId + 1 else st.sessionId)
            SessOut(uid, e.event_id, st.sessionId)
          }
          state.update(st)
          out.iterator
      }
  }
}
