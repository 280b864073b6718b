package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark's planner can only run a non-equi join as a broadcast nested
  * loop (or a cartesian) — fine while one side fits the broadcast
  * threshold, fatal when both sides are large. Bucketing the range
  * domain turns it into an EQUI join: each interval replicates to
  * every fixed-width bucket it overlaps (replication factor =
  * span/width + 1 — the caller-controlled knob, sized so typical
  * intervals span a handful of buckets), each point hashes to exactly
  * ONE bucket, and the bucket equi-join plus the residual
  * `lo <= p <= hi` filter reproduces the theta join exactly. A
  * matching (point, interval) pair meets only in the point's own
  * bucket, so the join is duplicate-free BY CONSTRUCTION — no dedup
  * pass. Both sides shuffle-partition by bucket, which is precisely
  * the regime (large × large) where the nested loop dies; AQE's
  * skew-join split handles a hot bucket like any other skewed
  * equi-key.
  */
object RangeJoin {

  /** Internal helper column names. Both entry points REQUIRE these to
    * be absent from the inputs (checked up front) — `withColumn`
    * would otherwise silently replace a same-named input column and
    * the trailing `drop` would then remove user data. */
  private val Reserved =
    Seq("__rj_p", "__rj_bk", "__rj_lo", "__rj_hi",
        "__rj_alo", "__rj_ahi", "__rj_blo", "__rj_bhi",
        "__rj_abk", "__rj_bbk")

  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val clash = df.columns.toSet.intersect(Reserved.toSet)
    require(clash.isEmpty,
      s"$side input must not contain RangeJoin helper columns " +
        s"${clash.mkString(", ")} — rename them before the join")
  }

  /** Per-interval replication cap: an interval spanning more than
    * this many buckets fails LOUDLY at runtime (per row, via
    * `raise_error`) instead of exploding an arbitrarily large —
    * eventually `sequence()`-rejected (hard cap ~2^31 elements) or
    * OOM-ing — bucket array. A correctly-sized `bucketWidth` keeps
    * typical intervals to a handful of buckets; hitting this cap
    * means the width is wrong for the data, not that the cap is
    * tight. */
  val MaxBucketsPerInterval: Long = 1L << 16

  /** Floor-division bucket, exact on the FULL long domain (epoch
    * nanos included): the subtraction makes the dividend an exact
    * multiple of `w`, and integral `div` on longs has no rounding —
    * unlike double `/`, which loses exactness past 2^53. `div`
    * truncates toward zero, which is safe here because the dividend
    * is already the floored multiple (negative domains included:
    * `pmod` is nonnegative). */
  private def bucketOf(v: Column, w: Long): Column =
    call_function("div", v - pmod(v, lit(w)), lit(w))

  /** `bucketOf(hi)` guarded by the replication cap: raises a runtime
    * error naming the offending span when `[lo, hi]` covers more than
    * [[MaxBucketsPerInterval]] buckets, otherwise passes the hi
    * bucket through for `sequence()` to expand. */
  private def guardedHiBucket(lo: Column, hi: Column, w: Long): Column = {
    val bkLo = bucketOf(lo, w)
    val bkHi = bucketOf(hi, w)
    when(bkHi - bkLo < lit(MaxBucketsPerInterval), bkHi)
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans more than $MaxBucketsPerInterval " +
            s"buckets at bucketWidth=$w (lo="), lo.cast("string"),
        lit(", hi="), hi.cast("string"),
        lit(") — increase bucketWidth"))))
  }

  /** Rows of `points` × `intervals` where
    * `loCol <= pointCol <= hiCol`, as an equi-bucketed join. Inputs
    * must not share column names (select/alias first, as with any
    * join) and must not contain `__rj_*` columns (checked); the
    * expressions are evaluated as LONG — days, epoch seconds, any
    * integral domain. Empty/inverted intervals (`lo > hi`) match
    * nothing. Intervals wider than [[MaxBucketsPerInterval]] buckets
    * fail loudly — size `bucketWidth` to the data. */
  def pointInInterval(points: DataFrame, pointCol: Column,
                      intervals: DataFrame, loCol: Column, hiCol: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    requireNoReserved(points, "points")
    requireNoReserved(intervals, "intervals")
    val pt = points.withColumn("__rj_p", pointCol.cast("long"))
      .withColumn("__rj_bk", bucketOf(col("__rj_p"), bucketWidth))
    val iv = intervals.withColumn("__rj_lo", loCol.cast("long"))
      .withColumn("__rj_hi", hiCol.cast("long"))
      .filter(col("__rj_lo") <= col("__rj_hi"))
      .withColumn("__rj_bk", explode(sequence(
        bucketOf(col("__rj_lo"), bucketWidth),
        guardedHiBucket(col("__rj_lo"), col("__rj_hi"), bucketWidth))))
    pt.join(iv, Seq("__rj_bk"))
      .filter(col("__rj_p") >= col("__rj_lo") &&
              col("__rj_p") <= col("__rj_hi"))
      .drop("__rj_bk", "__rj_p", "__rj_lo", "__rj_hi")
  }

  /** Interval × interval OVERLAP join: pairs where
    * `[alo, ahi] ∩ [blo, bhi] ≠ ∅`, equi-bucketed like
    * [[pointInInterval]]. Both sides replicate to their covered
    * buckets; a pair would meet in every bucket the overlap spans, so
    * the join keeps it only in the overlap's START bucket
    * (`bucketOf(max(alo, blo))` — a bucket both sides necessarily
    * cover when they overlap), restoring exactly-once by
    * construction. Inputs must not share column names and must not
    * contain `__rj_*` columns (checked). */
  def intervalOverlap(left: DataFrame, aLo: Column, aHi: Column,
                      right: DataFrame, bLo: Column, bHi: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    requireNoReserved(left, "left")
    requireNoReserved(right, "right")
    def exploded(df: DataFrame, lo: Column, hi: Column,
                 loN: String, hiN: String): DataFrame =
      df.withColumn(loN, lo.cast("long")).withColumn(hiN, hi.cast("long"))
        .filter(col(loN) <= col(hiN))
        .withColumn("__rj_bk", explode(sequence(
          bucketOf(col(loN), bucketWidth),
          guardedHiBucket(col(loN), col(hiN), bucketWidth))))
    val a = exploded(left, aLo, aHi, "__rj_alo", "__rj_ahi")
    val b = exploded(right, bLo, bHi, "__rj_blo", "__rj_bhi")
    a.join(b, Seq("__rj_bk"))
      .filter(greatest(col("__rj_alo"), col("__rj_blo")) <=
                least(col("__rj_ahi"), col("__rj_bhi")) &&
              col("__rj_bk") === bucketOf(
                greatest(col("__rj_alo"), col("__rj_blo")), bucketWidth))
      .drop("__rj_bk", "__rj_alo", "__rj_ahi", "__rj_blo", "__rj_bhi")
  }

  /** Watermarked STREAM-STREAM interval-overlap join — [[intervalOverlap]]
    * where BOTH sides are live feeds. Two things make it plannable
    * where the raw theta join is not: the bucket replication turns the
    * overlap predicate into an EQUI key (Structured Streaming has no
    * stream-stream theta path), and the join condition carries an
    * event-time bound between the two sides' watermarked timestamp
    * columns — the constraint the engine needs to EVICT state: a row
    * is dropped from the join state once the other side's watermark
    * passes `its event time + maxSpan`, so state is bounded by
    * watermark delay + maxSpan worth of rows, not the streams' history.
    *
    * Contract: `aTime`/`bTime` name each side's event-time TIMESTAMP
    * columns (the interval START instants — callers apply
    * `withWatermark` on them before the join), every interval spans at
    * most `maxSpan` (a SQL day-time interval literal, e.g. "60 days"),
    * so two overlapping intervals' starts are within `maxSpan` of each
    * other and the time bound never excludes a real overlap. The span
    * bound is CHECKED per row (the [[guardedHiBucket]] discipline): an
    * interval wider than `maxSpan` raises at evaluation instead of
    * silently losing the overlaps the time bound would have excluded —
    * `unitSeconds` scales the `lo`/`hi` long domain to seconds (1 for
    * epoch-seconds intervals, 86400 for day numbers) so the width
    * compares against the same clock the join bound uses. Inputs must
    * not share column names and must not contain `__rj_*` columns
    * (checked). Exactly-once per overlapping pair, as in
    * [[intervalOverlap]] (start-bucket dedup). Event times must sit
    * strictly AFTER the epoch: the engine's initial watermark is
    * 1970-01-01T00:00Z, and a first-batch row at exactly that instant
    * is treated as late and silently dropped (StreamingSpec pins the
    * behavior away from the boundary). */
  def intervalOverlapStream(left: DataFrame, aLo: Column, aHi: Column,
                            aTime: String,
                            right: DataFrame, bLo: Column, bHi: Column,
                            bTime: String,
                            bucketWidth: Long, maxSpan: String,
                            unitSeconds: Long = 1L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(unitSeconds > 0, s"unitSeconds must be > 0, got $unitSeconds")
    requireNoReserved(left, "left")
    requireNoReserved(right, "right")
    // maxSpan in lo/hi-domain units (floored — a not-exact-multiple
    // span just tightens the guard). Day-time only: a month-bearing
    // interval has no fixed width to check a row against.
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(maxSpan))
    require(iv.months == 0,
      s"maxSpan must be a day-time interval (no months/years): $maxSpan")
    val maxUnits = (iv.days * 86400L * 1000000L + iv.microseconds) /
      (unitSeconds * 1000000L)
    // per-row span check, the guardedHiBucket shape: hi passes through
    // only while the interval fits maxSpan (inverted intervals pass —
    // the lo<=hi filter drops them before they can match anything)
    def guardedSpanHi(lo: Column, hi: Column): Column =
      when(hi < lo || hi - lo <= lit(maxUnits), hi)
        .otherwise(raise_error(concat(
          lit(s"RangeJoin: interval wider than maxSpan=$maxSpan (lo="),
          lo.cast("string"), lit(", hi="), hi.cast("string"),
          lit(s", unitSeconds=$unitSeconds) — the stream-stream time " +
            "bound would silently lose its overlaps; widen maxSpan"))))
    def exploded(df: DataFrame, lo: Column, hi: Column,
                 loN: String, hiN: String, bkN: String): DataFrame =
      df.withColumn(loN, lo.cast("long"))
        .withColumn(hiN, guardedSpanHi(col(loN), hi.cast("long")))
        .filter(col(loN) <= col(hiN))
        .withColumn(bkN, explode(sequence(
          bucketOf(col(loN), bucketWidth),
          guardedHiBucket(col(loN), col(hiN), bucketWidth))))
    val a = exploded(left, aLo, aHi, "__rj_alo", "__rj_ahi", "__rj_abk")
    val b = exploded(right, bLo, bHi, "__rj_blo", "__rj_bhi", "__rj_bbk")
    val span = expr(s"INTERVAL $maxSpan")
    a.join(b,
        col("__rj_abk") === col("__rj_bbk") &&
          col(bTime) >= col(aTime) - span &&
          col(bTime) <= col(aTime) + span,
        "inner")
      .filter(greatest(col("__rj_alo"), col("__rj_blo")) <=
                least(col("__rj_ahi"), col("__rj_bhi")) &&
              col("__rj_abk") === bucketOf(
                greatest(col("__rj_alo"), col("__rj_blo")), bucketWidth))
      .drop("__rj_abk", "__rj_bbk", "__rj_alo", "__rj_ahi",
        "__rj_blo", "__rj_bhi")
  }
}
