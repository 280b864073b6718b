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

  /** Floor-division bucket, exact for negative domains too (`div`
    * truncates toward zero, which would split bucket 0 across the
    * origin). The subtraction makes the dividend an exact multiple of
    * `w`, so the double division is exact while |v| < 2^53 — any
    * calendar or epoch-seconds domain. */
  private def bucketOf(v: Column, w: Long): Column =
    ((v - pmod(v, lit(w))) / lit(w)).cast("long")

  /** Rows of `points` × `intervals` where
    * `loCol <= pointCol <= hiCol`, as an equi-bucketed join. Inputs
    * must not share column names (select/alias first, as with any
    * join); the expressions are evaluated as LONG — days, epoch
    * seconds, any integral domain. Empty/inverted intervals
    * (`lo > hi`) match nothing. */
  def pointInInterval(points: DataFrame, pointCol: Column,
                      intervals: DataFrame, loCol: Column, hiCol: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val pt = points.withColumn("__rj_p", pointCol.cast("long"))
      .withColumn("__rj_bk", bucketOf(col("__rj_p"), bucketWidth))
    val iv = intervals.withColumn("__rj_lo", loCol.cast("long"))
      .withColumn("__rj_hi", hiCol.cast("long"))
      .filter(col("__rj_lo") <= col("__rj_hi"))
      .withColumn("__rj_bk", explode(sequence(
        bucketOf(col("__rj_lo"), bucketWidth),
        bucketOf(col("__rj_hi"), bucketWidth))))
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
    * construction. Inputs must not share column names. */
  def intervalOverlap(left: DataFrame, aLo: Column, aHi: Column,
                      right: DataFrame, bLo: Column, bHi: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    def exploded(df: DataFrame, lo: Column, hi: Column,
                 loN: String, hiN: String): DataFrame =
      df.withColumn(loN, lo.cast("long")).withColumn(hiN, hi.cast("long"))
        .filter(col(loN) <= col(hiN))
        .withColumn("__rj_bk", explode(sequence(
          bucketOf(col(loN), bucketWidth),
          bucketOf(col(hiN), bucketWidth))))
    val a = exploded(left, aLo, aHi, "__rj_alo", "__rj_ahi")
    val b = exploded(right, bLo, bHi, "__rj_blo", "__rj_bhi")
    a.join(b, Seq("__rj_bk"))
      .filter(greatest(col("__rj_alo"), col("__rj_blo")) <=
                least(col("__rj_ahi"), col("__rj_bhi")) &&
              col("__rj_bk") === bucketOf(
                greatest(col("__rj_alo"), col("__rj_blo")), bucketWidth))
      .drop("__rj_bk", "__rj_alo", "__rj_ahi", "__rj_blo", "__rj_bhi")
  }
}
