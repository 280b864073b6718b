package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism pinning for small-bytes/high-fan-out frames.
  *
  * AQE coalesces shuffle partitions by byte size; a frame of a few
  * hundred KB of keys collapses to one partition even when the next
  * operator (an exploding join, a per-pair scoring stage) multiplies its
  * work 1000×. A user-specified repartition count is exempt from AQE
  * coalescing, so [[fanOut]] pins such frames to the configured shuffle
  * parallelism (measured: a 15M-pair scoring join ran in ONE task —
  * identical wall-time at 8 and 32 threads — before this).
  */
object Par {
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt)
}
