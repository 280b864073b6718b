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

  /** [[fanOut]] only when the frame's planned partitioning is narrower
    * than the configured shuffle parallelism — for per-row kernel
    * inputs (signature/shingle pipelines) whose scan may be a single
    * small file locally but thousands of splits on a cluster, where
    * the repartition would be a pure-overhead full shuffle. Call only
    * on scan/map-only frames: inspecting the partition count plans the
    * frame's RDD, and a shuffle in the plan would materialize its
    * stages eagerly under AQE. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
