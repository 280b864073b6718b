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

  /** Run independent pipeline stages as CONCURRENT Spark jobs.
    * Actions are only sequential because the driver calls them
    * sequentially; inside one application the scheduler happily runs
    * several jobs at once, so a later lane's tasks back-fill the
    * executor slots an earlier lane's stragglers leave idle — and on
    * the many-small-jobs chain gates the lanes also overlap each
    * other's per-job driver latency. FIFO scheduling (the default)
    * keeps the first lane ahead; use ONLY for lanes with no data
    * dependency and no write to the same table/partition. Failure
    * semantics match the sequential form EXCEPT that every lane is
    * AWAITED before the first failure propagates (unwrapped, in lane
    * order) — propagating early would leave orphan lanes still
    * running while the caller (or a recovery pass) re-enters the same
    * tables. */
  def concurrently[T](thunks: Seq[() => T]): Seq[T] = {
    val tasks = thunks.map { t =>
      val ft = new java.util.concurrent.FutureTask[T](() => t())
      val th = new Thread(ft)
      th.setDaemon(true)
      th.start()
      ft
    }
    val results = tasks.map { ft =>
      try Right(ft.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          Left(e.getCause)
      }
    }
    results.collectFirst { case Left(e) => throw e }
    results.collect { case Right(v) => v }
  }

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
