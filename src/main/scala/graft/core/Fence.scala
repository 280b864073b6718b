package graft.core

import org.apache.spark.sql.DataFrame

/** Optimizer fence: evaluate the frame's plan at this point and hide it
  * behind a LogicalRDD.
  *
  * Catalyst's project collapsing inlines computed columns into every
  * downstream reference; when an expensive array column (shingle hashes,
  * minhash signatures) feeds a Generate (explode) or a self-join, the
  * whole producing pipeline is re-evaluated per reference — turning an
  * O(n)-per-row column into O(n²)-per-row work (measured 50-100×
  * slowdowns). The fence pins such columns to "computed exactly once":
  * rows stream through (no shuffle, no caching), and the optimizer sees
  * an opaque leaf it cannot merge into.
  */
object Fence {
  def apply(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
}
