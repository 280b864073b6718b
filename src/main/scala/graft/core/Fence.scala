package graft.core

import org.apache.spark.sql.DataFrame

/** Optimizer fence: evaluate the frame's plan at this point, hide it
  * behind a LogicalRDD, and cache the computed partitions.
  *
  * Catalyst's project collapsing inlines computed columns into every
  * downstream reference; when an expensive array column (shingle hashes,
  * minhash signatures) feeds a Generate (explode) or a self-join, the
  * whole producing pipeline is re-evaluated per reference — turning an
  * O(n)-per-row column into O(n²)-per-row work (measured 50-100×
  * slowdowns). The fence pins such columns to "computed exactly once".
  *
  * Implementation is a lazy local checkpoint: unlike a bare
  * `createDataFrame(df.rdd, schema)` round-trip (which re-runs the
  * lineage — with per-element boxing — once per *reference* to the
  * fenced frame; measured 5× wall and GC-storm variance on the LSH
  * pipelines), the checkpointed partitions are computed once, stored as
  * internal rows, and reused by every downstream join/explode. Blocks
  * are freed by the ContextCleaner when the RDD is collected. At
  * cluster scale note localCheckpoint's caveat: executor loss discards
  * blocks — a long-lived production pipeline would persist to a real
  * table/checkpoint instead; the operators only fence frames that are
  * small per-doc derivations (signatures, shingle hashes), recomputable
  * by rerunning the stage.
  */
object Fence {
  def apply(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
}
