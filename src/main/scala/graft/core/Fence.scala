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

  /** Lazy variant for plans that contain a shuffle: [[apply]] is lazy
    * about its DATA but materializing the checkpoint RDD still forces
    * AQE to execute every upstream exchange as serialized driver-side
    * jobs at plan-construction time — each fenced shuffle becomes a
    * barrier BEFORE the operator's own job starts (measured ~2 s of
    * pure overhead per operator at sf0.1 for the group-collapse
    * aggregate). `persist` instead substitutes an InMemoryRelation for
    * every reference at analysis time: computed once inside the first
    * job that needs it, shared by all references, zero plan-time work.
    * The cache entry is freed with the session's other caches (the
    * bench scrubs via `clearCache`); like [[apply]], executor loss
    * recomputes from lineage. Prefer [[apply]] for per-row derivation
    * pipelines (no shuffle — nothing to execute eagerly, and
    * checkpoint blocks skip the columnar encode); prefer this for
    * fencing aggregates/joins referenced more than once. */
  def soft(df: DataFrame): DataFrame = df.persist()
}
