package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Fence, SkewJoin}

/** Exact group-collapse of shingle-set-identical documents — the shared
  * skew containment of the set-similarity self-joins ([[MinHashLSH]],
  * [[JaccardJoin]]).
  *
  * Docs with the same shingle SET are indistinguishable to every stage
  * of a set-similarity pipeline: signatures, band keys, prefix tokens,
  * sizes, sketches and the exact Jaccard against any third doc are all
  * functions of the set alone. A crawl corpus's boilerplate/mirror
  * groups (thousands of set-identical docs) would otherwise all land in
  * the same band/prefix buckets, and a bucket self-join enumerates
  * O(group²) pairs inside one task. Running the pipeline on one
  * representative per group makes the degenerate case O(groups), and
  * recovery is EXACT: a member pair across two groups inherits its
  * representatives' verified score verbatim, and within-group pairs
  * have J = 1.0 ≥ t by definition (identical non-empty sets).
  *
  * The group key is md5 over the sorted shingle hashes (the dd01
  * fingerprint contract — 128-bit collisions are below operational
  * probability); docs with null/empty shingle sets stay ungrouped and
  * flow through the pipeline unchanged (they can never verify at any
  * t > 0, exactly as before).
  */
private[sim] object GroupCollapse {

  /** Exact set-identity key over a `sh` shingle-array column; null for
    * null/empty sets (those rows stay ungrouped). */
  def setKey: Column =
    when(col("sh").isNotNull && size(col("sh")) > 0,
      md5(concat_ws(",", array_sort(col("sh")).cast("array<string>"))))

  /** (keyed, groups, reps) for an (id, sh, …) frame: the input with a
    * `gk` column, the (gk, rep_id) group table, and the frame filtered
    * to one smallest-id representative per group (plus every ungrouped
    * null-key row), `gk` dropped. Ids must be integral
    * ([[SetVerify.requireIntegralIds]] — enforced by callers). */
  def collapse(frame: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val keyed = Fence(frame.withColumn("gk", setKey))
    val groups = Fence(keyed.filter(col("gk").isNotNull)
      .groupBy(col("gk"))
      .agg(min(col("id").cast("long")).as("rep_id")))
    val reps = keyed.filter(col("gk").isNull).unionByName(
      keyed.join(groups.select(col("rep_id").as("__rid")),
        col("id").cast("long") === col("__rid"), "left_semi"))
      .drop("gk")
    (keyed, groups, reps)
  }

  /** Exact recovery: expand rep-level verified pairs
    * (doc_a, doc_b, `scoreCol`) to member level — cross-group pairs
    * inherit the rep pair's score (id-equi-joins to the group keys,
    * then gk-equi-joins to the members, replicating by group size,
    * never by pair volume squared) — and append within-group pairs at
    * score 1.0 through the guarded gk self-join, so a huge duplicate
    * group emits its inherent O(g²) OUTPUT rows across salted tasks. */
  def expand(repPairs: DataFrame, keyed: DataFrame, groups: DataFrame,
             scoreCol: String): DataFrame = {
    val mem = keyed.filter(col("gk").isNotNull)
      .select(col("gk"), col("id").cast("long").as("id"))
    val repGk = groups.select(col("rep_id"), col("gk"))
    val cross = repPairs
      .join(repGk.select(col("rep_id").as("doc_a"), col("gk").as("gk_a")),
        Seq("doc_a"))
      .join(repGk.select(col("rep_id").as("doc_b"), col("gk").as("gk_b")),
        Seq("doc_b"))
      .join(mem.select(col("gk").as("gk_a"), col("id").as("id_a")),
        Seq("gk_a"))
      .join(mem.select(col("gk").as("gk_b"), col("id").as("id_b")),
        Seq("gk_b"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
              greatest(col("id_a"), col("id_b")).as("doc_b"),
              col(scoreCol))
    val within = SkewJoin.guardedPairs(mem, mem, Seq("gk"),
        selfJoin = true, MinHashLSH.HotBucketCap,
        MinHashLSH.HotBucketSalts) { j =>
      j.select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        lit(1.0).as(scoreCol))
    }
    cross.unionByName(within)
  }
}
