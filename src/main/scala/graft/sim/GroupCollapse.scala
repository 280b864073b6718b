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
  * The group key is two independent xxhash64 values over the sorted
  * shingle hashes — 128 combined bits, the dd01 fingerprint contract
  * (collisions below operational probability) without materializing a
  * per-row string of the whole array the way md5(concat_ws(...)) would.
  * Docs with null/empty shingle sets stay ungrouped and flow through
  * the pipeline unchanged (they can never verify at any t > 0, exactly
  * as before).
  *
  * Cost discipline (the non-skewed corpus pays this on every run, so
  * it is kept near-zero):
  *  - only the narrow (id, gk) projection is fenced — the caller's
  *    already-fenced wide frame (shingles + signatures) is never
  *    re-materialized;
  *  - whether any multi-member group exists is decided ONCE, with one
  *    aggregate over the fenced narrow frame ([[Collapsed.hasMulti]]).
  *    Without one, the collapse is the identity: [[Collapsed.reps]] IS
  *    the input (no semi-join) and [[expand]] returns the verified
  *    pairs verbatim (no tag joins, no member joins, no within
  *    self-join) — the operator's plan is exactly the uncollapsed one.
  */
private[sim] object GroupCollapse {

  /** Exact 128-bit set-identity key over a `sh` shingle-array column;
    * null for null/empty sets (those rows stay ungrouped). */
  def setKey: Column =
    when(col("sh").isNotNull && size(col("sh")) > 0,
      struct(xxhash64(array_sort(col("sh"))).as("h1"),
             xxhash64(array_sort(col("sh")), lit(1)).as("h2")))

  /** The collapse of one input frame: the fenced narrow (id, gk)
    * projection, the fenced (gk, rep_id, g_n) group table, the frame
    * to run the pipeline on (one smallest-id representative per group
    * plus every ungrouped row — or the input itself when no group has
    * two members), and whether any multi-member group exists. */
  final case class Collapsed(gkFrame: DataFrame, groups: DataFrame,
                             reps: DataFrame, hasMulti: Boolean)

  /** Collapse an (id, sh, …) frame. The caller's frame should already
    * be fenced (both call sites fence their shingle frames); collapse
    * adds no wide materialization of its own. Ids must be integral
    * ([[SetVerify.requireIntegralIds]] — enforced by callers). */
  def collapse(frame: DataFrame): Collapsed = {
    val gkFrame = Fence(frame.select(col("id").cast("long").as("id"),
      setKey.as("gk")))
    val groups = Fence(gkFrame.filter(col("gk").isNotNull)
      .groupBy(col("gk"))
      .agg(min(col("id")).as("rep_id"), count(lit(1)).as("g_n")))
    val hasMulti = !groups.filter(col("g_n") > 1).isEmpty
    val reps =
      if (!hasMulti) frame
      else frame
        .join(groups.select(col("rep_id").as("__rid")),
          col("id").cast("long") === col("__rid"), "left_semi")
        .unionByName(frame.filter(col("sh").isNull ||
          size(col("sh")) === 0))
    Collapsed(gkFrame, groups, reps, hasMulti)
  }

  /** Exact recovery: expand rep-level verified pairs
    * (doc_a, doc_b, `scoreCol`) to member level. With no multi-member
    * group the verified pairs already ARE the member pairs — returned
    * verbatim. Otherwise pairs touching no multi-member group pass
    * through two left joins against the small multi-group rep table;
    * a pair whose side(s) represent multi-member groups replicates
    * through gk-equi-joins to the members, by group size, never by
    * pair volume squared; and within-group pairs ride the guarded gk
    * self-join at score 1.0, so a huge duplicate group emits its
    * inherent O(g²) OUTPUT rows across salted tasks. */
  def expand(repPairs: DataFrame, c: Collapsed,
             scoreCol: String): DataFrame = {
    val asLong = repPairs.select(col("doc_a").cast("long").as("doc_a"),
      col("doc_b").cast("long").as("doc_b"), col(scoreCol))
    if (!c.hasMulti) return asLong
    val multi = c.groups.filter(col("g_n") > 1)
    val memMulti = c.gkFrame
      .join(multi.select(col("gk")), Seq("gk"), "left_semi")
    val tagged = asLong
      .join(multi.select(col("rep_id").as("doc_a"), col("gk").as("gk_a")),
        Seq("doc_a"), "left")
      .join(multi.select(col("rep_id").as("doc_b"), col("gk").as("gk_b")),
        Seq("doc_b"), "left")
    val pass = tagged.filter(col("gk_a").isNull && col("gk_b").isNull)
      .select(col("doc_a"), col("doc_b"), col(scoreCol))
    val touched = tagged
      .filter(col("gk_a").isNotNull || col("gk_b").isNotNull)
      .join(memMulti.select(col("gk").as("gk_a"), col("id").as("id_a")),
        Seq("gk_a"), "left")
      .join(memMulti.select(col("gk").as("gk_b"), col("id").as("id_b")),
        Seq("gk_b"), "left")
      .select(
        least(coalesce(col("id_a"), col("doc_a")),
              coalesce(col("id_b"), col("doc_b"))).as("doc_a"),
        greatest(coalesce(col("id_a"), col("doc_a")),
                 coalesce(col("id_b"), col("doc_b"))).as("doc_b"),
        col(scoreCol))
    val within = SkewJoin.guardedPairs(memMulti, memMulti, Seq("gk"),
        selfJoin = true, MinHashLSH.HotBucketCap,
        MinHashLSH.HotBucketSalts) { j =>
      j.select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        lit(1.0).as(scoreCol))
    }
    pass.unionByName(touched).unionByName(within)
  }
}
