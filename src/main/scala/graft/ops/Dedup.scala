package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * `dedupKeepLast` generalizes pandas `drop_duplicates(subset, keep='last')`
  * (reference: /root/reference/assos_validation_retreatment.py:106), whose
  * semantics depend on implicit row order. Spark has no implicit order, so
  * the caller names an explicit ordering column (batch timestamp, priority,
  * file order) — SURVEY §7.4(1).
  *
  * At scale this is a single hash-shuffle on `keys` (window partitionBy);
  * no driver collection, skew-safe under AQE.
  */
object Dedup {

  /** Keep, per key group, the single row with the greatest `order` value
    * (ties broken by `tieBreak` ascending so the result is deterministic).
    */
  def dedupKeepLast(df: DataFrame, keys: Seq[String], order: Column,
                    tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.desc, tieBreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup: group rows by a fingerprint of `contentCol`,
    * keep the representative with the smallest `idCol`. One shuffle on the
    * fingerprint; at 100 TB the md5 keys distribute uniformly (no skew).
    */
  def exactDedup(df: DataFrame, contentCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(contentCol)).orderBy(idCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Connected components over an undirected pair list — the missing
    * end-game of every near-dup family (dd02–dd06 emit PAIRS; removing
    * duplicates transitively needs components: A~B and B~C must kill C
    * even when A!~C). Generalizes the reference's 2-row degenerate case,
    * pandas keep-last dedup (assos_validation_retreatment.py:106), to
    * arbitrary similarity graphs.
    *
    * Algorithm: iterative min-label propagation with pointer jumping.
    * Every node starts labeled with its own id; each round every node
    * takes the minimum of its own label, its neighbors' labels, and —
    * the pointer-jumping step — its label's label (`l(v) ←
    * min(l(v), l(l(v))`, one extra equi-join against the same
    * checkpointed label frame). Propagation alone needs rounds ≈
    * component diameter; the jump doubles the distance a label has
    * travelled each round (on a chain the reach after round k is
    * 2^(k+1)−2), so convergence is O(log diameter) — a 1,000-node
    * chain resolves in ~10 rounds instead of aborting at `maxRounds`
    * (pinned by a DedupFuzzySpec property). Each round is two
    * equi-joins + one partial-aggregated min — pure shuffle work, no
    * driver state beyond the convergence flag — and the per-round
    * frame is `localCheckpoint`ed so lineage stays constant across
    * rounds (the classic iterative-Spark trap). The jump preserves the
    * invariant that a node's label is an id inside its own component
    * (labels only ever flow along edges or to a label's own label), so
    * the fixpoint is unchanged: every node ends at its component's
    * minimum id — the same fixpoint the recursive-CTE oracle computes.
    *
    * Input columns `idA`/`idB` (long-castable); output (id, label) for
    * every id appearing in any pair, label = min id of its component.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b",
                          maxRounds: Int = 50): DataFrame = {
    // fwd is checkpointed BEFORE the symmetric union: both union
    // branches reference it, and without the pin the entire upstream
    // pair-generation pipeline (e.g. dd07's MinHash banding + verify)
    // evaluates twice
    val fwd = pairs.select(col(idA).cast("long").as("src"),
      col(idB).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(false)
    // empty-graph fast exit: a pairless input (the common case for an
    // incremental batch with no internal near-dups) otherwise still
    // pays a full propagation round's worth of jobs on empty frames —
    // pure driver-latency waste; the probe runs on the blocks the
    // round would materialize anyway, so the non-empty path loses
    // nothing
    if (fwd.isEmpty)
      return fwd.select(col("src").as("id"), col("src").as("label"))
    val edges = fwd.union(fwd.select(col("dst").as("src"),
        col("src").as("dst")))
      .localCheckpoint(false)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    var round = 0
    var converged = false
    while (!converged) {
      round += 1
      require(round <= maxRounds,
        s"connectedComponents: no fixpoint after $maxRounds rounds — " +
          "component diameter exceeds the bound; raise maxRounds")
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("__nl"))
        .withColumnRenamed("src", "id")
      // the previous label rides along in the checkpointed frame, so
      // the convergence test is a scan of already-materialized blocks —
      // no extra join or recompute per round (labels are monotone
      // non-increasing, so "any row decreased" is the full condition)
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("__nl"), col("label")))
            .as("__pl"),
          col("label").as("__prev"))
      // pointer jumping against the ROUND-START labels (already
      // checkpointed — no recompute): every label value is some node's
      // id, so the lookup always lands; using the round-start table
      // instead of the in-flight one keeps this a single join without
      // re-materializing `propagated`
      val next = propagated.join(
          labels.select(col("id").as("__lid"), col("label").as("__ll")),
          col("__pl") === col("__lid"), "left")
        .select(col("id"),
          least(col("__pl"), coalesce(col("__ll"), col("__pl")))
            .as("label"),
          col("__prev"))
        .localCheckpoint(true)
      converged = next.filter(col("label") < col("__prev")).isEmpty
      // the superseded round's checkpoint blocks are reclaimed by the
      // ContextCleaner once this reassignment drops the last reference
      // (the Fence story); with near-dup components' shallow diameters
      // at most a handful of label snapshots ever coexist
      labels = next.drop("__prev")
    }
    labels
  }

  /** Near-dup cluster resolution: given the full corpus and a pair list
    * from any near-dup operator, keep one canonical row per similarity
    * cluster — the smallest id — and every row that appears in no pair.
    * Components via [[connectedComponents]]; the removal itself is a
    * single anti-join against the non-canonical ids, so the whole
    * operator is shuffle-only at any corpus size.
    */
  def clusterDedup(docs: DataFrame, idCol: String, pairs: DataFrame,
                   idA: String = "id_a", idB: String = "id_b",
                   maxRounds: Int = 50): DataFrame = {
    val losers = connectedComponents(pairs, idA, idB, maxRounds)
      .filter(col("label") =!= col("id"))
      .select(col("id").as("__loser"))
    docs.join(losers, docs(idCol).cast("long") === col("__loser"),
      "left_anti")
  }

  /** Oracle twin of the cluster resolution, as a CTE chain: given a
    * relation `pairsRel(idA, idB)`, defines `edges`, `reach` (the
    * recursive transitive closure — min over reachable ids = the same
    * fixpoint the label propagation converges to) and `losers` (every
    * id that is not its component's minimum). The caller splices this
    * after `WITH RECURSIVE` and anti-filters on `losers`. */
  def clusterLosersSql(pairsRel: String, idA: String,
                       idB: String): String =
    s"""edges AS (SELECT $idA AS src, $idB AS dst FROM $pairsRel
          UNION ALL SELECT $idB AS src, $idA AS dst FROM $pairsRel),
        reach(id, label) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        losers AS (SELECT id FROM (
          SELECT id, MIN(label) AS label FROM reach GROUP BY id)
          WHERE label <> id)"""

  /** [[clusterLosersSql]]'s sibling ending in `clabels(id, label)` —
    * every PAIRED id with its component's minimum id, the relation
    * [[leakageSafeSplit]]'s oracle left-joins (unpaired docs take
    * their own id downstream). */
  def clusterLabelsSql(pairsRel: String, idA: String,
                       idB: String): String =
    s"""edges AS (SELECT $idA AS src, $idB AS dst FROM $pairsRel
          UNION ALL SELECT $idB AS src, $idA AS dst FROM $pairsRel),
        reach(id, label) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        clabels AS (SELECT id, MIN(label) AS label FROM reach
          GROUP BY id)"""

  /** Leakage-safe train/eval split — the holdout hygiene step every
    * near-dup pipeline needs and a plain hash split gets WRONG: two
    * near-duplicate documents must never straddle the train/eval
    * boundary (the eval copy trains the model on its own test set),
    * so the split unit is the near-dup COMPONENT, not the document.
    * Every doc takes its component's minimum id as `cluster` (its own
    * id when it appears in no pair), and `split` is a deterministic
    * hash bucket OF THE CLUSTER: 'eval' when
    * substring(md5(cluster), 1, 2) < `evalCut`, else 'train' — the
    * corpus pipeline's sampling idiom, so 256 buckets, `evalCut` hex
    * ("29" ≈ 16%). By construction all members of a component share a
    * side; docs in no pair split independently and uniformly.
    *
    * Scale: components via [[connectedComponents]] (shuffle-only,
    * O(log diameter) rounds over PAIRS — the banded near-dup output,
    * linear-ish in the corpus), then ONE left equi-join against the
    * corpus and a per-row hash — no driver state, no skew (md5 keys
    * distribute uniformly whatever the cluster sizes). Output: the
    * doc columns + (cluster, split). */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       idA: String = "id_a", idB: String = "id_b",
                       evalCut: String = "29",
                       maxRounds: Int = 50): DataFrame = {
    val labels = connectedComponents(pairs, idA, idB, maxRounds)
      .select(col("id").as("__cc_id"), col("label").as("__cc_label"))
    docs.join(labels, docs(idCol).cast("long") === col("__cc_id"),
        "left")
      .withColumn("cluster",
        coalesce(col("__cc_label"), docs(idCol).cast("long")))
      .drop("__cc_id", "__cc_label")
      .withColumn("split",
        when(substring(md5(col("cluster").cast("string")), 1, 2)
            < lit(evalCut), "eval")
          .otherwise("train"))
  }
}
