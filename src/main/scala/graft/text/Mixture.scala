package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture assembly: per-language token budgets — the step that
  * turns a filtered corpus into a training MIX ("keep the best N tokens
  * of each language"). Semantics: within each language, order documents
  * by (quality DESC, id ASC) and keep the longest prefix whose running
  * token total stays within the budget.
  *
  * Scale design — the naive form is one `SUM OVER (PARTITION BY lang
  * ORDER BY ...)` window, which serializes EVERY document of a language
  * through one task; at 100 TB a single language is most of the corpus,
  * so the prefix must be found without a corpus-wide sequential pass.
  * Two stages:
  *   A. quality is bucketed (`floor(q * buckets)`, quality-monotone by
  *      construction) and one hash aggregate computes per-(lang, bucket)
  *      token sums — `langs × buckets` rows, a driver-side constant by
  *      contract (the IVF-centroid bound), where the budget boundary
  *      bucket and its prefix offset are found per language;
  *   B. buckets strictly above the boundary are kept OUTRIGHT (their
  *      cumulative sum fits the budget by construction), buckets below
  *      are dropped outright, and only the BOUNDARY bucket — population
  *      ~ budget-sized, not corpus-sized — runs the per-language
  *      running-sum window, offset by stage A's prefix total.
  * The result is row-identical to the global window (bucketing is
  * order-consistent: every doc in a higher bucket outranks every doc in
  * a lower one, and within-bucket order is the global order), which is
  * exactly what the DuckDB oracle computes. Degenerate case, stated:
  * a language whose quality mass collapses into ONE bucket (e.g. all
  * docs identical quality) windows that whole language — the naive
  * plan, paid only where quality genuinely cannot discriminate.
  */
object Mixture {

  /** Driver-side cap on stage A's (lang, bucket) aggregate. The
    * `langs × buckets` bound is a CONTRACT (lang is a language code,
    * not free text); a dirty high-cardinality lang column would
    * otherwise collect O(corpus) rows and OOM the driver silently.
    * 2^20 rows (~tens of MB) is orders of magnitude past any real
    * language inventory × 256 buckets — hitting it means the contract
    * is violated, which must surface as an error, not an OOM. */
  val MaxLangGroups: Int = 1 << 20

  /** Rows of `docs` kept by the per-language token budget, emitting
    * (id, lang, n_toks). `qualCol` must be engine-deterministic (e.g.
    * [[TextAnalysis.qualityScore]], gate-pinned) and in [0, 1]. */
  def tokenBudgetSample(docs: DataFrame, idCol: String, langCol: String,
                        tokCol: Column, qualCol: Column, budget: Long,
                        buckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = docs.sparkSession
    // quality 1.0 lands in the top bucket (clamp), keeping bucketing
    // monotone: higher quality -> same or higher bucket
    val bk = least(floor(qualCol * lit(buckets)).cast("int"),
      lit(buckets - 1))
    val base = graft.core.Fence.soft(docs.select(
      col(idCol).cast("long").as("id"), col(langCol).as("lang"),
      tokCol.cast("long").as("n_toks"), qualCol.as("q"), bk.as("bk")))
    // stage A: (lang, bucket) token sums -> per-lang boundary + offset.
    // Bounded driver state by contract (langs × buckets rows) — and
    // the contract is ENFORCED: the collect is capped and over-cap
    // fails loudly instead of letting a dirty lang column OOM the
    // driver (see [[MaxLangGroups]]).
    val sumRows = base.groupBy(col("lang"), col("bk"))
      .agg(sum(col("n_toks")).as("tsum"))
      .limit(MaxLangGroups + 1)
      .collect()
    require(sumRows.length <= MaxLangGroups,
      s"Mixture.tokenBudgetSample: more than $MaxLangGroups " +
        "(lang, bucket) groups — the lang column is not a bounded " +
        "language inventory (free text?); refusing to collect " +
        "corpus-scale driver state. Clean the lang column or bucket " +
        "it upstream.")
    val sums = sumRows
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val cuts: Seq[(String, Int, Long)] = sums.groupBy(_._1).map {
      case (lang, rows) =>
        var acc = 0L
        var boundary = -1 // -1: the whole language fits the budget
        var offset = 0L
        rows.sortBy(-_._2).foreach { case (_, b, tsum) =>
          if (boundary == -1) {
            if (acc + tsum > budget) { boundary = b; offset = acc }
            else acc += tsum
          }
        }
        (lang, boundary, offset)
    }.toSeq
    import spark.implicits._
    val cutDf = broadcast(
      cuts.toDF("__clang", "__boundary", "__offset"))
    // null-safe equality: a null language is its own budget group, the
    // same grouping PARTITION BY gives the oracle's window
    val tagged = base.join(cutDf, col("lang") <=> col("__clang"), "left")
      .drop("__clang")
    val keptOutright = tagged.filter(
      col("__boundary") === -1 || col("bk") > col("__boundary"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("q").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = tagged.filter(col("bk") === col("__boundary"))
      .withColumn("__cum", col("__offset") + sum(col("n_toks")).over(w))
      .filter(col("__cum") <= budget)
    keptOutright.select(col("id"), col("lang"), col("n_toks"))
      .unionByName(
        boundaryKept.select(col("id"), col("lang"), col("n_toks")))
  }

  /** DuckDB rendering over `docsTable`: the one-window reference form
    * [[tokenBudgetSample]] is row-identical to. `tokSql`/`qualSql` are
    * SQL expressions over the table's columns. */
  def tokenBudgetSampleSql(docsTable: String, idCol: String,
                           langCol: String, tokSql: String,
                           qualSql: String, budget: Long): String =
    s"""WITH scored AS (SELECT $idCol AS id, $langCol AS lang,
          CAST($tokSql AS BIGINT) AS n_toks, $qualSql AS q
          FROM $docsTable),
        c AS (SELECT id, lang, n_toks,
            SUM(n_toks) OVER (PARTITION BY lang
              ORDER BY q DESC, id ASC
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM scored)
        SELECT id, lang, n_toks FROM c WHERE cum <= $budget
        ORDER BY id"""

  /** Curriculum tiles: every document's exact global quality rank and
    * its quantile tile (1..`tiles`, tile 1 = best) — the ordering a
    * curriculum schedule trains through ("easy/clean first") and the
    * label quality-stratified evaluation samples by. Rank is the
    * position under (score DESC, id ASC); tile is the exact integer
    * quantile `((rank−1)·tiles) div N + 1`, so tile sizes differ by at
    * most one.
    *
    * Scale shape — the naive form is `row_number() OVER (ORDER BY
    * score DESC)`: ONE task sorts the whole corpus. Here the
    * [[tokenBudgetSample]] two-stage pattern computes the same rank
    * without a global window: scores bucket into `buckets`
    * order-consistent slabs (equal scores land in the SAME slab, so
    * cross-slab ties are impossible), one bounded aggregate counts
    * each slab, slab OFFSETS come from that driver-bounded frame
    * (≤ `buckets` rows — the [[MaxLangGroups]] contract class), and
    * only WITHIN-slab windows run: rank = slab offset + within-slab
    * row_number. Row-identical to the global window, which is exactly
    * what the oracle computes. `scoreCol` must be engine-deterministic
    * and in [0, 1]. Output: (id, rank, tile). */
  def qualityTiles(docs: DataFrame, idCol: String, scoreCol: Column,
                   tiles: Int, buckets: Int = 256): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val bk = least(floor(scoreCol * lit(buckets)).cast("int"),
      lit(buckets - 1))
    val base = graft.core.Fence.soft(docs.select(
      col(idCol).as("id"), scoreCol.as("__q"), bk.as("__bk")))
    val counts = base.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val n = counts.map(_._2).sum
    if (n == 0L)
      return base.select(col("id"), lit(0L).as("rank"),
        lit(0).as("tile")).limit(0)
    // offset(b) = docs in HIGHER slabs (they all outrank slab b)
    val offsets = counts.map { case (b, _) =>
      (b, counts.filter(_._1 > b).map(_._2).sum)
    }.toDF("__bk", "__off")
    val w = Window.partitionBy(col("__bk"))
      .orderBy(col("__q").desc, col("id").asc)
    base.join(broadcast(offsets), Seq("__bk"))
      .withColumn("rank",
        col("__off") + row_number().over(w).cast("long"))
      .withColumn("tile",
        expr(s"CAST(((rank - 1) * $tiles) DIV $n AS INT) + 1"))
      .select(col("id"), col("rank"), col("tile"))
  }

  /** DuckDB rendering of [[qualityTiles]] — the one-window reference
    * form it is row-identical to (exact integer division, same tie
    * order). */
  def qualityTilesSql(docsTable: String, idSql: String,
                      scoreSql: String, tiles: Int): String =
    s"""WITH s AS (SELECT $idSql AS id, $scoreSql AS q
          FROM $docsTable),
        r AS (SELECT id, CAST(row_number() OVER (
            ORDER BY q DESC, id ASC) AS BIGINT) AS rank FROM s)
        SELECT id, rank,
          CAST(((rank - 1) * $tiles) // (SELECT COUNT(*) FROM s)
            AS INT) + 1 AS tile
        FROM r ORDER BY id"""

  /** Temperature-reweighted sampling mixture — the standard public
    * answer to "the head language swamps the tail": raw token shares
    * p_g = n_g/Σn are flattened to p_g ∝ n_g^α (α < 1 upsamples the
    * tail), and each group's repeat factor is how many epochs of it a
    * token budget B implies (> 1 = the group repeats, the multilingual
    * training signal every mixture paper reports). Output per group:
    * (group, n_toks, raw_share, adj_share, repeat_factor =
    * (adj_share · B)/n_g).
    *
    * α is restricted to 2^-halvings (1, 0.5, 0.25, …): the power is
    * then an exact IEEE sqrt chain, bit-replayable on any engine —
    * arbitrary α is one pow() away but libm-dependent in the last
    * bit, which would poison the share hashes. The share denominators
    * are summed as floor(s·2²⁰ + 0.5) integers (order-free) and
    * divided back — the kmeans-mean determinism trick — so shares are
    * identical however the group partials arrive.
    *
    * Scale: one hash aggregate to the per-group token totals (the
    * MaxLangGroups contract bounds the group count), one 1-row total
    * crossJoin — no window, no driver state. */
  def temperatureWeights(docs: DataFrame, groupCol: String,
                         tokCol: Column, budget: Long,
                         halvings: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(halvings >= 0 && halvings <= 8,
      s"halvings must be in [0, 8], got $halvings")
    val g = docs.groupBy(col(groupCol).as("grp"))
      .agg(sum(tokCol.cast("long")).as("n_toks"))
    val s = (1 to halvings).foldLeft(col("n_toks").cast("double")) {
      (c, _) => sqrt(c)
    }
    val withS = g.withColumn("__si",
      floor(s * lit(1048576.0) + lit(0.5)).cast("long"))
    val tot = withS.agg(sum(col("__si")).as("__stot"),
      sum(col("n_toks")).as("__ntot"))
    val adj = col("__si").cast("double") / col("__stot").cast("double")
    withS.crossJoin(broadcast(tot))
      .select(col("grp"), col("n_toks"),
        (col("n_toks").cast("double") / col("__ntot").cast("double"))
          .as("raw_share"),
        adj.as("adj_share"),
        ((adj * lit(budget.toDouble)) / col("n_toks").cast("double"))
          .as("repeat_factor"))
  }

  /** DuckDB rendering of [[temperatureWeights]] — the identical sqrt
    * chain, integer-quantized denominators and division shapes. */
  def temperatureWeightsSql(docsTable: String, groupSql: String,
                            tokSql: String, budget: Long,
                            halvings: Int = 1): String = {
    val s = (1 to halvings).foldLeft("CAST(n_toks AS DOUBLE)") {
      (c, _) => s"sqrt($c)"
    }
    s"""WITH g AS (SELECT $groupSql AS grp,
          CAST(SUM(CAST($tokSql AS BIGINT)) AS BIGINT) AS n_toks
          FROM $docsTable GROUP BY 1),
        si AS (SELECT grp, n_toks,
            CAST(FLOOR($s * 1048576.0 + 0.5) AS BIGINT) AS si FROM g),
        tot AS (SELECT CAST(SUM(si) AS BIGINT) AS stot,
            CAST(SUM(n_toks) AS BIGINT) AS ntot FROM si)
        SELECT grp, n_toks,
          CAST(n_toks AS DOUBLE) / CAST(ntot AS DOUBLE) AS raw_share,
          CAST(si AS DOUBLE) / CAST(stot AS DOUBLE) AS adj_share,
          ((CAST(si AS DOUBLE) / CAST(stot AS DOUBLE)) * $budget.0)
            / CAST(n_toks AS DOUBLE) AS repeat_factor
        FROM si CROSS JOIN tot ORDER BY grp"""
  }
}
