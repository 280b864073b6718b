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
}
