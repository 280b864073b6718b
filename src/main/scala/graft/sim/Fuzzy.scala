package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string similarity (reference: fuzzywuzzy WRatio scoring at
  * /root/reference/get_similarity.py:148-152; normalized-levenshtein is the
  * documented stand-in per SURVEY §7.4(6)).
  */
object Fuzzy {

  /** Similarity ratio in [0,100]: floor(100 * (1 - lev / max(len))).
    * Integer-exact (floor over exact small-int doubles) so a SQL oracle
    * reproduces it bit-for-bit. Null if either side is null; 100 for two
    * empty strings.
    */
  def levenshteinRatio(a: Column, b: Column): Column = {
    val maxLen = greatest(length(a), length(b))
    when(a.isNull || b.isNull, lit(null))
      .when(maxLen === 0, lit(100))
      .otherwise(floor(lit(100.0) * (maxLen - levenshtein(a, b)) / maxLen)
        .cast("int"))
  }

  /** Fuzzy top-1 join: attach to every left row the single right row whose
    * `rightKey` best matches `leftKey` (reference's per-partition
    * `process.extract(limit=1)` O(n²) loop, get_similarity.py:148-152,
    * which merges the winner back onto the full frame).
    *
    * Plan shape, chosen for scale:
    *  - score distinct left keys against the broadcast distinct right side
    *    (left streams through executors — no shuffle of the big side);
    *  - arg-max via `max(struct(score, rightKey))` — a hash aggregate with
    *    map-side partial aggregation, so the |L|·|R| scored rows collapse
    *    to |distinct L| *before* the shuffle (a window top-1 would shuffle
    *    all |L|·|R| rows);
    *  - left-join the winners back so callers get the full row payload.
    * For a large right side, pre-band with [[fuzzyTop1JoinBanded]].
    *
    * Ties broken by the *greatest* right key at the max score (struct
    * ordering), deterministically.
    */
  import graft.core.Par.fanOut

  /** Token-sort ratio (SURVEY §7.4(6)): the levenshtein ratio over
    * whitespace tokens sorted lexicographically — fuzzywuzzy's
    * token_sort_ratio, the component of WRatio that makes word-order
    * permutations score 100. Pure builtins, fully codegen-compatible. */
  def tokenSortRatio(a: Column, b: Column): Column = {
    def normalize(c: Column): Column =
      array_join(sort_array(split(c, " +")), " ")
    levenshteinRatio(normalize(a), normalize(b))
  }

  def fuzzyTop1Join(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    scoreCol: String = "similarity"): DataFrame = {
    val l = fanOut(left.select(col(leftKey)).distinct())
    val r = broadcast(right.select(col(rightKey)).distinct())
    val scored = l.crossJoin(r)
      .withColumn(scoreCol, levenshteinRatio(col(leftKey), col(rightKey)))
    val best = scored.groupBy(col(leftKey))
      .agg(max(struct(col(scoreCol), col(rightKey))).as("__best"))
      .select(col(leftKey),
              col("__best").getField(rightKey).as(rightKey),
              col("__best").getField(scoreCol).as(scoreCol))
    left.join(best, Seq(leftKey), "left")
  }

  /** Generalized top-k: the k best right matches per left key (the
    * reference's `process.extract(limit=k)` for k > 1). k is small by
    * contract, so the per-key window is bounded; output keeps the full
    * left payload, one row per (left row, rank). */
  def fuzzyTopKJoin(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String, k: Int,
                    scoreCol: String = "similarity"): DataFrame = {
    require(k >= 1)
    val l = fanOut(left.select(col(leftKey)).distinct())
    val r = broadcast(right.select(col(rightKey)).distinct())
    val scored = l.crossJoin(r)
      .withColumn(scoreCol, levenshteinRatio(col(leftKey), col(rightKey)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(leftKey))
      .orderBy(col(scoreCol).desc, col(rightKey).desc)
    val topK = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    left.join(topK, Seq(leftKey), "left")
  }

  /** Thresholded ratio: the similarity when it is >= minScore, else null.
    * The bound is exact: `ratio >= s ⇔ dist <= floor(len·(100−s)/100)`,
    * so the 3-arg bounded levenshtein (banded DP with early exit,
    * O(cap·n) instead of O(n²)) is the fast path whenever the pair's
    * distance budget fits under `distCap`; longer strings take the rare
    * full-DP branch, keeping the result exact for any input. */
  def levenshteinRatioBounded(a: Column, b: Column, minScore: Int,
                              distCap: Int = 8): Column = {
    val maxLen = greatest(length(a), length(b))
    val maxDist = floor((maxLen * (100 - minScore)) / 100).cast("int")
    val fast = levenshtein(a, b, distCap)
    val dist = when(maxDist <= distCap,
        when(fast >= 0 && fast <= maxDist, fast))
      .otherwise(when(levenshtein(a, b) <= maxDist, levenshtein(a, b)))
    when(a.isNull || b.isNull, lit(null))
      .when(maxLen === 0, lit(100))
      .otherwise(floor(lit(100.0) * (maxLen - dist) / maxLen).cast("int"))
  }

  /** Scale path for a right side too large to broadcast: candidate pairs
    * are restricted to length-compatible bands before scoring, and
    * scoring itself is the bounded-DP ratio.
    *
    * Exactness: `ratio(a,b) >= minScore` implies
    * `|len(a)-len(b)| <= (1-minScore/100)*max(len)`, so replicating each
    * right key across its compatible integer lengths and equi-joining on
    * the left length loses no pair at or above the threshold. Rows whose
    * best match scores below `minScore` come back with a null match (the
    * reference itself bands such rows as no-match downstream,
    * get_similarity.py:185-188).
    *
    * Shuffles: one hash shuffle of each side on the band key (an
    * equi-join Catalyst can plan as sort-merge at any scale), then the
    * same partial-agg arg-max as [[fuzzyTop1Join]].
    *
    * `saltBuckets` picks the physical strategy for the band join:
    *  - 0 (default): broadcast the banded right side. The join
    *    degenerates to few hot band keys when lengths concentrate, and a
    *    plain shuffle join would put every pair of a hot band in one
    *    task; broadcast-hash keeps the big left side streaming in
    *    parallel.
    *  - N > 0: the fallback when the banded right side exceeds broadcast
    *    scale — salt the band key N ways: each left row takes a
    *    deterministic salt `hash(leftKey) mod N`, each banded right row
    *    is replicated across all N salts, and the join runs as a plain
    *    shuffle equi-join on (band, salt). A hot band now spreads over N
    *    tasks at the cost of an N× right-side replication (right is the
    *    smaller side by contract). Output is identical to the broadcast
    *    path: every (left, compatible-right) pair still meets exactly
    *    once.
    */
  def fuzzyTop1JoinBanded(left: DataFrame, leftKey: String,
                          right: DataFrame, rightKey: String,
                          minScore: Int = 60,
                          scoreCol: String = "similarity",
                          saltBuckets: Int = 0): DataFrame = {
    require(minScore > 0 && minScore <= 100)
    val tol = 1.0 - minScore / 100.0
    val l = fanOut(left.select(col(leftKey)).distinct())
      .withColumn("__llen", length(col(leftKey)))
    // a pair (la, lb) with ratio >= minScore has |la-lb| <= tol*max(la,lb)
    val r = right.select(col(rightKey)).distinct()
      .withColumn("__rlen", length(col(rightKey)))
      .withColumn("__band",
        explode(sequence(ceil(col("__rlen") * (1.0 - tol)).cast("int"),
                         floor(col("__rlen") / (1.0 - tol)).cast("int"))))
    val joined =
      if (saltBuckets <= 0) l.join(broadcast(r), col("__llen") === col("__band"))
      else {
        val ls = l.withColumn("__lsalt",
          pmod(hash(col(leftKey)), lit(saltBuckets)))
        val rs = r.withColumn("__rsalt",
          explode(array((0 until saltBuckets).map(lit): _*)))
        ls.join(rs, col("__llen") === col("__band") &&
                    col("__lsalt") === col("__rsalt"))
      }
    val scored = joined
      .withColumn(scoreCol,
        levenshteinRatioBounded(col(leftKey), col(rightKey), minScore))
      .filter(col(scoreCol).isNotNull)
    val best = scored.groupBy(col(leftKey))
      .agg(max(struct(col(scoreCol), col(rightKey))).as("__best"))
      .select(col(leftKey),
              col("__best").getField(rightKey).as(rightKey),
              col("__best").getField(scoreCol).as(scoreCol))
    left.join(best, Seq(leftKey), "left")
  }
}
