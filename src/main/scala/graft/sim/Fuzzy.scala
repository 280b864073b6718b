package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Fuzzy top-1 join: for every left row, the single right row whose
    * `rightKey` best matches `leftKey` (reference's per-partition
    * `process.extract(limit=1)` O(n²) loop, get_similarity.py:148-152).
    *
    * Plan shape: broadcast nested-loop cross join (right side is expected
    * small — e.g. daily-partition candidates) scored by `levenshteinRatio`,
    * then window top-1 per left key. At 100 TB the left side streams
    * through executors against the broadcast right side: no shuffle of the
    * big side except the final per-key window, which partitions on the
    * left key. For a large right side, pre-band by length/prefix first
    * (SimilarityTopKJoinStrategy — SURVEY §4, later round).
    *
    * Ties broken by ascending right key for determinism.
    */
  def fuzzyTop1Join(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    scoreCol: String = "similarity"): DataFrame = {
    val l = left.select(col(leftKey)).distinct()
    val r = broadcast(right.select(col(rightKey)).distinct())
    val scored = l.crossJoin(r)
      .withColumn(scoreCol, levenshteinRatio(col(leftKey), col(rightKey)))
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col(scoreCol).desc, col(rightKey).asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
