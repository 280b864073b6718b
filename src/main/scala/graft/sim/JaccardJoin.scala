package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextHash

/** Exact n-gram Jaccard similarity self-join with PPJoin-style prefix
  * filtering — the *exact* (not approximate) scale path for similarity
  * dedup.
  *
  * Shingles are ordered rarest-first (global doc-frequency, then hash);
  * a pair with Jaccard >= t must share at least one element within each
  * side's first `n - ceil(t*n) + 1` shingles (prefix-filter lemma), so
  * joining on prefix shingles loses no qualifying pair while pruning the
  * O(n²) pair space. Candidates are then exact-verified. The oracle runs
  * the naive quadratic form — identical output, independent derivation.
  *
  * Shuffles: doc-frequency aggregation, the prefix-token equi-join, pair
  * dedup. Frequency ordering keeps hot shingles out of prefixes, which is
  * what bounds candidate blow-up on skewed vocabularies at scale.
  */
object JaccardJoin {

  /** Pairs (doc_a < doc_b) with exact shingle-Jaccard >= threshold.
    * Output: (doc_a, doc_b, jacc). */
  def selfJoin(docs: DataFrame, idCol: String, textCol: String,
               q: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      TextHash.shingleHashes(col(textCol), q).as("sh"))
    val ex = sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("h"))
    val freq = ex.groupBy(col("h")).agg(count(lit(1)).as("f"))
    // rarest-first rank; prefix length n - ceil(t*n) + 1 via exact
    // integer arithmetic (floating ceil could shrink the prefix by one
    // and break the containment guarantee)
    val tNum = math.round(threshold * 10).toInt
    val ranked = ex.join(freq, "h")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("f").asc, col("h").asc)))
      .withColumn("plen",
        col("n") - floor((col("n") * tNum + 9) / 10).cast("int") + 1)
    val prefix = ranked.filter(col("rnk") <= col("plen"))
      .select(col("id"), col("h"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val sa = sh.select(col("id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("jacc", inter.cast("double") / union)
      .filter(col("jacc") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jacc"))
  }

  /** Naive-quadratic oracle SQL — same output, independent plan. */
  def selfJoinSql(tbl: String, idCol: String, textCol: String,
                  q: Int = 3, threshold: Double = 0.8): String =
    s"""WITH sh AS (SELECT $idCol AS id,
            ${TextHash.shingleHashesSql(textCol, q)} AS sh FROM $tbl),
          p AS (SELECT a.id AS doc_a, b.id AS doc_b,
              len(list_intersect(a.sh, b.sh)) AS inter,
              len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS un
            FROM sh a JOIN sh b ON a.id < b.id)
        SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / un AS jacc FROM p
        WHERE CAST(inter AS DOUBLE) / un >= $threshold
        ORDER BY doc_a, doc_b"""
}
