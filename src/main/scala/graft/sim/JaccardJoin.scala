package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Fence
import graft.text.TextHash

/** Exact n-gram Jaccard similarity self-join with PPJoin-style filtering
  * — the *exact* (not approximate) scale path for similarity dedup.
  *
  * Candidate pruning, all provably lossless for pairs with J >= t:
  *  - prefix filter: shingles ordered rarest-first (global doc-frequency,
  *    then hash); a qualifying pair must share an element within both
  *    sides' first `n - ceil(t·n) + 1` shingles;
  *  - position filter: at the shared prefix element, the remaining
  *    suffixes must still allow the required overlap
  *    `α = ceil(t/(1+t)·(na+nb))`;
  *  - size filter: `min(na,nb) >= t·max(na,nb)`.
  * All thresholds use exact integer arithmetic (a floating ceil could
  * shrink a prefix and break containment). Survivors are exact-verified.
  * The oracle runs the naive quadratic form — identical output.
  *
  * Shuffles: doc-frequency aggregation, the prefix-token equi-join, pair
  * dedup. Rarest-first ordering is what keeps hot shingles out of
  * prefixes and bounds candidate blow-up on skewed vocabularies.
  */
object JaccardJoin {

  /** Pairs (doc_a < doc_b) with exact char-q-gram Jaccard >= threshold.
    * Output: (doc_a, doc_b, jacc). Threshold must have one decimal. */
  def selfJoin(docs: DataFrame, idCol: String, textCol: String,
               q: Int = 5, threshold: Double = 0.8): DataFrame =
    selfJoinOnShingles(Fence(docs
      .select(col(idCol).as("id"),
        TextHash.charCodes(col(textCol)).as("__codes"))
      .select(col("id"),
        TextHash.shingleHashesFromCodes(col("__codes"), q).as("sh"))),
      threshold)

  /** Word-n-gram variant: on vocabularies where character q-grams appear
    * in most documents, word shingles keep doc-frequencies low and the
    * prefix filter selective. */
  def selfJoinWords(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, threshold: Double = 0.8): DataFrame =
    selfJoinOnShingles(Fence(wordShingleFrame(docs, idCol, textCol, n)),
      threshold)

  /** Kernel twin of `TextHash.tokenHashes` →
    * `wordShingleHashesFromTokenHashes`: one JIT pass per row computing
    * (id, distinct word-n-gram hashes) — the ts04/ts05/signatureFrame
    * precedent; the Column form runs two interpreted HOF transforms per
    * row. Identical integer math (codepoint charHash over the first 12
    * chars, mod-p scaling, base-31 combination, first-occurrence
    * distinct, empty array under n tokens, null text → null), pinned to
    * the Column form by TextSimSpec; the oracle SQL is unchanged. */
  def wordShingleFrame(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    require(n >= 2 && n <= 6)
    import org.apache.spark.sql.types.{ArrayType, LongType, StructField,
      StructType}
    // spread the kernel across the configured parallelism (no-op when
    // the scan already plans wide — MinHashLSH.signatureFrame
    // precedent)
    val base = graft.core.Par.ensure(docs.select(col(idCol).as("id"),
      col(textCol).cast("string").as("__t")))
    val schema = StructType(Seq(base.schema.head,
      StructField("sh", ArrayType(LongType, true), true)))
    val p = 2147483647L
    val pw = TextHash.pow31.toArray
    base.mapPartitions { rows =>
      rows.map { r =>
        val txt = if (r.isNullAt(1)) null else r.getString(1)
        if (txt == null) org.apache.spark.sql.Row(r.get(0), null)
        else {
          // Spark's split(text, " ") keeps trailing empties (limit -1)
          val th = txt.split(" ", -1).map(TextHash.charHashStr)
          if (th.length < n)
            org.apache.spark.sql.Row(r.get(0), Array.empty[Long])
          else {
            val seen = new java.util.LinkedHashSet[java.lang.Long]()
            var i = 0
            while (i + n <= th.length) {
              var h = 0L; var j = 0
              while (j < n) { h += th(i + j) % p * pw(n - 1 - j); j += 1 }
              seen.add(h); i += 1
            }
            val sh = new Array[Long](seen.size)
            val it = seen.iterator(); var k = 0
            while (it.hasNext) { sh(k) = it.next(); k += 1 }
            org.apache.spark.sql.Row(r.get(0), sh)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Core prefix-filtered exact join over a prepared (id, sh) frame. */
  private def selfJoinOnShingles(shAll: DataFrame,
                                 threshold: Double): DataFrame = {
    val tNum = math.round(threshold * 10).toInt
    require(tNum > 0 && tNum <= 10)
    // the documented one-decimal contract, now enforced: every integer
    // filter below is only lossless when t == tNum/10 exactly
    require(math.abs(threshold * 10 - tNum) < 1e-9,
      s"JaccardJoin threshold must have one decimal, got $threshold")
    SetVerify.requireIntegralIds(shAll, "id")
    // GROUP-COLLAPSE (skew containment, exact — see [[GroupCollapse]]):
    // set-identical docs (boilerplate groups) inflate their own tokens'
    // document frequency, so even rarest-first prefixes put the whole
    // group into shared prefix buckets — O(group²) pairs in one task.
    // Run the prefix join on one representative per group and recover
    // member pairs exactly. Side benefit: document frequencies are
    // computed over DISTINCT sets, so a boilerplate flood no longer
    // drags its tokens toward the common end of the prefix order.
    val collapsed = GroupCollapse.collapse(shAll)
    val sh = collapsed.reps
    val ex = sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("h"))
    val freq = ex.groupBy(col("h")).agg(count(lit(1)).as("f"))
    // prefix length n - ceil(t*n) + 1, rarest-first
    val ranked = ex.join(freq, "h")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("f").asc, col("h").asc)))
      .withColumn("plen",
        col("n") - floor((col("n") * tNum + 9) / 10).cast("int") + 1)
    val prefix = graft.core.Par.fanOut(
      ranked.filter(col("rnk") <= col("plen"))
        .select(col("id"), col("h"), col("rnk"), col("n")))
    // required overlap α = ceil(t/(1+t)·(na+nb)); with t = tNum/10 that
    // is ceil(tNum·(na+nb) / (10+tNum)) — exact integers throughout
    val na = col("a.n"); val nb = col("b.n")
    val alpha = floor((lit(tNum) * (na + nb) + lit(9 + tNum)) /
      (10 + tNum)).cast("int")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          lit(10) * least(na, nb) >= lit(tNum) * greatest(na, nb) &&
          least(na - col("a.rnk"), nb - col("b.rnk")) + 1 >= alpha)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    // exact verify: the shared allocation-free InternalRow merge kernel
    // (scores, threshold semantics and the oracle SQL identical to the
    // Column array_intersect form — see [[SetVerify]] for why)
    val repPairs = SetVerify.jaccard(cand, sh, threshold)
    GroupCollapse.expand(repPairs, collapsed, "jacc")
  }

  /** Naive-quadratic oracle SQL — same output, independent plan. */
  def selfJoinSql(tbl: String, idCol: String, textCol: String,
                  q: Int = 5, threshold: Double = 0.8): String =
    oracleOnShingles(
      s"""SELECT $idCol AS id,
          ${TextHash.shingleHashesSql(textCol, q)} AS sh FROM $tbl""",
      threshold)

  def selfJoinWordsSql(tbl: String, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.8): String =
    oracleOnShingles(
      s"""SELECT id, ${TextHash.wordShingleHashesSql("th", n)} AS sh
          FROM (SELECT $idCol AS id,
            ${TextHash.tokenHashesSql(textCol)} AS th FROM $tbl)""",
      threshold)

  private def oracleOnShingles(shSelect: String,
                               threshold: Double): String =
    s"""WITH sh AS ($shSelect),
          p AS (SELECT a.id AS doc_a, b.id AS doc_b,
              len(list_intersect(a.sh, b.sh)) AS inter,
              len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS un
            FROM sh a JOIN sh b ON a.id < b.id)
        SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / un AS jacc FROM p
        WHERE CAST(inter AS DOUBLE) / un >= $threshold
        ORDER BY doc_a, doc_b"""
}
