package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Fence

/** Asymmetric containment join — the near-dup relation Jaccard misses:
  * a short document quoted WHOLE inside a much longer one has tiny
  * Jaccard (the union is dominated by the long doc) but containment
  * |sh(inner) ∩ sh(outer)| / |sh(inner)| ≈ 1. The quote-expansion /
  * article-inside-digest case of corpus dedup.
  *
  * Scale shape: the inner side keeps only its PREFIX shingles under
  * the canonical rarest-first order (if an outer doc misses all
  * `|A| − ⌈t·|A|⌉ + 1` of them, fewer than ⌈t·|A|⌉ shared shingles
  * remain — it cannot qualify), the outer side posts every shingle,
  * and candidates are one equi-join on the shingle hash followed by an
  * exact array-intersect verify on actual collisions only. No pair
  * enumeration, no cartesian; the integer threshold arithmetic is
  * lossless under the one-decimal contract (the [[JaccardJoin]]
  * discipline). Unlike the symmetric join there is no size-ratio
  * filter — that asymmetry is the point.
  */
object ContainmentJoin {

  /** Pairs (inner_id, outer_id, containment) with word-n-gram
    * containment of `inner` in `outer` at or above `threshold`
    * (one decimal); a document is never contained in itself, and
    * gram-less documents (shorter than n words) pair with nothing. */
  def containedIn(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 5, threshold: Double = 0.8): DataFrame = {
    val tNum = math.round(threshold * 10).toInt
    require(tNum > 0 && tNum <= 10 &&
      math.abs(threshold * 10 - tNum) < 1e-9,
      s"ContainmentJoin threshold must have one decimal, got $threshold")
    val sh = Fence(JaccardJoin.wordShingleFrame(docs, idCol, textCol, n)
      .filter(size(col("sh")) > 0))
    val ex = sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("h"))
    val freq = ex.groupBy(col("h")).agg(count(lit(1)).as("f"))
    val ranked = ex.join(freq, "h")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("f").asc, col("h").asc)))
      .withColumn("plen",
        col("n") - floor((col("n") * tNum + 9) / 10).cast("int") + 1)
    val prefix = ranked.filter(col("rnk") <= col("plen"))
      .select(col("id").as("__ia"), col("h"))
    val post = ex.select(col("id").as("__ib"), col("h"))
    val cand = prefix.join(post, Seq("h"))
      .filter(col("__ia") =!= col("__ib"))
      .select(col("__ia"), col("__ib")).distinct()
    val inner = sh.select(col("id").as("__ia"), col("sh").as("__sha"))
    val outer = sh.select(col("id").as("__ib"), col("sh").as("__shb"))
    cand.join(inner, "__ia").join(outer, "__ib")
      .withColumn("__i",
        size(array_intersect(col("__sha"), col("__shb"))))
      .filter(lit(10) * col("__i") >= lit(tNum) * size(col("__sha")))
      .select(col("__ia").as("inner_id"), col("__ib").as("outer_id"),
        (col("__i").cast("double") / size(col("__sha")).cast("double"))
          .as("containment"))
  }
}
