package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped KMV (k-minimum-values) distinct-count sketches.
  *
  * The global form (ts16) sizes ONE dedup run; per-slice estimates —
  * per language, per source bucket — are what size per-slice runs, and
  * KMV's defining property is that sketches MERGE exactly: the k
  * smallest of a union are the k smallest of the two k-min sets'
  * union, so slices sketch independently (per partition, per day, per
  * shard) and combine without touching the data again.
  *
  * Scale shape: the sketch is ONE aggregation whose partial state is
  * O(k) per group per partition ([[KMinAgg]] — a bounded sorted-set
  * accumulator with map-side combine), so shuffle volume is at most
  * k longs per group per partition regardless of how many distinct
  * values a group holds. No window, no per-group global sort, no
  * distinct materialization.
  */
object Kmv {

  /** Uniform 60-bit rehash (md5, 15 hex chars fit a BIGINT) — the
    * KMV estimator needs uniformity the upstream base-31 content
    * hashes don't have. Identical to the ts16 form; the DuckDB twin
    * is the hex fold `list_reduce(... a*16+b)`. */
  def uniformHash(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Bounded k-min-set aggregator: state is the k smallest DISTINCT
    * values seen so far, kept sorted; insert is a binary search +
    * copy (O(k) worst case per NEW small value — values at or above
    * the current k-th are rejected O(log k), the steady-state path on
    * a big corpus), merge is a sorted union re-cut to k. Deterministic
    * under any arrival order (pure set semantics). */
  private final class KMinAgg(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], v: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, v)
      if (pos >= 0) b // already present
      else if (b.length >= k && v > b(k - 1)) b // too large for the set
      else {
        val ins = -pos - 1
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { j += 1; b(j - 1) }
          else if (j >= b.length) { i += 1; a(i - 1) }
          else if (a(i) < b(j)) { i += 1; a(i - 1) }
          else if (b(j) < a(i)) { j += 1; b(j - 1) }
          else { i += 1; j += 1; a(i - 1) } // equal: keep once
        out(n) = take
        n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Per-group k-min sketch of `value`: one row per group with
    * `kmin` = the k smallest distinct [[uniformHash]] values,
    * ascending. The group's whole sketch — feed it to
    * [[mergeSketches]] / [[withEstimate]]. */
  def sketchAgg(df: DataFrame, groupCols: Seq[String], value: Column,
                k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val kmin = udaf(new KMinAgg(k))
    df.select(groupCols.map(col) :+ uniformHash(value).as("__kmv_u"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmin(col("__kmv_u")).as("kmin"))
  }

  /** Exact sketch union: the k smallest of `a ∪ b`. KMV's merge is
    * LOSSLESS — the result is identical to sketching the concatenated
    * inputs — which is what lets slices sketch independently. */
  def mergeSketches(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Derive the estimator columns from a `kmin` sketch column:
    * `k` (observed set size), `kth_u` (the k-th minimum), and
    * `est_distinct` = (k−1)·2⁶⁰/u₍ₖ₎ — or the EXACT size when the
    * group holds fewer than `k` distinct values (the sketch saw them
    * all). 2⁶⁰ and (k−1)·2⁶⁰ are exactly representable doubles, so
    * the single division is the only rounding step. An EMPTY sketch (a
    * group that contributed no values — legal via [[mergeSketches]] of
    * two empty arrays) reports `kth_u` NULL and `est_distinct` 0.0
    * through the exact branch, instead of tripping `element_at`'s
    * 1-based index check. */
  def withEstimate(df: DataFrame, k: Int): DataFrame =
    df.withColumn("k", size(col("kmin")))
      .withColumn("kth_u",
        when(col("k") > 0, element_at(col("kmin"), size(col("kmin")))))
      .withColumn("est_distinct",
        when(col("k") < lit(k), col("k").cast("double"))
          .otherwise((col("k") - lit(1)).cast("double") *
            lit(1152921504606846976.0) / col("kth_u").cast("double")))
}
