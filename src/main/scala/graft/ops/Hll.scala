package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped HyperLogLog distinct-count sketches, in RELATIONAL form —
  * the fixed-size complement to [[Kmv]]: a KMV sketch is k longs and
  * answers "how many distinct" with k-point precision; an HLL sketch
  * is m SMALL REGISTERS (one byte each in the classic layout) whose
  * accuracy is ~1.04/√m, the shape every production engine exposes as
  * `approx_count_distinct`. Building it from first principles keeps
  * the whole sketch replayable by the DuckDB oracle.
  *
  * The register table IS the sketch: one row per OCCUPIED (group,
  * bucket) with `r` = the max leading-zero rank seen in that bucket —
  * at most m rows per group however many distinct values the group
  * holds. Update and merge are both `max`, so the sketch needs no
  * custom aggregator at all: one hash aggregation keyed (group,
  * bucket) with a map-side partial IS the update, and merging two
  * independently-built sketches is the SAME aggregation over their
  * union — lossless by construction (max is associative and
  * commutative), which is what lets slices (days, shards, partitions)
  * sketch independently and combine without touching the data again.
  *
  * Cross-engine determinism: the value hash is [[Kmv.uniformHash]]
  * (md5 → 60-bit long); bucket = the low log₂(m) bits, rank = leading
  * zeros of the remaining bits + 1 via `length(bin(x))` (identical on
  * both engines), ranks capped at [[RhoCap]] so the estimator's
  * 2^(−r) sum folds to an EXACT integer Σ 2^(RhoCap − r) — the only
  * floating-point steps in the estimate are one multiply chain over
  * literals and ONE division, both IEEE-deterministic. The classic
  * small-range linear-counting correction needs ln(), whose last-ulp
  * behavior differs across libm implementations, so this estimator
  * deliberately serves the raw formula only (documented bias below
  * ~2.5·m distincts; the gate demonstrates accuracy where HLL is
  * actually used — cardinalities at or above m).
  */
object Hll {

  /** [[Kmv.uniformHash]] width. */
  private val HashBits = 60

  /** Rank cap: 2^(RhoCap − r) stays an exact positive long and
    * Σ over m buckets stays far below 2^63. A rank above 30 needs
    * ~2^30 distinct values per bucket to matter — beyond any corpus
    * this estimator's m would be sized for. */
  val RhoCap = 30

  private def mBits(m: Int): Int = {
    require(m >= 4 && (m & (m - 1)) == 0,
      s"Hll: m must be a power of two >= 4, got $m")
    java.lang.Integer.numberOfTrailingZeros(m)
  }

  /** The register table of `value` per group: one row per occupied
    * (group..., `bucket`, `r`). Feed it to [[mergeRegisters]] /
    * [[estimate]]. */
  def registers(df: DataFrame, groupCols: Seq[String], value: Column,
                m: Int): DataFrame = {
    val b = mBits(m)
    val remBits = HashBits - b
    val h = Kmv.uniformHash(value)
    val rem = shiftright(h, b)
    val rho = when(rem === 0, lit(remBits + 1))
      .otherwise(lit(remBits + 1) - length(bin(rem)))
    df.select(groupCols.map(col) :+
        pmod(h, lit(m.toLong)).cast("int").as("bucket") :+
        least(rho, lit(RhoCap)).cast("int").as("__rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("__rho")).as("r"))
  }

  /** Exact sketch union: registers merge by max, so re-aggregating
    * the unioned register tables IS the sketch of the concatenated
    * inputs. Geometry discipline is the caller's: both sides must be
    * built under one m (the gate proves equality against a
    * whole-corpus build, which a mixed-m merge cannot produce). */
  def mergeRegisters(a: DataFrame, b: DataFrame,
                     groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** Distinct-count estimate per group from a register table:
    * `n_buckets` (occupied registers) and `est_distinct` =
    * α_m·m²/Σ 2^(−r) with empty buckets contributing 2^0. The sum is
    * folded as the exact integer Σ 2^(RhoCap−r) (+ 2^RhoCap per empty
    * bucket), so the estimate is literal-multiply chain ÷ exact
    * integer — bit-identical on any engine. */
  def estimate(regs: DataFrame, groupCols: Seq[String],
               m: Int): DataFrame = {
    mBits(m) // validate
    // α_m · m² · 2^RhoCap, evaluated in the same literal order the
    // oracle SQL spells out
    val alphaNum = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble) * lit((1L << RhoCap).toDouble)
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - r)"))
          .as("__s_occ"))
      .withColumn("est_distinct",
        alphaNum / (col("__s_occ") +
          (lit(m) - col("n_buckets")).cast("long") *
            lit(1L << RhoCap)).cast("double"))
      .drop("__s_occ")
  }

  /** DuckDB twin of the register derivation over VARCHAR expression
    * `e`: (bucket, r) column expressions — the ts16 md5 hex fold,
    * low-bits bucket, `length(bin(...))` rank, capped. */
  def registerSql(e: String, m: Int): (String, String) = {
    val b = mBits(m)
    val remBits = HashBits - b
    val h = s"""list_reduce(list_transform(
        string_split_regex(substr(md5($e), 1, 15), ''),
        c -> CAST(CASE WHEN c BETWEEN '0' AND '9' THEN ascii(c) - 48
                  ELSE ascii(c) - 87 END AS BIGINT)),
        (a, b) -> a * 16 + b)"""
    val bucket = s"($h % $m)"
    val rho = s"""LEAST(CASE WHEN ($h >> $b) = 0 THEN ${remBits + 1}
        ELSE ${remBits + 1} - length(bin($h >> $b)) END, $RhoCap)"""
    (bucket, rho)
  }

  /** DuckDB twin of [[estimate]]'s arithmetic over a register CTE
    * holding (`bucket`, `r`) per group — the SELECT-list fragments for
    * `n_buckets` and `est_distinct` (same literal order as the Spark
    * side). */
  def estimateSql(m: Int): (String, String) = {
    mBits(m)
    val nb = "CAST(COUNT(*) AS INT)"
    val est = s"""(0.7213 / (1.0 + 1.079 / ${m.toDouble}) *
        ${m.toDouble} * ${m.toDouble} * ${(1L << RhoCap).toDouble}) /
      CAST(SUM(CAST(1 AS BIGINT) << ($RhoCap - r)) +
        CAST($m - COUNT(*) AS BIGINT) * ${1L << RhoCap} AS DOUBLE)"""
    (nb, est)
  }
}
