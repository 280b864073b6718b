package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard assignment: deal documents, in id order, into
  * fixed token-budget CHUNKS — the sharding step between a filtered
  * corpus and a tokenizer fleet ("each worker takes ~capacity tokens
  * of contiguous docs"). A doc's chunk is
  * `floor(tokens_before_it / capacity)`: chunk boundaries fall where
  * the running total crosses a capacity multiple, every chunk except
  * the last carries ~capacity tokens, and the assignment is a pure
  * function of (order, token counts) — engine-exact, no RNG.
  *
  * Scale design — the naive form is one `SUM OVER (ORDER BY id)`
  * window with NO partition key: the whole corpus serializes through
  * a single task (the [[Mixture]] problem without even a language to
  * partition by). Same cure, order-key flavored:
  *   A. docs bucket into `buckets` equal-width id RANGES (range
  *      min/max from one 2-row aggregate); one hash aggregate
  *      computes per-range token sums — a ≤`buckets`-row driver
  *      constant — whose prefix sums give each range's starting
  *      offset;
  *   B. the running sum then windows WITHIN each range (id ranges
  *      partition the global order, so offset + within-range prefix
  *      IS the global prefix), and the chunk id is one integral
  *      division. No corpus-wide sequential pass anywhere.
  * Row-identical to the global window by construction. Degenerate
  * id layouts (ids concentrated in one equal-width range) used to
  * collapse that range into a single window task — the naive plan,
  * silently (VERDICT r11). Now DETECTED from the same stage-A
  * aggregate (per-range row counts ride along for free) and RECOVERED:
  * the ranges are re-cut at approximate id quantiles, which spread
  * rows evenly whatever the id distribution. Recovery is exact — the
  * output is invariant to WHERE the range boundaries fall (any
  * contiguous-in-id partition satisfies offset + within-range prefix
  * = global prefix), so the approximate quantiles affect only the
  * plan's parallelism, never a row.
  */
object Packing {

  /** Re-bucket when the hottest range holds more than this multiple of
    * its fair share — scale-free, so a pathological layout triggers at
    * any corpus size while uniform/hash-assigned ids (fair share ≈ 1×)
    * never do. */
  val SkewFactor = 8L

  /** True when one equal-width range holds > [[SkewFactor]]× its fair
    * share of rows. */
  private[graft] def isSkewed(counts: Seq[Long], buckets: Int): Boolean =
    counts.nonEmpty && buckets > 1 &&
      counts.max * buckets > counts.sum * SkewFactor

  /** Chunk assignment `(id, n_toks, chunk)` for every row of `docs`.
    * `tokCol` must be an engine-deterministic token count; `capacity`
    * is the per-chunk token budget. Integral arithmetic throughout —
    * the division is `div`, not float division, so the result is
    * bit-stable at any magnitude. */
  def tokenChunks(docs: DataFrame, idCol: String, tokCol: Column,
                  capacity: Long, buckets: Int = 256): DataFrame = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = docs.select(col(idCol).cast("long").as("id"),
      tokCol.cast("long").as("n_toks"))
    val mm = base.agg(min(col("id")), max(col("id"))).head()
    if (mm.isNullAt(0))
      return base.withColumn("chunk", lit(0L)).limit(0)
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    // ceil width so hi lands in bucket buckets-1; width >= 1 always
    val width = math.max(1L, (hi - lo) / buckets + 1)
    // integral division end to end: float division truncates past
    // 2^53 and the bucket id must be exact at any id magnitude
    val tagged0 = base.withColumn("__bk",
      expr(s"(id - ${lo}L) div ${width}L"))
    // stage A: per-range token sums -> driver prefix offsets. The
    // collect is bounded by `buckets` (ranges are fixed-width by
    // construction — no data-driven cardinality to guard). Row counts
    // ride along to detect a degenerate id layout below.
    def rangeSums(t: DataFrame): Array[(Long, Long, Long)] =
      t.groupBy(col("__bk"))
        .agg(sum(col("n_toks")).as("ts"), count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    var sums = rangeSums(tagged0)
    val tagged =
      if (!isSkewed(sums.map(_._3).toSeq, buckets)) tagged0
      else {
        // degenerate layout: re-cut the ranges at approximate id
        // QUANTILES (even row spread whatever the distribution). The
        // double-typed boundaries are inexact past 2^53 and the sketch
        // is partitioning-dependent — both harmless: any boundary set
        // yields the identical output, only the parallelism moves.
        val bs = base.stat.approxQuantile("id",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
          .distinct.sorted.toIndexedSeq
        val t = base.withColumn("__bk",
          aggregate(typedLit(bs),
            lit(0L), (acc, b) => acc +
              when(b <= col("id").cast("double"), 1L).otherwise(0L)))
        sums = rangeSums(t)
        t
      }
    var acc = 0L
    val offsets = sums.map { case (b, ts, _) =>
      val o = (b, acc); acc += ts; o
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__ob", "__off"))
    // stage B: within-range running sum + the global offset
    val w = Window.partitionBy(col("__bk")).orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.join(offDf, col("__bk") === col("__ob"))
      .withColumn("__cum",
        col("__off") + sum(col("n_toks")).over(w) - col("n_toks"))
      .select(col("id"), col("n_toks"),
        expr(s"__cum div ${capacity}L").as("chunk"))
  }

  /** DuckDB rendering of the one-window reference form
    * [[tokenChunks]] is row-identical to. */
  def tokenChunksSql(docsTable: String, idCol: String, tokSql: String,
                     capacity: Long): String =
    s"""SELECT $idCol AS id, CAST($tokSql AS BIGINT) AS n_toks,
          CAST((SUM(CAST($tokSql AS BIGINT)) OVER (ORDER BY $idCol ASC
              ROWS UNBOUNDED PRECEDING) - CAST($tokSql AS BIGINT))
            // $capacity AS BIGINT) AS chunk
        FROM $docsTable ORDER BY id"""
}
