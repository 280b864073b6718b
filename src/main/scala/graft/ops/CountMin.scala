package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped count-min sketches: heavy-hitter frequency estimates with
  * BOUNDED state — the counting complement to [[Kmv]]'s distinct
  * sketches.
  *
  * An exact token-frequency table over a 100 TB corpus is a groupBy
  * whose shuffle carries one row per distinct token per partition; a
  * count-min sketch caps the per-group state at d·w counters no matter
  * how many distinct tokens the group holds, and — the property the
  * gate proves — sketches MERGE exactly: every counter is a plain sum
  * over rows, so elementwise addition of two slices' sketches IS the
  * sketch of the union. Slices (days, shards, languages) sketch
  * independently and combine without touching the data again; a point
  * estimate reads d counters and upper-bounds the true count
  * (`est >= exact` always — collisions only ever inflate).
  *
  * Scale shape: one aggregation whose partial state is a d·w long
  * array per group per partition ([[CmsAgg]] — map-side combine, plans
  * as ObjectHashAggregate with a partial stage like [[Kmv.sketchAgg]]).
  * No window, no per-group sort, shuffle volume d·w longs per group
  * per partition regardless of cardinality.
  *
  * Bucket hashing is [[Kmv.uniformHash]] (md5 → 60-bit int) over the
  * depth-salted value, so the DuckDB oracle replays every counter as a
  * plain `GROUP BY bucket` sum — the cross-engine hash discipline the
  * rest of the repo uses.
  */
object CountMin {

  /** Row `r`'s bucket for `value`: uniform 60-bit rehash of the
    * depth-salted string, reduced mod `w`. Pure expression — codegen,
    * no UDF. */
  def bucket(value: Column, r: Int, w: Int): Column =
    pmod(Kmv.uniformHash(concat(lit(s"$r:"), value.cast("string"))),
      lit(w.toLong)).cast("int")

  /** All `d` bucket columns for `value`, as one array. */
  private def bucketArray(value: Column, d: Int, w: Int): Column =
    array((0 until d).map(r => bucket(value, r, w)): _*)

  /** Bounded count-min accumulator: state is the flat d×w counter
    * array (row r at offsets [r·w, (r+1)·w)); reduce bumps one counter
    * per row, merge is elementwise addition — both associative and
    * commutative, so the result is arrival-order-free. */
  private final class CmsAgg(d: Int, w: Int)
      extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], buckets: Seq[Int]): Array[Long] = {
      var r = 0
      while (r < d) { b(r * w + buckets(r)) += 1L; r += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Per-group count-min sketch of `value` occurrences: one row per
    * group with `cms` = the flat d×w counter array. Empty `groupCols`
    * sketches the whole frame into one row. */
  def sketchAgg(df: DataFrame, groupCols: Seq[String], value: Column,
                d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"need d > 0 and w > 0, got d=$d w=$w")
    val cms = udaf(new CmsAgg(d, w))
    df.select(groupCols.map(col) :+
        bucketArray(value, d, w).as("__cms_b"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(cms(col("__cms_b")).as("cms"))
  }

  /** Exact sketch union: counters are sums, so elementwise addition of
    * two sketches IS the sketch of the concatenated inputs — the
    * lossless merge that lets slices sketch independently. Sketches of
    * DIFFERENT geometry (d or w) cannot merge — and `zip_with` would
    * silently null-pad the shorter one into corrupt counters — so a
    * length mismatch raises per row instead. */
  def mergeSketches(a: Column, b: Column): Column =
    when(size(a) =!= size(b),
      raise_error(concat(lit("CountMin.mergeSketches: sketch "),
        lit("geometries differ ("), size(a).cast("string"), lit(" vs "),
        size(b).cast("string"),
        lit(" counters) — sketches only merge under one (d, w)"))))
      .otherwise(zip_with(a, b, (x, y) => x + y))

  /** Point estimate of `value`'s count from a `cms` sketch column:
    * the minimum of its d counters. Upper-bounds the true count
    * (collisions only ever add). A sketch whose length is not d·w was
    * built under a DIFFERENT geometry — its buckets mean nothing under
    * this (d, w) — so the lookup raises instead of reading garbage. */
  def estimate(cms: Column, value: Column, d: Int, w: Int): Column =
    when(size(cms) =!= lit(d * w),
      raise_error(concat(lit("CountMin.estimate: sketch has "),
        size(cms).cast("string"),
        lit(s" counters, expected ${d * w} (d=$d, w=$w) — estimate " +
          "with the geometry the sketch was built under"))))
      .otherwise((0 until d)
        .map(r => element_at(cms,
          lit(r * w + 1) + bucket(value, r, w)))
        .reduce((a, b) => least(a, b)))

  // ---- streaming maintenance of a persisted sketch ------------------
  //
  // The foreachBatch story for "track token frequencies over a live
  // feed forever in bounded space": each micro-batch lands its own
  // d×w sketch as one catalog partition keyed by batch id (a replayed
  // batch overwrites ITS OWN partition — idempotent under the
  // engine's latest-batch replay, the only replay Structured
  // Streaming performs), the served sketch is the elementwise sum of
  // the live partitions (lossless: counters are sums), and compaction
  // folds them into one under a GENERATION pointer flipped last (the
  // Versioned commit shape) so a crash mid-compaction leaves the old
  // generation serving and an invisible orphan the next compaction
  // overwrites. Compaction runs while the stream is QUIESCENT (no
  // uncommitted batch outstanding) — that contract is what keeps
  // "replayed batch overwrites its own partition" sound, because a
  // batch can only be folded after it was committed.

  private val GeomMarker = "_cmsgeom"
  private val GenMarker = "_cmsgen"

  private def currentGen(catalog: graft.catalog.TableCatalog,
                         table: String): Long =
    catalog.readMarker(table, GenMarker).map { s =>
      s.trim.toLongOption.getOrElse(throw new IllegalStateException(
        s"CountMin: damaged generation pointer for '$table' " +
          s"(content: '${s.trim.take(32)}')"))
    }.getOrElse(0L)

  private def checkGeom(catalog: graft.catalog.TableCatalog,
                        table: String, d: Int, w: Int,
                        writeIfAbsent: Boolean): Unit = {
    val geom = s"d=$d w=$w"
    catalog.readMarker(table, GeomMarker) match {
      case Some(m) if m.trim != geom => throw new IllegalArgumentException(
        s"CountMin: sketch table '$table' was built under (${m.trim}) " +
          s"— serve it under the recorded geometry, not ($geom)")
      case None if writeIfAbsent =>
        catalog.writeMarker(table, GeomMarker, geom)
      case None => throw new IllegalArgumentException(
        s"CountMin: no sketch state at '$table' — ingest a batch first")
      case _ => ()
    }
  }

  /** foreachBatch sink body: sketch this micro-batch's `value` rows
    * and land them as the batch's own partition of the persisted
    * sketch table. O(batch) work + one d·w-row write per batch; the
    * geometry is recorded at first ingest and a later ingest under a
    * different (d, w) is refused loudly (its buckets would mean
    * nothing). */
  def ingestSketchBatch(catalog: graft.catalog.TableCatalog,
                        batch: DataFrame, value: Column, table: String,
                        batchId: Long, d: Int, w: Int): Unit = {
    require(d > 0 && w > 0, s"need d > 0 and w > 0, got d=$d w=$w")
    catalog.withTableLock(table) {
      checkGeom(catalog, table, d, w, writeIfAbsent = true)
      val seg = s"g${currentGen(catalog, table)}-b$batchId"
      catalog.writePartition(
        sketchAgg(batch, Nil, value, d, w).withColumn("seg", lit(seg)),
        table, "seg", seg)
    }
  }

  /** The served sketch: one (cms) row — the elementwise sum of the
    * current generation's partitions (exact, by the merge property).
    * The fold is relational (position explode → partial-aggregated
    * sum → re-assembled array): d·w rows per live partition, never
    * corpus-scale. */
  def readSketch(catalog: graft.catalog.TableCatalog,
                 table: String, d: Int, w: Int): DataFrame = {
    checkGeom(catalog, table, d, w, writeIfAbsent = false)
    val gen = currentGen(catalog, table)
    val segs = catalog.listPartitions(table, "seg")
      .filter(_.startsWith(s"g$gen-"))
    require(segs.nonEmpty,
      s"CountMin: no sketch partitions at '$table' (generation $gen)")
    catalog.spark.read
      .parquet(segs.map(sv => catalog.partitionPath(table, "seg", sv)): _*)
      .select(posexplode(col("cms")).as(Seq("pos", "n")))
      .groupBy(col("pos")).agg(sum(col("n")).as("n"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("n")))),
        x => x.getField("n")).as("cms"))
  }

  /** Fold the current generation's per-batch partitions into ONE and
    * commit it by flipping the generation pointer LAST — partition
    * count (and the read fan-in) stays bounded however long the
    * stream runs. Old-generation directories become invisible at the
    * flip and are dropped best-effort after it (a crash leaves
    * orphans the next compaction's overwrite converges). QUIESCENT
    * CONTRACT: call between micro-batches, not concurrently with an
    * in-flight ingest — a batch may only be folded after its
    * checkpoint commit, which is what keeps replay idempotent. */
  def compactSketch(catalog: graft.catalog.TableCatalog,
                    table: String, d: Int, w: Int): Unit =
    catalog.withTableLock(table) {
      val gen = currentGen(catalog, table)
      val next = s"g${gen + 1}-c"
      catalog.writePartition(
        readSketch(catalog, table, d, w).withColumn("seg", lit(next)),
        table, "seg", next)
      catalog.writeMarker(table, GenMarker, (gen + 1).toString)
      catalog.listPartitions(table, "seg")
        .filter(_.startsWith(s"g$gen-"))
        .foreach(sv => catalog.deletePartition(table, "seg", sv))
    }

  /** DuckDB twin of [[bucket]] over SQL expression `e` (a VARCHAR):
    * the ts16 hex fold of md5 over the depth-salted string, mod `w`. */
  def bucketSql(e: String, r: Int, w: Int): String =
    s"""(list_reduce(list_transform(
        string_split_regex(substr(md5('$r:' || $e), 1, 15), ''),
        c -> CAST(CASE WHEN c BETWEEN '0' AND '9' THEN ascii(c) - 48
                  ELSE ascii(c) - 87 END AS BIGINT)),
        (a, b) -> a * 16 + b) % $w)"""
}
