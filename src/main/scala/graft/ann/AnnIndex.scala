package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog

/** Persisted ANN index artifacts. The fit — the corpus count +
  * [[Ann.autoPlanes]] geometry for the LSH path, the Lloyd rounds of
  * [[Ann.kmeansCentroids]] for IVF — is paid ONCE at build time and
  * written to catalog tables; a serving workload loads the index and
  * probes it, instead of re-paying the fit on every query the way the
  * fit-inline operators ([[Ann.lshBucketNeighborsAuto]],
  * [[Ann.ivfTopK]]) do.
  *
  * Layout under one logical index name:
  *   `<index>`         1-row meta (kind, geometry, dim, fitted-over n,
  *                     indexed n). Written LAST, so a crash mid-build
  *                     (or mid-append) leaves no meta and readers see
  *                     "no index" instead of a half-written artifact;
  *                     a REBUILD over an existing index first flips the
  *                     meta to a `rebuilding` marker (round 15), so a
  *                     crashed rebuild fails loudly too instead of
  *                     serving mixed-fit rows under the stale meta.
  *   `<index>_assign`  per-vector rows (id, v, nrm, bucket|cell), one
  *                     `seg=` partition per build/append segment
  *                     (round 13 — segments let [[appendLsh]] /
  *                     [[appendIvf]] land new vectors without
  *                     rewriting the corpus-sized table, and a
  *                     replayed append overwrites its own segment
  *                     idempotently). IVF sub-partitions each segment
  *                     by `cell` (numCells is a small constant, and a
  *                     probe's cell equi-join prunes to the probed
  *                     cells at the storage layer — nprobe/numCells of
  *                     the corpus). LSH buckets number ~n/target — one
  *                     directory per bucket would explode into
  *                     corpus-many tiny files (measured 20 s to build
  *                     and probes SLOWER than the fit at sf0.1) — so
  *                     the LSH layout buckets by
  *                     `pk = pmod(bucket, LshPkBuckets)`: bounded
  *                     directory count, and a point-lookup still reads
  *                     only its bucket's pk directory.
  *   `<index>_cent`    IVF only: (cell, pos, val) centroid components.
  *   `<index>_dels`    id-level delete tombstones (round 15), one
  *                     `dseg=` partition per [[deleteIds]] batch — a
  *                     delete is O(batch) and idempotent under replay
  *                     exactly like an append. Every probe serves the
  *                     LIVE set (stored minus tombstoned — the
  *                     takedown/right-to-erasure path a production
  *                     corpus needs between rebuilds); with no
  *                     tombstones the probe plans are byte-identical
  *                     to the pre-delete ones (no anti-join is added).
  *                     [[compactSegs]] physically purges tombstoned
  *                     rows and drains this table; until then an
  *                     append that re-uses a tombstoned id is REFUSED
  *                     loudly (an id-level tombstone cannot tell the
  *                     old row from the new one — serving would
  *                     silently hide the re-insert).
  *   `<index>_segmeta` one (seg, rows) row per segment (round 14) —
  *                     the O(#segments) counts that make an append's
  *                     `indexed_n` update O(batch) instead of a
  *                     corpus-sized recount; reconciled against the
  *                     on-disk `seg=` partitions so a crash between
  *                     the segment write and the count write (or a
  *                     pre-r14 index) costs one O(that-segment)
  *                     recount, never a full-table pass. A recorded
  *                     count is never stale (round 15): any write that
  *                     OVERWRITES an existing segment — a replayed
  *                     append, a compaction rewrite — tombstones that
  *                     segment's count first, so a crash mid-overwrite
  *                     routes the segment through the recount path
  *                     instead of serving the pre-crash count.
  *
  * Vectors and norms round-trip parquet exactly (doubles are stored
  * bit-for-bit), so a probe over the loaded index is bit-identical to
  * the fit-inline operator over the same corpus — gated by ann07/ann08
  * against the ann06/ann05 oracles, and by ann09/ann10 for the
  * build-half + append-half lifecycle against the same oracles.
  *
  * Lifecycle (round 13): the geometry is sized for the corpus the fit
  * SAW (`fitted_n` — or an explicit planned `capacityRows`, the
  * production sizing knob); appends grow `indexed_n` without refitting.
  * Past [[MaxDriftFactor]] × fitted_n the geometry is undersized —
  * overfull LSH buckets, overloaded IVF cells, degraded neighbor
  * quality — so both the append and the probes fail loudly naming the
  * rebuild instead of silently serving from a stale fit
  * (`allowStale = true` is the explicit operator override). */
object AnnIndex {

  /** Directory-count bound for the LSH assignment layout (the
    * [[graft.streaming.CorpusStream.StatePartitions]] rationale). */
  val LshPkBuckets = 64L

  /** The similarity metrics an index can record at build time. */
  val Metrics: Set[String] = Set("cosine", "ip", "l2")

  /** Staleness bound: once `indexed_n` exceeds this factor of
    * `fitted_n`, appends and probes fail loudly (refit required).
    * One doubling is where [[Ann.autoPlanes]] would have added a
    * plane and k-means-per-cell load doubles — past it the fit is
    * demonstrably for a different corpus. */
  val MaxDriftFactor = 2.0

  private def assignTableOf(indexTable: String) = indexTable + "_assign"
  private def segMetaTableOf(indexTable: String) = indexTable + "_segmeta"
  private def delsTableOf(indexTable: String) = indexTable + "_dels"

  /** Build + persist the LSH bucket index: fits the plane count to the
    * corpus ([[Ann.autoPlanes]]) — or to `capacityRows`, the planned
    * corpus size, when the caller will [[appendLsh]] the rest later —
    * buckets every vector, writes the assignment segment, then the
    * meta row. Returns the fitted plane count. */
  def buildLsh(catalog: TableCatalog, data: DataFrame, idCol: String,
               vecCol: String, indexTable: String,
               targetBucketRows: Int = 1024,
               capacityRows: Option[Long] = None,
               minPlanes: Int = Ann.Planes,
               dim: Int = Ann.Dim): Int = {
    val n = data.count()
    val fitN = capacityRows.getOrElse(n)
    require(fitN >= n,
      s"AnnIndex: capacityRows=$fitN is smaller than the build corpus " +
        s"($n rows) — the planned capacity must cover the initial load")
    val planes = Ann.autoPlanes(fitN, targetBucketRows, minPlanes)
    catalog.withTableLock(assignTableOf(indexTable)) {
      markRebuilding(catalog, indexTable)
      writeSeg(catalog, indexTable,
        assignLsh(data, idCol, vecCol, planes, dim), "0", "pk")
      dropOtherSegs(catalog, indexTable, keep = "0") // rebuild hygiene
      drainDels(catalog, indexTable)
      writeSegCounts(catalog, indexTable, Map("0" -> n))
      writeMeta(catalog, indexTable, "lsh", planes, dim, 0, 0, fitN, n)
    }
    planes
  }

  /** Build + persist the IVF index: trains the coarse quantizer
    * ([[Ann.kmeansCentroids]], `trainIters` deterministic Lloyd
    * rounds) on `trainData` (default: the build corpus — pass the
    * full/historical corpus when bulk-loading a slice now and
    * appending the rest later), assigns every vector to its nearest
    * cell, writes the centroid table and the cell-partitioned
    * assignment segment, then the meta row. */
  def buildIvf(catalog: TableCatalog, data: DataFrame, idCol: String,
               vecCol: String, indexTable: String, numCells: Int = 16,
               trainIters: Int = 0,
               trainData: Option[DataFrame] = None,
               dim: Int = Ann.Dim): Unit = {
    val spark = data.sparkSession
    import spark.implicits._
    val trainD = trainData
      .map(td => Ann.withNorms(td, idCol, vecCol, dim))
      .getOrElse(Ann.withNorms(data, idCol, vecCol, dim))
    val cents = Ann.kmeansCentroids(trainD, numCells, trainIters)
    val n = data.count()
    val fitN = trainData.map(_.count()).getOrElse(n)
    val centRows = cents.zipWithIndex.flatMap { case ((v, _), c) =>
      v.zipWithIndex.map { case (x, p) => (c, p, x) }
    }.toSeq
    catalog.withTableLock(assignTableOf(indexTable)) {
      markRebuilding(catalog, indexTable)
      // disjoint-table artifact writes as concurrent lanes; meta last
      // (the buildIvfPq pattern)
      graft.core.Par.concurrently(Seq(
        () => catalog.writeFull(centRows.toDF("cell", "pos", "val"),
          indexTable + "_cent"),
        () => {
          writeSeg(catalog, indexTable,
            assignIvf(data, idCol, vecCol, cents, dim), "0", "cell")
          dropOtherSegs(catalog, indexTable, keep = "0")
          drainDels(catalog, indexTable)
        }))
      writeSegCounts(catalog, indexTable, Map("0" -> n))
      writeMeta(catalog, indexTable, "ivf", numCells, dim, 0, 0,
        fitN, n)
    }
  }

  /** Append new vectors to a persisted LSH index under its FROZEN
    * geometry — no recount, no re-bucketing of stored vectors, one new
    * assignment segment. Runs under the assignment table's writer
    * lock; `segKey` (default: next numeric segment) makes a replaying
    * caller overwrite its own segment instead of duplicating.
    * `indexed_n` is recounted from the table after the write, so the
    * meta stays exact under replay; past [[MaxDriftFactor]] the append
    * fails loudly (the fit no longer covers the corpus) unless
    * `allowStale` overrides. */
  def appendLsh(catalog: TableCatalog, data: DataFrame, idCol: String,
                vecCol: String, indexTable: String,
                segKey: Option[String] = None,
                allowStale: Boolean = false): Unit = {
    catalog.withTableLock(assignTableOf(indexTable)) {
      val m = readMeta(catalog, indexTable, "lsh")
      appendSeg(catalog, indexTable, m,
        assignLsh(data, idCol, vecCol, m.geometry, m.dim), data.count(),
        segKey, "pk", allowStale)
    }
  }

  /** Append new vectors to a persisted IVF index under its FROZEN
    * quantizer: the trained centroids are LOADED from the `_cent`
    * table (never re-derived — the whole point of persisting the fit)
    * and the new vectors join the cell layout as one new segment.
    * Same lock / replay / drift contract as [[appendLsh]]. */
  def appendIvf(catalog: TableCatalog, data: DataFrame, idCol: String,
                vecCol: String, indexTable: String,
                segKey: Option[String] = None,
                allowStale: Boolean = false): Unit = {
    catalog.withTableLock(assignTableOf(indexTable)) {
      val m = readMeta(catalog, indexTable, "ivf")
      val cents = readCentroids(catalog, indexTable)
      appendSeg(catalog, indexTable, m,
        assignIvf(data, idCol, vecCol, cents, m.dim), data.count(),
        segKey, "cell", allowStale)
    }
  }

  /** Build + persist the SQ8 code index: every vector quantized once
    * to int8 codes + integer self-dot + quantization scale
    * ([[Ann.sq8Quantized]]), codes stored as `array<tinyint>` — the
    * 4×-cheaper scan a quantized serving corpus reads instead of
    * floats. No corpus-level fit: the quantization scale is
    * PER-VECTOR, so unlike LSH planes or IVF centroids there is no
    * geometry to go stale and appends never require a rebuild
    * ([[requireFresh]] is kind-aware). `geometry` records the code
    * scale (127) for observability.
    *
    * `metric` (round 16 — the [[Ann.Geom]] pattern applied to the
    * score function): the similarity this index SERVES — "cosine"
    * (unit-invariant, the default), "ip" (dequantized inner product —
    * the learned-retrieval contract where magnitude carries signal)
    * or "l2" (negative squared dequantized distance). Recorded in the
    * meta; every probe scores under the RECORDED metric, and a probe
    * that explicitly requests a different one is refused loudly. */
  def buildSq8(catalog: TableCatalog, data: DataFrame, idCol: String,
               vecCol: String, indexTable: String,
               dim: Int = Ann.Dim, metric: String = "cosine"): Unit = {
    require(Metrics.contains(metric),
      s"AnnIndex: unknown metric '$metric' — use one of " +
        Metrics.mkString("'", "', '", "'"))
    val n = data.count()
    catalog.withTableLock(assignTableOf(indexTable)) {
      markRebuilding(catalog, indexTable)
      writeSeg(catalog, indexTable, assignSq8(data, idCol, vecCol, dim),
        "0", "pk")
      dropOtherSegs(catalog, indexTable, keep = "0")
      drainDels(catalog, indexTable)
      writeSegCounts(catalog, indexTable, Map("0" -> n))
      writeMeta(catalog, indexTable, "sq8", 127, dim, 0, 0, n, n,
        metric)
    }
  }

  /** Append new vectors to a persisted SQ8 index — quantize the batch,
    * land it as one new segment. Same lock / replay contract as
    * [[appendLsh]]; never stale (per-vector scales). */
  def appendSq8(catalog: TableCatalog, data: DataFrame, idCol: String,
                vecCol: String, indexTable: String,
                segKey: Option[String] = None): Unit =
    catalog.withTableLock(assignTableOf(indexTable)) {
      val m = readMeta(catalog, indexTable, "sq8")
      appendSeg(catalog, indexTable, m,
        assignSq8(data, idCol, vecCol, m.dim), data.count(),
        segKey, "pk", allowStale = false)
    }

  /** Brute-force top-k off the persisted SQ8 codes — the
    * [[Ann.sq8TopK]] result with the corpus side read as 1-byte codes
    * + precomputed self-dots (no float vectors touched, no
    * re-quantization); only the small query side quantizes per call.
    * Bit-identical to the fit-inline form (integer dots are
    * arrival-order-free), gated by ann12 against the ann11 oracle.
    *
    * `allowedIds` = FILTERED search (round 15): the top-k is taken
    * among the given ids only — metadata predicates ("English docs
    * only", "this source bucket") live in tables BESIDE the index, so
    * the filter arrives as an id frame and semi-joins the code scan
    * BEFORE any scoring. A pre-filter always fills k from the allowed
    * subset (a post-filter of an unfiltered top-k under-returns —
    * the classic filtered-ANN mistake); the semi-join is an equi-join
    * the planner broadcasts when the allowed set is small. */
  def sq8TopKFromIndex(catalog: TableCatalog, indexTable: String,
                       queries: DataFrame, idCol: String, vecCol: String,
                       k: Int,
                       allowedIds: Option[DataFrame] = None,
                       allowedIdCol: String = "id",
                       metric: Option[String] = None): DataFrame = {
    val m = readMeta(catalog, indexTable, "sq8")
    // metric is served from the META, like the geometry: None = the
    // recorded one; an explicit request that disagrees with the build
    // is refused loudly (scoring a cosine corpus by inner product
    // would silently return magnitude-ranked garbage)
    metric.foreach { req =>
      require(req == m.metric,
        s"AnnIndex: '$indexTable' was built for metric '${m.metric}' " +
          s"but the probe requested '$req' — probes serve the " +
          "RECORDED metric; rebuild with the desired one")
    }
    val baseCols = Seq(col("id").as("vec_id"), col("q").as("vec_id_q"),
      col("qq").as("vec_id_qq"))
    // the scale column only exists on post-r16 layouts and is only
    // read when the metric needs it — cosine probes of an older index
    // keep working (and keep their byte-identical plans)
    val cols = if (m.metric == "cosine") baseCols
               else baseCols :+ col("sc").as("vec_id_sc")
    val d = restrictTo(liveAssign(catalog, indexTable),
        allowedIds, allowedIdCol)
      .select(cols: _*)
    Ann.sq8TopKFrom(d,
      Ann.sq8Quantized(queries, idCol, vecCol, "q_id", m.dim), k,
      m.dim, m.metric)
  }

  /** Semantic-decontamination hit list off the persisted SQ8 index:
    * DISTINCT ids of indexed vectors whose quantized cosine against
    * ANY query row reaches `minCos` — the rows a decon pass drops,
    * probed from the stored byte codes alone (floats never touched;
    * only the benchmark-sized query side quantizes per call). The
    * LIVE-index complement of [[Ann.semanticDecontaminate]]'s
    * fit-inline banded scan. */
  def sq8MatchesFromIndex(catalog: TableCatalog, indexTable: String,
                          queries: DataFrame, idCol: String,
                          vecCol: String, minCos: Double): DataFrame = {
    val m = readMeta(catalog, indexTable, "sq8")
    // the hit threshold is a COSINE — an ip/l2 index's scores live on
    // a different scale entirely, so refuse rather than mis-threshold
    require(m.metric == "cosine",
      s"AnnIndex: decontamination thresholds are cosine but " +
        s"'$indexTable' records metric '${m.metric}'")
    val d = liveAssign(catalog, indexTable)
      .select(col("id").as("vec_id"), col("q").as("vec_id_q"),
        col("qq").as("vec_id_qq"))
    Ann.sq8Matches(d,
      Ann.sq8Quantized(queries, idCol, vecCol, "q_id", m.dim),
      minCos, m.dim)
  }

  /** Build + persist the PQ index: train the per-subspace codebooks
    * ONCE ([[Ann.pqTrain]] — on `trainData` when bulk-loading a slice
    * now and appending the rest later), encode every vector to its M
    * codebook cells, write the codebooks (`_pqcent`: m, cell, pos,
    * val) and the code segment. The serving payoff is the largest of
    * the index family: probes read M small ints per vector (4 bytes
    * packed) instead of Dim floats. Codebooks are a corpus-level fit,
    * so the [[MaxDriftFactor]] staleness contract applies like IVF's. */
  def buildPq(catalog: TableCatalog, data: DataFrame, idCol: String,
              vecCol: String, indexTable: String, trainIters: Int = 2,
              trainData: Option[DataFrame] = None,
              geom: Ann.Geom = Ann.DefaultGeom): Unit = {
    val spark = data.sparkSession
    import spark.implicits._
    val books = Ann.pqTrain(trainData.getOrElse(data), idCol, vecCol,
      trainIters, geom)
    val n = data.count()
    val fitN = trainData.map(_.count()).getOrElse(n)
    val rows = for {
      m <- books.indices
      j <- books(m).indices
      (x, p) <- books(m)(j)._1.zipWithIndex
    } yield (m, j, p, x)
    catalog.withTableLock(assignTableOf(indexTable)) {
      markRebuilding(catalog, indexTable)
      // disjoint-table artifact writes as concurrent lanes; meta last
      // (the buildIvfPq pattern)
      graft.core.Par.concurrently(Seq(
        () => catalog.writeFull(rows.toDF("m", "cell", "pos", "val"),
          indexTable + "_pqcent"),
        () => {
          writeSeg(catalog, indexTable,
            assignPq(data, idCol, vecCol, books, geom), "0", "pk")
          dropOtherSegs(catalog, indexTable, keep = "0")
          drainDels(catalog, indexTable)
        }))
      writeSegCounts(catalog, indexTable, Map("0" -> n))
      writeMeta(catalog, indexTable, "pq", geom.pqK, geom.dim,
        geom.pqM, geom.pqK, fitN, n)
    }
  }

  /** Append new vectors to a persisted PQ index — encode under the
    * LOADED codebooks (never re-derived), land as one new segment.
    * Same lock / replay / drift contract as [[appendIvf]]. */
  def appendPq(catalog: TableCatalog, data: DataFrame, idCol: String,
               vecCol: String, indexTable: String,
               segKey: Option[String] = None,
               allowStale: Boolean = false): Unit =
    catalog.withTableLock(assignTableOf(indexTable)) {
      val m = readMeta(catalog, indexTable, "pq")
      val books = readBooks(catalog, indexTable)
      appendSeg(catalog, indexTable, m,
        assignPq(data, idCol, vecCol, books, m.geom), data.count(),
        segKey, "pk", allowStale)
    }

  /** ADC top-k off the persisted codes — [[Ann.pqTopK]] without the
    * training or encoding passes: codebooks load as a driver constant
    * (M·K·subDim doubles), the corpus side is nothing but the stored
    * code columns. Bit-identical to fit-inline ann13 (codes are a
    * pure function of vector × frozen codebooks), gated by ann14
    * against the ann13 oracle. */
  def pqTopKFromIndex(catalog: TableCatalog, indexTable: String,
                      queries: DataFrame, idCol: String, vecCol: String,
                      k: Int, allowStale: Boolean = false,
                      allowedIds: Option[DataFrame] = None,
                      allowedIdCol: String = "id"): DataFrame = {
    val m = readMeta(catalog, indexTable, "pq")
    requireFresh(m, indexTable, allowStale)
    val books = readBooks(catalog, indexTable)
    // filtered search: restrict the code scan BEFORE the ADC scoring
    // and the rank cut (the [[sq8TopKFromIndex]] contract)
    val codes = restrictTo(liveAssign(catalog, indexTable),
        allowedIds, allowedIdCol)
      .select(col("id") +:
        (0 until m.pqM).map(i => col(s"c$i")): _*)
    Ann.pqTopKFromCodes(codes, books, queries, idCol, vecCol, k, m.geom)
  }

  /** Build + persist the residual IVF-PQ index (the ann16 IVFADC
    * serving shape as an artifact): the L2 coarse quantizer fits over
    * the unit vectors of `trainData` (default: the build corpus),
    * residual codebooks fit over the same corpus's residuals, and
    * every `data` vector lands as (id, cell, c0…c_{M−1}) in a
    * CELL-partitioned segment — probes prune to nprobe/numCells at the
    * storage layer AND read 4 code ints per survivor. Floats are NOT
    * stored: the refine stage reads them from the primary vector
    * table (the classic two-stage fetch — see
    * [[ivfPqRefineTopKFromIndex]]). Both fits are corpus-level, so the
    * [[MaxDriftFactor]] staleness contract applies. */
  def buildIvfPq(catalog: TableCatalog, data: DataFrame, idCol: String,
                 vecCol: String, indexTable: String, numCells: Int = 16,
                 trainIters: Int = 2, pqIters: Int = 2,
                 trainData: Option[DataFrame] = None,
                 geom: Ann.Geom = Ann.DefaultGeom,
                 metric: String = "cosine"): Unit = {
    val spark = data.sparkSession
    import spark.implicits._
    // metric recorded at build time beside the geometry ([[buildSq8]]
    // contract): cosine | l2 — the residual machinery is metric-blind
    // past the (un)normalization choice ([[Ann.metricFrame]]); ip is
    // refused there with a pointer at the SQ8 family, whose
    // dequantized dot IS the ip score
    val trainUn = Ann.metricFrame(trainData.getOrElse(data), idCol,
      vecCol, geom.dim, metric)
    val cents = Ann.kmeansCentroidsL2(
      trainUn.select(col("id"), col("u").as("s")), numCells, trainIters)
    val books = Ann.pqTrainOn(Ann.residualFrame(trainUn, cents),
      pqIters, geom)
    val n = data.count()
    val fitN = trainData.map(_.count()).getOrElse(n)
    val centRows = cents.zipWithIndex.flatMap { case ((v, _), c) =>
      v.zipWithIndex.map { case (x, p) => (c, p, x) }
    }.toSeq
    val bookRows = for {
      m <- books.indices
      j <- books(m).indices
      (x, p) <- books(m)(j)._1.zipWithIndex
    } yield (m, j, p, x)
    catalog.withTableLock(assignTableOf(indexTable)) {
      markRebuilding(catalog, indexTable)
      // the three artifact writes land in disjoint tables and nothing
      // reads them until writeMeta commits (markRebuilding refuses
      // every probe until then) — concurrent lanes, meta last
      graft.core.Par.concurrently(Seq(
        () => catalog.writeFull(centRows.toDF("cell", "pos", "val"),
          indexTable + "_cent"),
        () => catalog.writeFull(bookRows.toDF("m", "cell", "pos", "val"),
          indexTable + "_pqcent"),
        () => {
          writeSeg(catalog, indexTable,
            assignIvfPq(data, idCol, vecCol, cents, books, geom, metric),
            "0", "cell")
          dropOtherSegs(catalog, indexTable, keep = "0")
          drainDels(catalog, indexTable)
        }))
      writeSegCounts(catalog, indexTable, Map("0" -> n))
      writeMeta(catalog, indexTable, "ivfpq", numCells, geom.dim,
        geom.pqM, geom.pqK, fitN, n, metric)
    }
  }

  /** Append new vectors to a persisted residual IVF-PQ index — cell
    * assignment, residual, and codes all under the LOADED fits (never
    * re-derived), one new cell-partitioned segment. Same lock /
    * replay / drift contract as [[appendIvf]]. */
  def appendIvfPq(catalog: TableCatalog, data: DataFrame, idCol: String,
                  vecCol: String, indexTable: String,
                  segKey: Option[String] = None,
                  allowStale: Boolean = false): Unit =
    catalog.withTableLock(assignTableOf(indexTable)) {
      val m = readMeta(catalog, indexTable, "ivfpq")
      val cents = readCentroidsL2(catalog, indexTable)
      val books = readBooks(catalog, indexTable)
      appendSeg(catalog, indexTable, m,
        assignIvfPq(data, idCol, vecCol, cents, books, m.geom,
          m.metric),
        data.count(), segKey, "cell", allowStale)
    }

  /** Two-stage probe off the persisted residual IVF-PQ index: cell
    * pruning × residual ADC from the stored codes alone, then the
    * top-`refine` candidates per query re-scored EXACTLY from
    * `store` — the PRIMARY vector table, joined by id (floats touched
    * for refine rows per query, never the corpus). Bit-identical to
    * the fit-inline [[Ann.ivfPqResidualTopK]] over the same corpus
    * (codes and cells are pure functions of vector × frozen fits;
    * unit vectors recompute exactly from the store) — gated by ann17
    * against the ann16 oracle. */
  def ivfPqRefineTopKFromIndex(catalog: TableCatalog, indexTable: String,
                               store: DataFrame, queries: DataFrame,
                               idCol: String, vecCol: String, k: Int,
                               nprobe: Int = 2, refine: Int = 4096,
                               allowStale: Boolean = false,
                               broadcastQueries: Boolean = true,
                               allowedIds: Option[DataFrame] = None,
                               allowedIdCol: String = "id",
                               metric: Option[String] = None)
      : DataFrame = {
    val m = readMeta(catalog, indexTable, "ivfpq")
    requireFresh(m, indexTable, allowStale)
    // the [[sq8TopKFromIndex]] metric contract: served from the META,
    // an explicit disagreeing request refused loudly
    metric.foreach { req =>
      require(req == m.metric,
        s"AnnIndex: '$indexTable' was built for metric '${m.metric}' " +
          s"but the probe requested '$req' — probes serve the " +
          "RECORDED metric; rebuild with the desired one")
    }
    val cents = readCentroidsL2(catalog, indexTable)
    val books = readBooks(catalog, indexTable)
    // `allowedIds` = filtered search (the [[sq8TopKFromIndex]]
    // contract): the semi-join lands BEFORE the ADC scoring AND before
    // the code-rank cut, so both the candidate ranks and the refine
    // budget are spent inside the allowed subset only
    val codes = restrictTo(liveAssign(catalog, indexTable),
        allowedIds, allowedIdCol)
      .select(col("id") +: col("cell").cast("int").as("cell") +:
        (0 until m.pqM).map(i => col(s"c$i")): _*)
    Ann.ivfPqRefineProbe(codes, cents, books,
      Ann.metricFrame(store, idCol, vecCol, m.dim, m.metric), queries,
      idCol, vecCol, k, nprobe, refine, broadcastQueries, m.geom,
      m.metric)
  }

  /** One streaming-ingestion micro-batch into a persisted SQ8 index —
    * the `foreachBatch` body for a live embedding feed (the ann19
    * shape, lifted to a reusable sink with a COMPACTION CADENCE): the
    * batch lands as segment `b<batchId>`, so a replayed micro-batch
    * overwrites its own segment and the sink is idempotent end to
    * end; and once the index holds `compactEvery` or more other
    * segments the appended directories fold back into one
    * ([[compactSegs]] — the
    * [[graft.streaming.CorpusStream]] `compactState` cadence), so the
    * directory count a probe pays stays bounded under continuous
    * ingestion instead of growing one segment per micro-batch
    * forever. `compactEvery = 0` disables the cadence.
    *
    * Replay note: the cadence decision is a PURE FUNCTION of batchId
    * (`batchId % compactEvery == compactEvery - 1`), never of the
    * directory count — so a replayed batch re-takes exactly the
    * original run's compaction decision. In particular a replay of a
    * batch whose own run compacted (folding its rows into seg 0)
    * re-appends duplicate rows AND deterministically re-fires the
    * compaction, whose full-row distinct collapses them — converged by
    * the end of the replayed batch. (A count-based trigger would see
    * the post-compaction single-segment directory and skip, serving
    * duplicate ranks until some later batch compacted.) Out-of-band
    * maintenance [[compactSegs]] runs belong BETWEEN committed
    * batches; one run inside a crash window is still safe — the
    * replay converges at its next cadence firing. */
  def ingestSq8Batch(catalog: TableCatalog, df: DataFrame,
                     idCol: String, vecCol: String, indexTable: String,
                     batchId: Long, compactEvery: Int = 0): Unit =
    ingestBatch(catalog, df, idCol, vecCol, indexTable, batchId,
      compactEvery)

  /** [[ingestSq8Batch]] for ANY index kind: reads the persisted meta
    * and dispatches the batch through the matching append — the one
    * foreachBatch body a live deployment points at whichever artifact
    * it serves (the residual IVF-PQ index included, so the quality
    * serving shape gets the same streaming story as SQ8). Same
    * idempotency (segKey = b<batchId>) and compaction cadence; the
    * fit-bearing kinds keep their [[MaxDriftFactor]] staleness
    * contract — a drifted index fails the batch loudly unless
    * `allowStale`. */
  def ingestBatch(catalog: TableCatalog, df: DataFrame,
                  idCol: String, vecCol: String, indexTable: String,
                  batchId: Long, compactEvery: Int = 0,
                  allowStale: Boolean = false): Unit = {
    require(compactEvery >= 0,
      s"compactEvery must be >= 0, got $compactEvery")
    require(catalog.tableExists(indexTable),
      s"AnnIndex: no index meta at '$indexTable' — seed-build it " +
        "before pointing the ingestion sink at it")
    val row = catalog.read(indexTable).collect()(0)
    val kind = row.getString(row.fieldIndex("kind"))
    val key = s"b$batchId"
    kind match {
      case "sq8" =>
        appendSq8(catalog, df, idCol, vecCol, indexTable, Some(key))
      case "ivfpq" =>
        appendIvfPq(catalog, df, idCol, vecCol, indexTable, Some(key),
          allowStale)
      case "pq" =>
        appendPq(catalog, df, idCol, vecCol, indexTable, Some(key),
          allowStale)
      case "ivf" =>
        appendIvf(catalog, df, idCol, vecCol, indexTable, Some(key),
          allowStale)
      case "lsh" =>
        appendLsh(catalog, df, idCol, vecCol, indexTable, Some(key),
          allowStale)
      case other =>
        // 'rebuilding' lands here too — readMeta inside the appends
        // would also refuse, but fail with the precise story up front
        throw new IllegalArgumentException(
          s"AnnIndex: cannot ingest into '$indexTable' (kind '$other')")
    }
    // the cadence is a pure function of batchId, NOT of the directory
    // count: a replayed batch whose original run already compacted
    // must deterministically re-fire its compaction (the directory
    // count it would otherwise consult is post-compaction — 1 segment
    // — so a count-based trigger would skip, leaving the replay's
    // duplicate rows served until some later batch happens to compact)
    if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
      compactSegs(catalog, indexTable)
  }

  /** [[ingestBatch]] for a change-data feed: each micro-batch carries
    * `opCol` = "add" | "delete" rows, and the sink applies the deletes
    * (as one [[deleteIds]] tombstone batch) then the adds (through the
    * kind-generic append) — the one foreachBatch body a live embedding
    * store points at when its upstream emits removals (takedowns,
    * expirations) alongside inserts. Both halves land under
    * segKey/dseg `b<batchId>`, so a replayed micro-batch overwrites
    * its own tombstone partition AND its own segment — idempotent end
    * to end (a replay after a compaction drained the tombstones
    * re-creates no-op tombstones against already-purged rows; the next
    * compaction drains them again). The replay contract is the
    * streaming engine's: only the MOST RECENT uncommitted batch ever
    * replays, and that replay converges; an out-of-band re-run of an
    * OLDER batch is out of contract once a later batch deleted any of
    * its adds and a compaction purged them — the re-run would re-add
    * rows whose tombstones are gone. Deletes apply FIRST: a batch that
    * deletes and re-adds the same id is ambiguous under id-level
    * tombstones, and the append's re-insert guard refuses it loudly
    * (delete now, re-insert after the next [[compactSegs]]). The
    * `compactEvery` cadence rides on the add half. */
  def ingestCdcBatch(catalog: TableCatalog, df: DataFrame,
                     idCol: String, vecCol: String, opCol: String,
                     indexTable: String, batchId: Long,
                     compactEvery: Int = 0,
                     allowStale: Boolean = false): Unit = {
    // NULL op must be refused explicitly: `!isin(...)` evaluates to
    // NULL for a NULL op, which a filter drops — a null-op row would
    // pass the guard yet match neither half below, a silently-dropped
    // CDC row (possibly a takedown)
    require(df.filter(col(opCol).isNull ||
        !col(opCol).isin("add", "delete")).isEmpty,
      s"AnnIndex: '$opCol' must be 'add' or 'delete' in every row")
    // skip the tombstone write for delete-free batches: an empty
    // deleteIds leaves a marker-only dseg= partition, and under a
    // compacted single-segment index those accumulate one directory
    // (and one probe-side listing) per micro-batch forever
    val dels = df.filter(col(opCol) === "delete")
    if (!dels.isEmpty)
      deleteIds(catalog, dels, idCol, indexTable, Some(s"b$batchId"))
    ingestBatch(catalog, df.filter(col(opCol) === "add"), idCol,
      vecCol, indexTable, batchId, compactEvery, allowStale)
  }

  /** Delete vectors from a persisted index by id — the takedown path:
    * the batch lands as one `dseg=` tombstone partition (O(batch),
    * never a corpus rewrite) and every probe excludes tombstoned ids
    * from that moment on. Works on every index kind (the tombstone is
    * id-level, upstream of any geometry). Idempotent under replay:
    * `segKey` (default: next numeric delete-segment) makes a replaying
    * caller overwrite its own tombstone partition; deleting an id the
    * index never held is a harmless no-op tombstone. Physical removal
    * happens at the next [[compactSegs]], which also DRAINS the
    * tombstones — until then, re-inserting a deleted id is refused
    * loudly (see [[compactSegs]]'s purge note), so a delete can never
    * silently hide a newer row.
    *
    * `indexed_n` (and the [[MaxDriftFactor]] drift check) keeps
    * counting STORED rows until the purge — conservative: the fit
    * covered the stored rows, and the live set only shrinks. */
  def deleteIds(catalog: TableCatalog, ids: DataFrame, idCol: String,
                indexTable: String,
                segKey: Option[String] = None): Unit =
    catalog.withTableLock(assignTableOf(indexTable)) {
      require(catalog.tableExists(indexTable),
        s"AnnIndex: no index meta at '$indexTable' — nothing to " +
          "delete from")
      val row = catalog.read(indexTable).collect()(0)
      require(row.getString(row.fieldIndex("kind")) != "rebuilding",
        s"AnnIndex: a rebuild of '$indexTable' crashed mid-write — " +
          "re-run the build before deleting from it")
      val delsTable = delsTableOf(indexTable)
      val key = segKey.getOrElse {
        (catalog.listPartitions(delsTable, "dseg")
          .flatMap(s => scala.util.Try(s.toLong).toOption)
          .foldLeft(0L)(math.max) + 1L).toString
      }
      catalog.writePartition(
        ids.select(checkedId(idCol, "delete").as("id")).distinct()
          .withColumn("dseg", lit(key)),
        delsTable, "dseg", key)
    }

  /** Merge every assignment segment back into a single `seg=0` — the
    * file-count hygiene step after many appends. Each append adds one
    * segment directory; probes read them all, and at high append
    * rates the DIRECTORY count (not the data) becomes the probe cost —
    * the same growth `CorpusStream.compactState` bounds for the
    * streaming state. Re-layout of the LIVE rows: one segment, with
    * any [[deleteIds]] tombstones physically PURGED and then drained
    * (round 15) — probes already excluded them at read time, so probe
    * results before and after are bit-identical (spec-pinned), and
    * after the purge a previously-deleted id is free for re-insert.
    * Runs under the table lock.
    *
    * Crash contract: the input rows are materialized BEFORE any
    * delete, so no crash loses data — but a crash between the seg-0
    * rewrite and the old-segment drops leaves duplicate rows visible
    * to probes until compaction is re-run. The re-run CONVERGES: the
    * read is full-row `distinct()` (identical rows per id — segments
    * are pure functions of vector × frozen fits), so leftovers
    * collapse back to the exact set. Tombstones drain strictly LAST —
    * a crash anywhere earlier leaves them standing, where their
    * read-time anti-join is a harmless no-op against already-purged
    * rows. Schedule it like any maintenance job: re-run on failure
    * before serving. */
  def compactSegs(catalog: TableCatalog, indexTable: String): Unit =
    catalog.withTableLock(assignTableOf(indexTable)) {
      val assignTable = assignTableOf(indexTable)
      require(catalog.tableExists(indexTable),
        s"AnnIndex: no index meta at '$indexTable' — nothing to compact")
      val row = catalog.read(indexTable).collect()(0)
      val kind = row.getString(row.fieldIndex("kind"))
      val m = readMeta(catalog, indexTable, kind)
      val segs = catalog.listPartitions(assignTable, "seg")
      val dels = deletedIds(catalog, indexTable)
      if (segs.size > 1 || dels.nonEmpty) {
        val subField =
          if (kind == "ivf" || kind == "ivfpq") "cell" else "pk"
        // materialize the full LIVE set before touching any directory;
        // the distinct is what makes a crashed compaction re-runnable,
        // and the anti-join is the physical purge of deleteIds
        // tombstones (probes already excluded them at read time)
        val stored = catalog.read(assignTable).drop("seg").distinct()
        val all = graft.core.Fence(dels
          .map(d => stored.join(d, Seq("id"), "left_anti"))
          .getOrElse(stored))
        // same tombstone discipline as appendSeg: seg 0 is about to be
        // overwritten, so its recorded count must go first — a crash
        // mid-rewrite then recounts seg 0 from disk instead of
        // trusting a count for data that may be half-replaced
        writeSegCounts(catalog, indexTable,
          readSegCounts(catalog, indexTable) - "0")
        // count the materialized set rather than trusting the meta:
        // compaction is the natural self-heal point after any crashed
        // append (orphan segment not yet in the counts) or crashed
        // prior compaction (duplicates the distinct just collapsed).
        // The count and the seg-0 rewrite both read the fenced live
        // set and are independent — concurrent lanes; the count commits
        // nothing, so the crash contract is the rewrite lane's alone.
        val n = graft.core.Par.concurrently(Seq[() => Any](
          () => all.count(),
          () => {
            writeSeg(catalog, indexTable, all, "0", subField)
            dropOtherSegs(catalog, indexTable, keep = "0")
          }))(0).asInstanceOf[Long]
        writeSegCounts(catalog, indexTable, Map("0" -> n))
        writeMeta(catalog, indexTable, m.kind, m.geometry, m.dim,
          m.pqM, m.pqK, m.fittedN, n, m.metric)
        // drain the tombstones LAST: their rows are already gone from
        // seg 0, so a crash before this point leaves tombstones whose
        // anti-join is a no-op (correct, just unpurged) and the re-run
        // converges; after it, a previously-deleted id is free for
        // re-insert
        drainDels(catalog, indexTable)
      } else
        // single-segment + no live tombstone rows: still drain any
        // marker-only (data-file-free) dseg partitions, so they can't
        // accumulate a directory listing per probe forever
        drainDels(catalog, indexTable)
    }

  /** Within-bucket top-1 neighbors from a persisted LSH index — the
    * [[Ann.lshBucketNeighborsAuto]] result without the count, the
    * norm pass, or the planes×dim bucketing dots: everything comes
    * off the assignment table. Fails on a stale index (corpus grown
    * past [[MaxDriftFactor]] × the fitted size) unless `allowStale`. */
  def lshNeighborsFromIndex(catalog: TableCatalog, indexTable: String,
                            allowStale: Boolean = false,
                            allowedIds: Option[DataFrame] = None,
                            allowedIdCol: String = "id"): DataFrame = {
    val m = readMeta(catalog, indexTable, "lsh")
    requireFresh(m, indexTable, allowStale)
    // filtered search: the neighbor join runs entirely inside the
    // allowed subset (both the row being matched and its candidates),
    // restricted BEFORE bucketing fans out
    Ann.bucketNeighborsFrom(
      graft.core.Fence(restrictTo(liveAssign(catalog, indexTable),
          allowedIds, allowedIdCol)
        .select(col("id"), col("v"), col("nrm"), col("bucket"))),
      Ann.NearDupHotCap, Ann.NearDupHotSalts, m.dim)
  }

  /** Top-k from a persisted IVF index — the [[Ann.ivfTopK]] result
    * without the Lloyd rounds or the corpus assignment pass: the
    * probe loads the trained centroids (a numCells×dim driver
    * constant, same bound as the broadcast the fit-inline form
    * already pays) and equi-joins the probed cells against the
    * cell-partitioned assignment table. Same staleness contract as
    * [[lshNeighborsFromIndex]]. */
  def ivfTopKFromIndex(catalog: TableCatalog, indexTable: String,
                       queries: DataFrame, idCol: String, vecCol: String,
                       k: Int, nprobe: Int = 2,
                       allowStale: Boolean = false,
                       allowedIds: Option[DataFrame] = None,
                       allowedIdCol: String = "id"): DataFrame = {
    val m = readMeta(catalog, indexTable, "ivf")
    requireFresh(m, indexTable, allowStale)
    val cents = readCentroids(catalog, indexTable)
    // filtered search (the [[sq8TopKFromIndex]] contract): the
    // allowed-id semi-join lands on the assignment scan BEFORE the
    // cell equi-join and scoring, so k fills from the allowed subset
    val assigned = restrictTo(liveAssign(catalog, indexTable),
        allowedIds, allowedIdCol)
      .select(col("id"), col("v"), col("nrm"),
        col("cell").cast("int").as("cell"))
    Ann.ivfProbe(assigned, cents, queries, idCol, vecCol, k, nprobe,
      m.dim)
  }

  // ---- internals ------------------------------------------------------

  /** Drop every `dseg=` tombstone partition — called by each REBUILD
    * inside its locked block: the new index generation starts from a
    * clean slate, and tombstones recorded against the PREVIOUS
    * generation's rows must not silently hide a rebuilt corpus's
    * legitimate re-use of a previously-deleted id (the exact silent
    * hide the append re-insert guard refuses loudly). */
  private def drainDels(catalog: TableCatalog,
                        indexTable: String): Unit =
    catalog.listPartitions(delsTableOf(indexTable), "dseg")
      .foreach(catalog.deletePartition(delsTableOf(indexTable),
        "dseg", _))

  /** The current tombstone set as a distinct-id frame — None when no
    * delete has landed (the common case), so callers skip the
    * anti-join entirely and pre-delete plans stay byte-identical. */
  private def deletedIds(catalog: TableCatalog,
                         indexTable: String): Option[DataFrame] = {
    val delsTable = delsTableOf(indexTable)
    // data-file check, not just directory presence: an empty delete
    // batch leaves a marker-only partition no reader can infer a
    // schema from (and nothing to anti-join anyway)
    if (!catalog.tableExists(delsTable) ||
        !catalog.listPartitions(delsTable, "dseg")
          .exists(catalog.partitionHasDataFiles(delsTable, "dseg", _)))
      None
    else Some(catalog.read(delsTable).select(col("id")).distinct())
  }

  /** The caller's id column as the index's long id — raising per row,
    * with the domain story, on a value that does not cast (under
    * non-ANSI sessions a plain cast nulls silently, and a null would
    * anti-join or semi-join NOTHING: a delete that doesn't delete, a
    * filter that filters everything, with no error either way;
    * try_cast keeps the check mode-independent). */
  private def checkedId(idCol: String, what: String): org.apache.spark.sql.Column = {
    val tryLong = expr(s"try_cast(`$idCol` as bigint)")
    // NULL ids raise too (not just failed casts): a null id row would
    // anti-join/semi-join NOTHING — a delete that silently doesn't
    // delete, a filter that silently excludes everything
    when(col(idCol).isNull, raise_error(lit(
        s"AnnIndex: $what id is NULL — it would silently match nothing")))
      .when(tryLong.isNull,
        raise_error(concat(lit(s"AnnIndex: $what id '"),
          col(idCol).cast("string"),
          lit("' is not a long — it would silently match nothing"))))
      .otherwise(tryLong)
  }

  /** Pre-filter for FILTERED search: semi-join the code/assignment
    * scan down to the caller's allowed ids before any scoring. None =
    * unrestricted, no join added. */
  private def restrictTo(assign: DataFrame, allowedIds: Option[DataFrame],
                         allowedIdCol: String): DataFrame =
    allowedIds match {
      case Some(a) => assign.join(
        a.select(checkedId(allowedIdCol, "allowed").as("id")).distinct(),
        Seq("id"), "left_semi")
      case None => assign
    }

  /** The assignment table a probe may serve: stored rows minus
    * tombstoned ids ([[deleteIds]]). Every probe reads through this —
    * deletion is honored at read time, physical removal waits for
    * [[compactSegs]]. */
  private def liveAssign(catalog: TableCatalog,
                         indexTable: String): DataFrame = {
    val assign = catalog.read(assignTableOf(indexTable))
    deletedIds(catalog, indexTable) match {
      case Some(d) => assign.join(d, Seq("id"), "left_anti")
      case None    => assign
    }
  }

  private def assignLsh(data: DataFrame, idCol: String, vecCol: String,
                        planes: Int, dim: Int): DataFrame =
    data.select(col(idCol).as("id"),
        Ann.checkedVec(Ann.toDouble(col(vecCol)), dim).as("v"))
      .withColumn("nrm", sqrt(Ann.dotUnrolled(col("v"), col("v"), dim)))
      .withColumn("bucket", Ann.bucket(col("v"), planes, dim))
      .withColumn("pk", pmod(col("bucket"), lit(LshPkBuckets)))

  /** (id, codes-as-tinyint, integer self-dot, pk): codes are always in
    * [-127, 127] so the byte cast is lossless, and parquet's
    * annotated-int8 + dictionary encoding stores them at code (not
    * float) width — the scan-cost saving the index exists for. pk
    * sub-layout bounds directory counts and serves point lookups;
    * a top-k probe scans all buckets by design (brute force). */
  private def assignSq8(data: DataFrame, idCol: String,
                        vecCol: String, dim: Int): DataFrame =
    Ann.sq8Quantized(data, idCol, vecCol, "id", dim)
      .select(col("id"),
        transform(col("id_q"), x => x.cast("byte")).as("q"),
        col("id_qq").as("qq"),
        col("id_sc").as("sc"))
      .withColumn("pk", pmod(col("id"), lit(LshPkBuckets)))

  /** (id, c0 … c_{M−1}, pk): the PQ code row — M small ints per
    * vector ([[Ann.pqEncode]]), pk sub-layout as in [[assignSq8]]. */
  private def assignPq(data: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[(Seq[Double], Double)]],
      geom: Ann.Geom): DataFrame =
    Ann.pqEncode(data, idCol, vecCol, books, geom)
      .withColumn("pk", pmod(col("id"), lit(LshPkBuckets)))

  /** Codebooks back from `_pqcent`, with self-dots recomputed by the
    * same left fold the training used — the (values, self-dot) shape
    * [[Ann.centroidScoresL2]] assigns against. */
  private def readBooks(catalog: TableCatalog,
      indexTable: String): Array[Array[(Seq[Double], Double)]] = {
    def selfDot(v: Seq[Double]): Double = {
      var t = 0.0; var i = 0
      while (i < v.length) { t += v(i) * v(i); i += 1 }
      t
    }
    catalog.read(indexTable + "_pqcent")
      .orderBy(col("m"), col("cell"), col("pos")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, mRows) =>
        mRows.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
          .map { case (_, rows) =>
            val v: Seq[Double] = rows.sortBy(_.getInt(2))
              .map(_.getDouble(3)).toSeq
            (v, selfDot(v))
          }.toArray
      }.toArray
  }

  private def assignIvf(data: DataFrame, idCol: String, vecCol: String,
                        cents: Array[(Seq[Double], Double)],
                        dim: Int): DataFrame =
    Ann.withNorms(data, idCol, vecCol, dim)
      .withColumn("cell",
        array_max(Ann.centroidScores(cents, col("v"), col("nrm")))
          .getField("cell"))

  /** (id, cell, c0 … c_{M−1}): the residual IVF-PQ code row — L2 cell
    * under the frozen coarse quantizer, residual encoded under the
    * frozen codebooks ([[Ann.residualFrame]] + [[Ann.pqEncodeOn]]). */
  private[ann] def assignIvfPq(data: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Seq[Double], Double)],
      books: Array[Array[(Seq[Double], Double)]],
      geom: Ann.Geom, metric: String): DataFrame =
    Ann.pqEncodeOn(
      Ann.residualFrame(
        Ann.metricFrame(data, idCol, vecCol, geom.dim, metric), cents),
      books, keep = Seq("id", "cell"), geom)

  /** Centroids back from `_cent` as (values, SELF-DOT) — the shape
    * [[Ann.centroidScoresL2]] assigns against (the cosine family's
    * [[readCentroids]] carries (values, norm) instead). */
  private def readCentroidsL2(catalog: TableCatalog,
      indexTable: String): Array[(Seq[Double], Double)] = {
    def selfDot(v: Seq[Double]): Double = {
      var t = 0.0; var i = 0
      while (i < v.length) { t += v(i) * v(i); i += 1 }
      t
    }
    catalog.read(indexTable + "_cent")
      .orderBy(col("cell"), col("pos")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        val v: Seq[Double] = rows.sortBy(_.getInt(1))
          .map(_.getDouble(2)).toSeq
        (v, selfDot(v))
      }.toArray
  }

  /** One assignment segment: overwrites exactly `_assign/seg=<key>`
    * (other segments untouched), sub-laid-out by pk (LSH) or cell
    * (IVF). `repartition(subField)` first so each sub-directory gets
    * ~one file instead of one per shuffle task. */
  private[ann] def writeSeg(catalog: TableCatalog, indexTable: String,
                       assigned: DataFrame, segKey: String,
                       subField: String): Unit =
    catalog.writeSubPartitioned(
      assigned.withColumn("seg", lit(segKey))
        .repartition(col(subField)),
      assignTableOf(indexTable), "seg", segKey, subField)

  /** Per-segment row counts, the O(#segments) metadata that makes an
    * append O(batch): `indexed_n` is the sum of the OTHER segments'
    * recorded counts plus the incoming batch — never a corpus-sized
    * recount of the assignment table (the r13 form read and counted
    * the whole table on every append). The `_segmeta` table holds one
    * (seg, rows) row per segment and is fully rewritten inside the
    * table lock on every build/append — O(#segments), tiny.
    *
    * Reconciliation keeps the count exact without trusting `_segmeta`
    * blindly: any `seg=` partition present on disk but absent from the
    * table (a pre-r14 index, or a crash between the segment write and
    * the `_segmeta` write) is counted directly — partition pruning
    * makes that O(that segment), and under the replay contract it
    * happens at most once per such segment. */
  private def readSegCounts(catalog: TableCatalog,
                            indexTable: String): Map[String, Long] = {
    val assignTable = assignTableOf(indexTable)
    val known: Map[String, Long] =
      if (!catalog.tableExists(segMetaTableOf(indexTable))) Map.empty
      else catalog.read(segMetaTableOf(indexTable)).collect()
        .map(r => (r.getString(r.fieldIndex("seg")),
          r.getLong(r.fieldIndex("rows")))).toMap
    val onDisk = catalog.listPartitions(assignTable, "seg")
    val unrecorded = onDisk.filterNot(known.contains)
    known.view.filterKeys(onDisk.contains).toMap ++
      unrecorded.map { s =>
        s -> catalog.read(assignTable)
          .filter(col("seg").cast("string") === s).count()
      }.toMap
  }

  private def writeSegCounts(catalog: TableCatalog, indexTable: String,
                             counts: Map[String, Long]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    catalog.writeFull(
      counts.toSeq.sortBy(_._1).toDF("seg", "rows"),
      segMetaTableOf(indexTable))
  }

  private def appendSeg(catalog: TableCatalog, indexTable: String,
                        m: Meta, assigned: DataFrame, incoming: Long,
                        segKey: Option[String], subField: String,
                        allowStale: Boolean): Unit = {
    val assignTable = assignTableOf(indexTable)
    val key = segKey.getOrElse {
      val next = catalog.listPartitions(assignTable, "seg")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .foldLeft(0L)(math.max) + 1
      next.toString
    }
    // post-append total, exact under replay: rows outside this segment
    // plus the incoming batch (a replayed segKey overwrites itself —
    // its old count drops out of the sum). Checked BEFORE the write —
    // a refused append must not leave orphan segment rows that probes
    // (which read the whole table, not the meta's count) would
    // silently serve.
    val prior = readSegCounts(catalog, indexTable)
    val indexed = prior.collect {
      case (s, n) if s != key => n
    }.sum + incoming
    requireFresh(m.copy(indexedN = indexed), indexTable, allowStale)
    // re-insert guard: an id-level tombstone (deleteIds) cannot tell a
    // deleted row from a newer row under the same id — appending one
    // would be silently hidden by every probe's anti-join. Refuse
    // loudly and name the purge. Checked BEFORE any write (a refused
    // append leaves nothing behind); one O(batch ⋈ tombstones)
    // semi-join, and only when tombstones exist at all.
    deletedIds(catalog, indexTable).foreach { dels =>
      require(assigned.select(col("id"))
          .join(dels, Seq("id"), "left_semi").limit(1).isEmpty,
        s"AnnIndex: append into '$indexTable' contains ids that are " +
          "currently delete-tombstoned — run AnnIndex.compactSegs to " +
          "purge the tombstones before re-inserting a deleted id")
    }
    // replay tombstone: drop the key's recorded count BEFORE rewriting
    // its segment, so a crash mid-overwrite leaves a segment that
    // readSegCounts RECOUNTS from disk (exact for whatever the crash
    // actually left committed) instead of a stale recorded count that
    // silently misstates indexed_n until the batch is replayed
    if (prior.contains(key))
      writeSegCounts(catalog, indexTable, prior - key)
    writeSeg(catalog, indexTable, assigned, key, subField)
    writeSegCounts(catalog, indexTable,
      prior - key + (key -> incoming))
    writeMeta(catalog, indexTable, m.kind, m.geometry, m.dim,
      m.pqM, m.pqK, m.fittedN, indexed, m.metric)
  }

  private def dropOtherSegs(catalog: TableCatalog, indexTable: String,
                            keep: String): Unit =
    catalog.listPartitions(assignTableOf(indexTable), "seg")
      .filter(_ != keep)
      .foreach(catalog.deletePartition(assignTableOf(indexTable), "seg", _))

  private def readCentroids(catalog: TableCatalog,
      indexTable: String): Array[(Seq[Double], Double)] = {
    def normOf(v: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    catalog.read(indexTable + "_cent")
      .orderBy(col("cell"), col("pos")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        val v: Seq[Double] = rows.sortBy(_.getInt(1))
          .map(_.getDouble(2)).toSeq
        (v, normOf(v))
      }.toArray
  }

  private case class Meta(kind: String, geometry: Int, dim: Int,
                          pqM: Int, pqK: Int,
                          fittedN: Long, indexedN: Long,
                          metric: String) {
    /** The recorded per-call geometry probes must serve under. */
    def geom: Ann.Geom = Ann.Geom(dim, pqM, pqK)
  }

  private def writeMeta(catalog: TableCatalog, indexTable: String,
                        kind: String, geometry: Int, dim: Int,
                        pqM: Int, pqK: Int, fittedN: Long,
                        indexedN: Long,
                        metric: String = "cosine"): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    catalog.writeFull(
      Seq((kind, geometry, dim, pqM, pqK, fittedN, indexedN, metric))
        .toDF("kind", "geometry", "dim", "pq_m", "pq_k",
          "fitted_n", "indexed_n", "metric"),
      indexTable)
  }

  /** Rebuild marker: a build over an EXISTING index flips the meta to
    * kind `rebuilding` before touching any data table, so a crash
    * mid-rebuild fails every subsequent read/append/probe loudly
    * ([[readMeta]] rejects the marker by name) instead of serving a
    * mix of old-fit and new-fit rows under the old meta. The
    * successful build's final [[writeMeta]] replaces the marker; a
    * first build has no meta to mark (missing meta already reads as
    * "no index"). */
  private def markRebuilding(catalog: TableCatalog,
                             indexTable: String): Unit =
    if (catalog.tableExists(indexTable))
      writeMeta(catalog, indexTable, "rebuilding", 0, 0, 0, 0, 0L, 0L)

  private def readMeta(catalog: TableCatalog, indexTable: String,
                       kind: String): Meta = {
    require(catalog.tableExists(indexTable),
      s"AnnIndex: no index meta at '$indexTable' — build it first " +
        "(a missing meta also covers a build that crashed mid-write)")
    val row = catalog.read(indexTable).collect()(0)
    val k = row.getString(row.fieldIndex("kind"))
    require(k != "rebuilding",
      s"AnnIndex: a rebuild of '$indexTable' crashed mid-write — " +
        "re-run the build before serving from it")
    require(k == kind,
      s"AnnIndex: '$indexTable' is a '$k' index, expected '$kind'")
    val fitted = row.getLong(row.fieldIndex("fitted_n"))
    // a pre-round-13 meta has no indexed_n: the table was never
    // appended to, so indexed == fitted
    val indexed =
      if (row.schema.fieldNames.contains("indexed_n"))
        row.getLong(row.fieldIndex("indexed_n"))
      else fitted
    // a pre-round-15 meta has no PQ shape columns: it was built under
    // the compiled-in gate geometry
    def intOr(name: String, dflt: Int): Int =
      if (row.schema.fieldNames.contains(name))
        row.getInt(row.fieldIndex(name))
      else dflt
    // a pre-round-16 meta has no metric column: cosine was the only
    // metric that existed then
    val metric =
      if (row.schema.fieldNames.contains("metric"))
        row.getString(row.fieldIndex("metric"))
      else "cosine"
    Meta(k, row.getInt(row.fieldIndex("geometry")),
      row.getInt(row.fieldIndex("dim")),
      intOr("pq_m", Ann.PqSubspaces), intOr("pq_k", Ann.PqCodebook),
      fitted, indexed, metric)
  }

  private def requireFresh(m: Meta, indexTable: String,
                           allowStale: Boolean): Unit =
    // sq8 quantizes per-vector — no corpus-level fit exists to drift
    if (m.kind != "sq8")
    require(allowStale ||
        m.indexedN.toDouble <= MaxDriftFactor * m.fittedN.toDouble,
      s"AnnIndex: '$indexTable' holds ${m.indexedN} vectors but its " +
        s"${m.kind} geometry was fitted for ${m.fittedN} " +
        f"(drift ${m.indexedN.toDouble / m.fittedN}%.2fx > " +
        f"$MaxDriftFactor%.1fx) — rebuild with AnnIndex.build" +
        s"${m.kind match {
          case "lsh" => "Lsh"; case "pq" => "Pq"
          case "ivfpq" => "IvfPq"; case _ => "Ivf"
        }} (or pass " +
        "allowStale = true to serve from the stale fit anyway)")
}
