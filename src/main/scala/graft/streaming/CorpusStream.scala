package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType,
  StringType, StructType}

import graft.catalog.TableCatalog
import graft.ops.Dedup
import graft.sim.MinHashLSH
import graft.text.{CorpusPipeline, TextHash}

/** Incremental (micro-batched) twin of the dp01 corpus pipeline — the
  * reference's own partition-at-a-time daily loop
  * (get_similarity.py:89-103) generalized to the LLM corpus stages:
  * every micro-batch is gated, deduped against everything already seen,
  * near-dup-clustered, sampled, and lands as one idempotent partition
  * (`TableCatalog.writePartition`), so replaying a failed batch
  * overwrites its own partition instead of duplicating it.
  *
  * Cross-batch state is one compact table of per-doc sketches —
  * (id, exact-dedup fingerprint, shingle hashes, MinHash signature),
  * one partition per batch. New docs are shingled/signed ONCE, on
  * arrival; later batches band their new signatures against the stored
  * ones (`MinHashLSH.bandFrame` over the state table is a cheap
  * projection), so per-batch work is O(new docs + band collisions),
  * never O(corpus). Raw text is not retained.
  *
  * Cross-batch semantics (the part a row-local twin can't fake):
  *  - exact dedup CONVERGES to dp01's global keep-smallest-id even on
  *    out-of-order feeds (rounds 11/12): a re-delivery whose stored
  *    twin has a SMALLER id is dropped at the fingerprint gate as
  *    before, but one with a smaller id than every stored twin
  *    injects a FORCED merge edge against each larger-id stored twin
  *    — the convergent-merge machinery below then elects it canonical
  *    and retracts the dethroned copy unconditionally (round 12: the
  *    edge is forced rather than routed through the LSH cascade,
  *    because fp hashes only a text prefix and a prefix-sharing
  *    divergent body would never verify at threshold). With ids
  *    ascending in arrival order (the reference's daily extracts) the
  *    gate drops every re-delivery and nothing changes;
  *  - near-dup clustering CONVERGES to the batch operator (round 10):
  *    a batch-internal component merges with every seen component any
  *    member verifies against (seen = every gated+exact-deduped doc,
  *    including cluster-dropped ones — a dropped doc still bridges
  *    later arrivals), via a contracted-graph CC over component
  *    LABELS; the merged component's canonical (minimum id) survives
  *    and every other member dies. When a later bridge dethrones an
  *    already-emitted canonical, that doc is RETRACTED — its output
  *    partition is rewritten without it — so the materialized output
  *    equals [[Dedup.clusterDedup]]'s at every batch boundary (the
  *    round-9 "late bridge" divergence, previously documented as
  *    inherent, is closed; labels only decrease, so retraction never
  *    needs a matching re-admission). The label state behind this is
  *    a third, update-style table bounded by the duplicated slice of
  *    the corpus — see [[lblTableOf]].
  */
object CorpusStream {

  /** Bucket count for the band state table's `pk` partition level:
    * `pk = xxhash64(band_key) mod StatePartitions`. Each batch collects
    * its own distinct pk values (a driver list bounded by this
    * constant) and reads ONLY the colliding `pk=` sub-directories of
    * the stored bands — the cross-batch candidate join prunes at the
    * storage layer instead of scanning the whole seen corpus's bands.
    * 64 keeps per-batch files coarse; a deployment with tiny frequent
    * batches would raise it for sharper pruning. */
  val StatePartitions = 64

  /** A batch's band rows are laid out as `pk=` sub-directories only
    * when there are enough of them that each pk file is substantial
    * (≥ ~1k rows per pk on average); smaller batches write ONE plain
    * file with pk as a data column. Without this, tiny frequent
    * batches explode into batches×64 near-empty files and the
    * per-batch LISTING cost grows faster than the scan the layout
    * saves (measured: the 40-small-batch ProbeStream run regressed
    * from flat to a +0.1 s/batch slope before the split was made
    * granularity-aware). Reads handle both layouts: pk-split batches
    * are pruned at the directory level, plain batches are read whole
    * (tiny by construction) and pruned by the pk column. */
  val PkSplitMinRows: Long = 1000L * StatePartitions

  /** Live (uncompacted) batch partitions that trigger a compaction pass
    * at the start of the next batch. Without compaction the state tables
    * accumulate one `batch_id=` directory per batch forever, and the
    * per-batch LISTING cost — the one term the pk layout doesn't bound —
    * grows linearly with stream age. With it, the directory count stays
    * under CompactEvery + 1 regardless of how long the stream runs. */
  val CompactEvery = 16

  private def pkCol: org.apache.spark.sql.Column =
    pmod(xxhash64(col("band_key")), lit(StatePartitions.toLong))

  /** Static DATA schemas of the pipeline's own state tables, supplied
    * to every pruned read so Spark skips the per-read footer-inference
    * job — on a minutes-cadence stream that job is a fixed per-batch
    * driver round-trip repeated for each of the fp/bands/emit/sketch
    * reads (16 of dp03's ~158 jobs before this). Plain-layout
    * partitions additionally store `pk` as a data column
    * ([[PkSplitMinRows]]); pk-split partitions carry it as a
    * directory, so the plain branches read [[withPk]] of these. A
    * declared column missing from a legacy file (e.g. `sb` on
    * pre-bottom-k sketches) reads as null and is healed downstream by
    * coalesce — same contract as schema evolution. */
  private[streaming] val FpDataSchema: StructType = new StructType()
    .add("id", LongType).add("fp", StringType)
  private[streaming] val EmitDataSchema: StructType = new StructType()
    .add("id", LongType).add("eb", StringType)
  private[streaming] val BandsDataSchema: StructType = new StructType()
    .add("id", LongType).add("n", IntegerType)
    .add("sig", ArrayType(LongType)).add("band_idx", IntegerType)
    .add("band_key", StringType)
  private[streaming] val SketchDataSchema: StructType = new StructType()
    .add("id", LongType).add("fp", StringType)
    .add("sh", ArrayType(LongType)).add("n", IntegerType)
    .add("sig", ArrayType(LongType)).add("sb", ArrayType(LongType))
  private[streaming] val LblSchema: StructType = new StructType()
    .add("id", LongType).add("lbl", LongType).add("b", LongType)
    .add("batch_id", StringType)
  private def withPk(s: StructType): StructType = s.add("pk", LongType)

  /** Label the jobs a block's actions spawn (guide §1.5): thread-local,
    * restored on exit, so concurrent lanes keep their own labels. Pure
    * observability — ProbeJobs/the UI attribute chain cost by phase. */
  private def jd[T](spark: org.apache.spark.sql.SparkSession,
                    label: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"CorpusStream: $label")
    try f finally sc.setJobDescription(prev)
  }

  private def bandsTableOf(stateTable: String): String =
    stateTable + "_bands"

  /** Component-label state (round-10): rows `(id, lbl, b)` mapping a
    * doc to its near-dup component's canonical id, written only for
    * members of multi-doc or merged components (singletons implicitly
    * label themselves — the table stays proportional to the DUPLICATED
    * slice of the corpus, not the corpus). Labels change when later
    * bridges merge components, so rows are UPDATES: `b` is the writing
    * batch and a read keeps each id's highest-`b` row. This is what
    * lets a merge find the true canonical of a touched seen doc (the
    * stored member's label, not the member itself) and retract a
    * dethroned canonical from the output. */
  private def lblTableOf(stateTable: String): String =
    stateTable + "_lbl"

  /** Emit-index state (round 11 — closes the last linear-in-corpus
    * per-batch term): one row `(id, eb)` per EMITTED doc, `eb` = the
    * output partition it landed in, written just before the output
    * partition itself. When a merge dethrones an already-emitted
    * canonical, the affected output partitions are found by a
    * pk-pruned semi-join against this index — metadata-scale (8+
    * bytes per emitted doc, and only the retracted ids' pk buckets
    * are read) — instead of semi-join-scanning the ENTIRE output
    * table, which at 100 TB is the corpus. Rows are partitioned by
    * writing batch with the band tables' granularity-aware pk layout
    * (`pk = xxhash64(id) mod StatePartitions`), so lookups prune at
    * the directory level and replay stays idempotent. `eb` rides as a
    * DATA column (redundant with the partition dir until compaction
    * folds many batches into one `c` partition). Rows for later-
    * retracted docs are left in place: a doc is never re-retracted
    * (labels only decrease, and a dethroned id never reappears as a
    * merge-graph node), so a stale row can at worst make a REPLAYED
    * retraction rewrite the same partitions again — idempotent.
    * Coverage is checked STRUCTURALLY (round 12): an output partition
    * is index-covered iff its emit partition exists or its key was
    * recorded in the `_covered_keys` marker when a compaction folded
    * it; anything else (a warehouse written by pre-index code) falls
    * back to the full output scan. */
  private def emitTableOf(stateTable: String): String =
    stateTable + "_emit"

  private val CoveredFromMarker = "_covered_from"
  private val CoveredKeysMarker = "_covered_keys"

  /** Range-set codec for the `_covered_keys` marker: batch ids whose
    * emit rows were folded into a compacted partition (the fold loses
    * the per-batch directories, so presence can no longer be checked
    * structurally). Contiguous ids — the normal stream — encode as one
    * `lo-hi` range, so the marker stays bytes-sized at any stream age.
    * Unparseable tokens (a torn marker write) decode to nothing: lost
    * coverage degrades to the safe full-scan fallback. */
  private[graft] def parseRanges(s: String): Seq[(Long, Long)] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).flatMap { tok =>
      tok.split("-", 2) match {
        case Array(a) =>
          scala.util.Try { val v = a.trim.toLong; (v, v) }.toOption
        case Array(a, b) =>
          scala.util.Try((a.trim.toLong, b.trim.toLong)).toOption
            .filter { case (lo, hi) => lo <= hi }
        case _ => None
      }
    }.toSeq.sortBy(_._1)

  private[graft] def encodeRanges(keys: Seq[(Long, Long)]): String = {
    val sorted = keys.sortBy(_._1)
    val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: rest, (a, b)) if a <= hi + 1 =>
        (lo, math.max(hi, b)) :: rest
      case (acc, r) => r :: acc
    }.reverse
    merged.map { case (lo, hi) =>
      if (lo == hi) lo.toString else s"$lo-$hi" }.mkString(",")
  }

  private def rangesContain(rs: Seq[(Long, Long)], v: Long): Boolean =
    rs.exists { case (lo, hi) => v >= lo && v <= hi }

  /** The `_covered_keys` marker's on-disk form: the range-set plus a
    * trailing `;` terminator. A torn write (the marker overwrite is
    * not atomic on every store) truncates to a strict PREFIX of the
    * intended bytes — and a prefix of a valid range-set can itself be
    * valid-but-wrong (`100-120` torn to `10` claims coverage for a key
    * that was never folded, and a wrongly-covered pre-index output
    * partition would let a retraction skip the fallback scan). The
    * terminator is the LAST byte, so no strict prefix carries it:
    * [[decodeCoveredKeys]] treats a terminator-less marker — torn, or
    * written by pre-round-13 code — as ABSENT, degrading to the safe
    * full-scan fallback (and, at the next fold, to re-recording the
    * still-listable keys). */
  private[graft] def encodeCoveredKeys(keys: Seq[(Long, Long)]): String =
    encodeRanges(keys) + ";"

  private[graft] def decodeCoveredKeys(s: String): Option[Seq[(Long, Long)]] = {
    val t = s.trim
    if (!t.endsWith(";")) None else Some(parseRanges(t.dropRight(1)))
  }

  private[graft] def emitPkCol(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(id), lit(StatePartitions.toLong))

  // ---- output-epoch roll (round 12) ----------------------------------
  //
  // The incremental output used to keep one `batch_id=` partition per
  // micro-batch FOREVER — at minutes cadence for years that is 10⁵–10⁶
  // directories under one table root on an object store, and the
  // per-batch existence/listing cost of the output table grows with
  // stream age. With `epochEvery > 0`, once the current output table
  // holds that many batch partitions, the NEXT batch writes to a fresh
  // epoch table `out__e1`, `out__e2`, … — per-table directory counts
  // stay bounded by the roll interval, and old epochs are never listed
  // again (retraction locates them through the emit index's eb keys).
  // Epoch discovery is STRUCTURAL (the highest existing epoch table),
  // so there is no marker to tear and a crashed roll replays to the
  // same decision; a replayed batch first looks for its own partition
  // in the current (and, at a boundary, the previous) epoch so it
  // rewrites in place instead of duplicating across the roll.
  // The emit index's `eb` column addresses the partition across
  // epochs: plain `<batch>` for the base table (bit-compatible with
  // pre-epoch warehouses), `e<k>:<batch>` for epoch k ≥ 1.

  private[graft] def epochTableName(outTable: String, k: Int): String =
    if (k == 0) outTable else s"${outTable}__e$k"

  private val EpochEb = "^e(\\d+):(.*)$".r

  private[graft] def encodeEb(epoch: Int, batchKey: String): String =
    if (epoch == 0) batchKey else s"e$epoch:$batchKey"

  /** (output table, partition key) addressed by an emit row's eb. */
  private[graft] def ebTarget(outTable: String,
                              eb: String): (String, String) = eb match {
    case EpochEb(k, key) => (epochTableName(outTable, k.toInt), key)
    case plain => (outTable, plain)
  }

  private def epochTablesOf(catalog: TableCatalog,
                            outTable: String): Seq[Int] = {
    val prefix = outTable + "__e"
    catalog.listTablesWithPrefix(prefix)
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toInt).toOption)
  }

  /** The epoch this batch's output partition belongs to. 0 when
    * rolling is off (`epochEvery <= 0` — the pre-epoch layout,
    * bit-identical). Replay binds to the epoch already holding the
    * batch's partition; otherwise a full current epoch rolls over. */
  private def resolveOutputEpoch(catalog: TableCatalog, outTable: String,
      batchKey: String, epochEvery: Int): Int = {
    if (epochEvery <= 0) return 0
    val cur = epochTablesOf(catalog, outTable).foldLeft(0)(math.max)
    val curKeys =
      catalog.listPartitions(epochTableName(outTable, cur), "batch_id")
    if (curKeys.contains(batchKey)) cur
    else if (cur > 0 &&
        catalog.listPartitions(epochTableName(outTable, cur - 1),
          "batch_id").contains(batchKey))
      cur - 1 // replay of the batch that crashed right after rolling
    else if (curKeys.count(_ != batchKey) >= epochEvery) cur + 1
    else cur
  }

  /** The full incremental output across every epoch table — what a
    * consumer reads where it previously read `outTable` directly. */
  def readOutput(catalog: TableCatalog, outTable: String): DataFrame = {
    val frames = (0 +: epochTablesOf(catalog, outTable)).distinct.sorted
      .map(k => epochTableName(outTable, k))
      .filter(catalog.tableExists)
      .map(catalog.read)
    // no epoch table exists yet (fresh warehouse, stream never ran):
    // defer to catalog.read's empty-table behavior (the `_schema`
    // anchor) instead of reduce-ing an empty sequence
    frames.reduceOption(_ unionByName _)
      .getOrElse(catalog.read(outTable))
  }

  /** Fingerprint-index state (round 12 — closes the per-batch linear
    * fp-column scan, the last stated O(state)-per-batch term): one row
    * `(id, fp)` per stored doc, bucketed by `pk = xxhash64(fp) mod
    * StatePartitions` with the band tables' granularity-aware layout.
    * The exact-dedup gate reads ONLY the buckets this batch's own
    * fingerprints hash into (fp equality implies pk equality, so the
    * pruning loses no twin) instead of scanning the whole sketch
    * table's fp column — on a 10¹⁰-doc state that scan was linear in
    * the corpus every batch, however small the batch. A state written
    * by pre-index code is backfilled once from the sketch table's own
    * fp column (see [[seenFpRows]]). */
  private def fpTableOf(stateTable: String): String =
    stateTable + "_fp"

  private def fpPkCol(f: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(f), lit(StatePartitions.toLong))

  /** Edge cap for the driver-side merge-graph fast path. 1M edges of
    * two longs is ~16 MB of driver memory — far past any real batch's
    * merge graph, whose nodes are component LABELS (touched
    * components, not docs). */
  val MergeGraphCap = 1 << 20

  /** Largest candidate-id set pushed into the sketch fetch's `id IN`
    * filter (parquet row-group pruning over the sorted-by-id pk
    * files); past it the literal list costs more to plan than it
    * prunes and the pk-directory pruning stands alone. */
  val IsinCap = 1 << 16

  /** When a batch's cross-batch candidate set is this small — the
    * common small-batch-on-big-state shape — the verify runs in the
    * DRIVER: the candidate docs' (sh, sb) arrays are collected (one
    * pruned read, bytes bounded by caps × corpus-gated doc size) and
    * each pair runs the SAME scalar kernels the distributed cascade
    * uses ([[graft.sim.SetVerify.sortedIntersect]] /
    * `bottomKInterTaken` — shared code, so the paths cannot drift).
    * This removes the distributed sample-prune + verify joins' worth
    * of per-batch jobs where the data is metadata-scale anyway. */
  val DriverVerifyIdCap = 64
  val DriverVerifyPairCap = 256

  /** Capped connected components over a pair frame — the per-batch
    * component machinery shared by the internal near-dup graph and
    * the contracted cross-batch merge graph. Up to [[MergeGraphCap]]
    * edges it resolves with ONE collect + driver union-find, and the
    * result is a LOCAL relation downstream joins broadcast — against
    * the iterative CC loop this removes ~6 rounds × several AQE stage
    * jobs per batch (measured at sf0.1, most of dp03's job count);
    * beyond the cap it falls back to the distributed pointer-jumping
    * operator (there `pairs` is evaluated a second time — the capped
    * probe already consumed it once — so callers fence the frame in
    * that branch when re-derivation is expensive). Output (node
    * `__node`, component minimum `__m`), identical on both paths;
    * None for an edgeless input — decided driver-side on the capped
    * path, so the common empty case costs no extra emptiness job. */
  private def cappedComponents(pairs: DataFrame, aCol: String,
                               bCol: String): Option[DataFrame] = {
    val spark = pairs.sparkSession
    val capped = pairs
      .select(col(aCol).cast("long"), col(bCol).cast("long"))
      .limit(MergeGraphCap + 1).collect()
    if (capped.length > MergeGraphCap)
      Some(Dedup.connectedComponents(pairs, aCol, bCol)
        .select(col("id").as("__node"), col("label").as("__m")))
    else {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      // union by value: the smaller root wins, so every component's
      // root IS its minimum label — the same fixpoint the distributed
      // loop reaches
      val clean = capped.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      clean.foreach { r =>
        val ra = find(r.getLong(0)); val rb = find(r.getLong(1))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val nodes = clean.iterator.flatMap(r =>
          Iterator(r.getLong(0), r.getLong(1)))
        .toArray.distinct
      if (nodes.isEmpty) None
      else {
        import spark.implicits._
        Some(nodes.map(n => (n, find(n))).toSeq.toDF("__node", "__m"))
      }
    }
  }

  /** Current (latest-wins) label per stored doc, or null when no label
    * state exists yet. */
  private def currentLabels(catalog: TableCatalog, stateTable: String,
                            batchKey: String): DataFrame = {
    val lblTable = lblTableOf(stateTable)
    if (!catalog.tableExists(lblTable)) null
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("b").desc)
      catalog.read(lblTable, LblSchema)
        .filter(col("batch_id").cast("string") =!= batchKey)
        .select(col("id"), col("lbl"), col("b"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("id"), col("lbl"))
    }
  }

  /** Signature width of a stored state table: the parquet-persisted
    * [[MinHashLSH.NumPermMetaKey]] field metadata when present (states
    * written from round 8 on), else one bounded head-row probe (legacy
    * states). None for an empty state. */
  private[streaming] def storedSigWidth(state: DataFrame): Option[Int] =
    MinHashLSH.sigWidthOf(state).orElse(
      state.select(size(col("sig")).as("__w"))
        .filter(col("__w").isNotNull && col("__w") >= 0)
        .limit(1).collect().headOption.map(_.getInt(0)))

  /** The ADVICE-r7 guard: a state table written at another threshold's
    * geometry would zip_with-null-pad against this batch's signatures,
    * cap agreement below the floor, and silently drop every cross-batch
    * candidate — dedup against the seen corpus would return nothing.
    * Fail loudly at batch start instead. */
  private def requireCompatibleState(state: DataFrame,
      geom: graft.sim.LshGeometry, stateTable: String,
      threshold: Double): Unit =
    storedSigWidth(state).foreach { w =>
      require(w == geom.numPerm,
        s"CorpusStream: state table '$stateTable' stores $w-perm MinHash " +
          s"signatures but threshold=$threshold derives a " +
          s"${geom.numPerm}-perm geometry (${geom.bands}x${geom.rows}) — " +
          "cross-batch near-dup detection would silently drop every " +
          "candidate. A threshold/geometry change requires a NEW state " +
          "table: stored sketches cannot be re-signed without the raw " +
          "text, which the state deliberately does not retain.")
    }

  // gate / fingerprint / sample definitions come from the shared
  // graft.text.CorpusPipeline object — the same one LlmQueries.dp01
  // reads — so the batch/streaming equality StreamingSpec asserts
  // cannot silently break by editing one side's constants
  private def gate(docs: DataFrame): DataFrame =
    CorpusPipeline.gate(docs)

  private def samplePredicate =
    CorpusPipeline.samplePredicate

  private def fp = md5(CorpusPipeline.fingerprintPrefix)

  /** Merge every committed batch partition of the sketch + bands state
    * tables into ONE compacted partition each (`batch_id=c<maxBatch>`),
    * deleting the sources — the periodic pass that keeps the state
    * tables' directory count (and so the per-batch listing cost) flat in
    * stream age. Row-content-neutral by construction: the target is the
    * exact union of the sources, and every consumer (the `fp` anti-join,
    * `seenBandFrame`, `storedSigWidth`) reads the state by COLUMNS, not
    * by which partition a row lives in. `excludeBatchKey` (the in-flight
    * batch) is never touched, so replay idempotence is preserved: a
    * compacted partition only ever contains batches committed before the
    * current one started.
    *
    * Idempotent and crash-safe: the target key is a pure function of the
    * source keys (`c` + max numeric key — never equal to a real numeric
    * batch id), the target is written before any source is deleted, and
    * a re-run skips the rewrite ONLY when the target both exists and is
    * COMMITTED (`TableCatalog.partitionCommitted`: `_SUCCESS` present,
    * no `_temporary` staging) — a JVM death mid-write leaves a target
    * directory that exists but fails the probe, so the re-run rewrites
    * it from the still-present sources instead of trusting a half-write
    * and deleting the only complete copies. Each table compacts
    * independently with the same rule, so a crash between the two
    * tables' passes heals on the next trigger. Legacy sketch rows
    * without the persisted bottom-k column are normalized during the
    * rewrite. Returns true when anything moved.
    *
    * Concurrent writers (round 11): the whole pass runs under the
    * state table's lease lock ([[TableCatalog.tryAcquireTableLock]] —
    * one lock covers the sibling `_bands`/`_lbl`/`_emit` tables, which
    * are only ever mutated through this state table's pipeline). A
    * second pipeline compacting the same state concurrently — the
    * interleaving that could delete a source the other pass still
    * reads — is SKIPPED safely (returns false): compaction is
    * periodic, so deferring to the lock holder loses nothing, and a
    * crashed holder's lock ages out after the lease.
    *
    * `failpoint` is a test-only hook, invoked with a stage label after
    * each target write commits and before its sources are deleted;
    * StreamingSpec throws from it to simulate the crash windows. */
  def compactState(catalog: TableCatalog, stateTable: String,
                   excludeBatchKey: String,
                   failpoint: String => Unit = _ => ()): Boolean =
    // heartbeated hold (round 13): a compaction over a huge state can
    // outlive the 15-min lease; the bare acquire would let a waiter
    // break the lock mid-rewrite
    catalog.withTableLockIfFree(stateTable) {
      compactStateLocked(catalog, stateTable, excludeBatchKey, failpoint)
    }.getOrElse(false)

  private def compactStateLocked(catalog: TableCatalog, stateTable: String,
                                 excludeBatchKey: String,
                                 failpoint: String => Unit): Boolean = {
    def numOf(key: String): Option[Long] =
      scala.util.Try(key.stripPrefix("c").toLong).toOption
    def sourcesOf(table: String): Seq[String] =
      if (!catalog.tableExists(table)) Seq.empty
      else catalog.listPartitions(table, "batch_id")
        .filter(k => k != excludeBatchKey && numOf(k).isDefined)
    // The five folds below touch DISJOINT tables (sketch / bands / lbl
    // / emit / fp — all mutated only under this state table's lock, so
    // the outer lock covers them all) and each is a self-contained
    // write-target-then-delete-sources unit whose crash recovery never
    // consults a sibling table. Run them as concurrent lanes
    // (guide §2.6): the chain gates' compaction pass is many small
    // serial jobs whose driver latency the lanes overlap — identical
    // final state in any interleaving. Each lane returns whether it
    // moved anything.
    val foldSketch: () => Boolean = () => {
    var moved = false
    // sketch table: mixed layout like the bands (plain small batches vs
    // pk-split large ones — round 12), read shape-aware; the compacted
    // partition is large by construction so it always takes the
    // pk-split layout, which is also what heals a legacy all-plain
    // state into the pruned-fetch fast path
    val sk = sourcesOf(stateTable)
    if (sk.size >= 2) {
      val key = "c" + sk.flatMap(numOf).max
      val srcs = sk.filter(_ != key)
      if (!sk.contains(key) ||
          !catalog.partitionCommitted(stateTable, "batch_id", key)) {
        // rewrite from the sources only: a crashed half-written target
        // is replaced wholesale by the overwrite (its intended content
        // was exactly this union — sources are deleted strictly after
        // the target commits, so they are all still present here).
        // [[readSketchBatches]] normalizes the legacy optional sb.
        val merged = readSketchBatches(catalog, stateTable, srcs, None)
        // dropDuplicates: a crash that stranded an OLDER compacted
        // partition beside its undeleted sources makes the union carry
        // identical rows twice; by-id dedup restores the one-row-per-doc
        // invariant (a no-op shuffle on the clean path)
        merged.foreach(m =>
          catalog.writeSubPartitioned(
            m.dropDuplicates("id")
              .withColumn("pk", emitPkCol(col("id")))
              .withColumn("batch_id", lit(key))
              .repartition(col("pk"))
              .sortWithinPartitions(col("id")),
            stateTable, "batch_id", key, "pk"))
      }
      failpoint("sketch-target-written")
      srcs.foreach(catalog.deletePartition(stateTable, "batch_id", _))
      moved = true
    }
    moved
    }
    val foldBands: () => Boolean = () => {
    var moved = false
    // bands table: mixed layout (pk= sub-dirs vs plain files with a pk
    // data column — see PkSplitMinRows) read per shape, pk recomputed
    // uniformly (a pure function of band_key); the compacted partition
    // is large by construction so it always takes the pk-split layout
    val bandsTable = bandsTableOf(stateTable)
    val bd = sourcesOf(bandsTable)
    if (bd.size >= 2) {
      val key = "c" + bd.flatMap(numOf).max
      val srcs = bd.filter(_ != key)
      if (!bd.contains(key) ||
          !catalog.partitionCommitted(bandsTable, "batch_id", key)) {
        val cols = Seq(col("id"), col("n"), col("sig"), col("band_idx"),
          col("band_key"))
        val (split, plain) = srcs.partition(b =>
          catalog.listSubPartitions(bandsTable, "batch_id", b, "pk")
            .nonEmpty)
        val parts = Seq(
          if (split.nonEmpty)
            Some(catalog.readPaths(bandsTable,
                split.map(catalog.partitionPath(bandsTable, "batch_id", _)),
                BandsDataSchema)
              .select(cols: _*))
          else None,
          if (plain.nonEmpty)
            Some(catalog.readPaths(bandsTable,
                plain.map(catalog.partitionPath(bandsTable, "batch_id", _)),
                withPk(BandsDataSchema))
              .select(cols: _*))
          else None).flatten
        if (parts.nonEmpty)
          catalog.writeSubPartitioned(
            parts.reduce(_ unionByName _)
              .dropDuplicates("id", "band_idx") // see sketch-side comment
              .withColumn("pk", pkCol)
              .withColumn("batch_id", lit(key))
              .repartition(col("pk")),
            bandsTable, "batch_id", key, "pk")
      }
      failpoint("bands-target-written")
      srcs.foreach(catalog.deletePartition(bandsTable, "batch_id", _))
      moved = true
    }
    moved
    }
    val foldLbl: () => Boolean = () => {
    var moved = false
    // label table: rows are UPDATES (latest `b` wins per id), so the
    // compacted partition keeps exactly each id's highest-b row — the
    // union-then-latest a reader would compute anyway, materialized
    val lblTable = lblTableOf(stateTable)
    val lb = sourcesOf(lblTable)
    if (lb.size >= 2) {
      val key = "c" + lb.flatMap(numOf).max
      val srcs = lb.filter(_ != key)
      if (!lb.contains(key) ||
          !catalog.partitionCommitted(lblTable, "batch_id", key)) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("b").desc)
        catalog.writePartition(
          catalog.read(lblTable, LblSchema)
            .filter(col("batch_id").isin(srcs: _*))
            .select(col("id"), col("lbl"), col("b"))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
            .withColumn("batch_id", lit(key))
            .coalesce(1),
          lblTable, "batch_id", key)
      }
      failpoint("lbl-target-written")
      srcs.foreach(catalog.deletePartition(lblTable, "batch_id", _))
      moved = true
    }
    moved
    }
    val foldEmit: () => Boolean = () => {
    var moved = false
    // emit-index table: same mixed layout as the bands table (pk-split
    // vs plain — see PkSplitMinRows), `eb` is a data column so folding
    // many batch partitions into one `c` partition loses no mapping;
    // the compacted partition is large by construction so it always
    // takes the pk-split layout
    val emitTable = emitTableOf(stateTable)
    val em = sourcesOf(emitTable)
    if (em.size >= 2) {
      val key = "c" + em.flatMap(numOf).max
      val srcs = em.filter(_ != key)
      if (!em.contains(key) ||
          !catalog.partitionCommitted(emitTable, "batch_id", key)) {
        val cols = Seq(col("id"), col("eb"))
        val (split, plain) = srcs.partition(b =>
          catalog.listSubPartitions(emitTable, "batch_id", b, "pk")
            .nonEmpty)
        val parts = Seq(
          if (split.nonEmpty)
            Some(catalog.readPaths(emitTable,
                split.map(catalog.partitionPath(emitTable, "batch_id", _)),
                EmitDataSchema)
              .select(cols: _*))
          else None,
          if (plain.nonEmpty) {
            val withData = plain.filter(
              catalog.partitionHasDataFiles(emitTable, "batch_id", _))
            if (withData.isEmpty) None
            else Some(catalog.readPaths(emitTable,
                withData.map(catalog.partitionPath(emitTable, "batch_id", _)),
                withPk(EmitDataSchema))
              .select(cols: _*))
          } else None).flatten
        if (parts.nonEmpty)
          catalog.writeSubPartitioned(
            parts.reduce(_ unionByName _)
              .dropDuplicates("id") // see sketch-side comment
              .withColumn("pk", emitPkCol(col("id")))
              .withColumn("batch_id", lit(key))
              .repartition(col("pk")),
            emitTable, "batch_id", key, "pk")
      }
      failpoint("emit-target-written")
      // record the folded PLAIN-numeric batch keys in the covered-keys
      // marker BEFORE deleting their directories (re-folded `c` keys
      // were recorded at their own fold): coverage stays structurally
      // checkable after the fold. Crash windows are safe in both
      // orders — keys both in the marker and still present just count
      // twice in a union, and a crash before the append leaves the
      // sources present (covered via the live listing) for the re-run
      // to append again.
      val folded = srcs.filter(k =>
        scala.util.Try(k.toLong).isSuccess).map(_.toLong)
      if (folded.nonEmpty) {
        // a torn/legacy prior marker decodes to absent: its keys are
        // re-recorded here only if their directories still exist (they
        // do — this fold is what deletes them); already-deleted ones
        // stay safely uncovered until the fallback scan ages them out
        val prior = catalog.readMarker(emitTable, CoveredKeysMarker)
          .flatMap(decodeCoveredKeys).getOrElse(Seq.empty)
        catalog.writeMarker(emitTable, CoveredKeysMarker,
          encodeCoveredKeys(prior ++ folded.map(k => (k, k))))
      }
      srcs.foreach(catalog.deletePartition(emitTable, "batch_id", _))
      moved = true
    }
    moved
    }
    val foldFp: () => Boolean = () => {
    var moved = false
    // fingerprint-index table: same mixed layout and rules as the emit
    // table; pk is a pure function of fp, recomputed uniformly
    val fpTable = fpTableOf(stateTable)
    val fpb = sourcesOf(fpTable)
    if (fpb.size >= 2) {
      val key = "c" + fpb.flatMap(numOf).max
      val srcs = fpb.filter(_ != key)
      if (!fpb.contains(key) ||
          !catalog.partitionCommitted(fpTable, "batch_id", key)) {
        val cols = Seq(col("id"), col("fp"))
        val (split, plain) = srcs.partition(b =>
          catalog.listSubPartitions(fpTable, "batch_id", b, "pk")
            .nonEmpty)
        val parts = Seq(
          if (split.nonEmpty)
            Some(catalog.readPaths(fpTable,
                split.map(catalog.partitionPath(fpTable, "batch_id", _)),
                FpDataSchema)
              .select(cols: _*))
          else None,
          if (plain.nonEmpty) {
            val withData = plain.filter(
              catalog.partitionHasDataFiles(fpTable, "batch_id", _))
            if (withData.isEmpty) None
            else Some(catalog.readPaths(fpTable,
                withData.map(catalog.partitionPath(fpTable, "batch_id", _)),
                withPk(FpDataSchema))
              .select(cols: _*))
          } else None).flatten
        if (parts.nonEmpty)
          catalog.writeSubPartitioned(
            parts.reduce(_ unionByName _)
              .dropDuplicates("id") // see sketch-side comment
              .withColumn("pk", fpPkCol(col("fp")))
              .withColumn("batch_id", lit(key))
              .repartition(col("pk")),
            fpTable, "batch_id", key, "pk")
      }
      failpoint("fp-target-written")
      srcs.foreach(catalog.deletePartition(fpTable, "batch_id", _))
      moved = true
    }
    moved
    }
    graft.core.Par.concurrently(
      Seq(foldSketch, foldBands, foldLbl, foldEmit, foldFp))
      .exists(identity)
  }

  /** One micro-batch through the full chain. Exposed (not inlined in
    * the foreachBatch closure) so the spec can drive batches directly
    * and assert intermediate semantics. `admit` is the row-local
    * admission policy, defaulting to dp01's language/quality gate —
    * pluggable so corpora with their own admission rules (or
    * pre-gated feeds, or scale probes whose perturbation defeats
    * langId) run the identical dedup/cluster/sample chain. */
  def processBatch(batch: DataFrame, catalog: TableCatalog,
                   stateTable: String, outTable: String, batchId: Long,
                   threshold: Double = CorpusPipeline.NearDupThreshold,
                   benchmark: Option[DataFrame] = None,
                   admit: DataFrame => DataFrame = gate,
                   pkSplitMinRows: Long = PkSplitMinRows,
                   compactEvery: Int = CompactEvery,
                   epochEvery: Int = 0): Unit =
    // outer label: AQE materializes exchanges as driver-side jobs at
    // plan-construction time (outside any single action) — the batch-
    // wide label catches those too; inner labels override per phase
    jd(batch.sparkSession, s"b$batchId chain") {
    processBatchInner(batch, catalog, stateTable, outTable, batchId,
      threshold, benchmark, admit, pkSplitMinRows, compactEvery,
      epochEvery)
    }

  private def processBatchInner(batch: DataFrame, catalog: TableCatalog,
                   stateTable: String, outTable: String, batchId: Long,
                   threshold: Double,
                   benchmark: Option[DataFrame],
                   admit: DataFrame => DataFrame,
                   pkSplitMinRows: Long,
                   compactEvery: Int,
                   epochEvery: Int): Unit = {
    // the threshold-fitted band geometry (MinHashLSH.geometryFor) fixes
    // the stored signature width; requireCompatibleState (below, once
    // the state is opened) ENFORCES that this batch's derived width
    // matches what the table stores — a threshold/geometry change over
    // an existing state fails loudly instead of silently dropping every
    // cross-batch candidate
    val geom = MinHashLSH.geometryFor(threshold)
    val batchKey = batchId.toString
    // periodic state compaction BEFORE the state is opened: runs only on
    // committed earlier batches (the in-flight key is excluded), so a
    // replay of this batch sees the identical seen-corpus either way
    if (compactEvery > 0 && catalog.tableExists(stateTable) &&
        catalog.listPartitions(stateTable, "batch_id")
          .count(_ != batchKey) >= compactEvery)
      jd(batch.sparkSession, s"b$batchKey compactState") {
        compactState(catalog, stateTable, batchKey)
      }
    // 1. row-local gate + batch-local exact dedup (keep smallest id —
    //    the same rule dp01 applies globally); when a benchmark set is
    //    configured, decontaminate each batch against it before any
    //    state is written (eval-set leaks must never enter the corpus)
    val gated = benchmark match {
      case Some(b) => graft.text.Decontaminate
        .decontaminate(admit(batch), "doc_id", "text", b, "text")
      case None => admit(batch)
    }
    val localDeduped0 = Dedup.exactDedup(gated,
      CorpusPipeline.fingerprintPrefix, col("doc_id"))
      .select(col("doc_id"), col("text"), col("lang"))
    // every frame persisted below is released in the finally — a
    // long-lived stream must not accumulate cached blocks batch over
    // batch
    val release = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
    // 2. sketch state from EARLIER batches (a replay of this batch
    //    excludes its own half-written partition, so reprocessing is
    //    idempotent end-to-end). Shape-aware lazy union (round 12 —
    //    batch partitions may be pk-split); only the LEGACY fallbacks
    //    below ever evaluate it fully, the hot paths read pruned.
    //    A table whose only partition is this batch's own reads as
    //    null — the fresh-state path, which a batch-0 replay re-takes.
    val state =
      if (!catalog.tableExists(stateTable)) null
      else readSketchBatches(catalog, stateTable,
          catalog.listPartitions(stateTable, "batch_id")
            .filter(_ != batchKey),
          None).orNull
    if (state != null)
      requireCompatibleState(state, geom, stateTable, threshold)
    // persist the local batch once it has several consumers: the fp-pk
    // collect, the anti-join cascade and the forced-pair join below
    // all read it (state == null leaves the single-consumer lazy form)
    val localDeduped =
      if (state == null) localDeduped0
      else { val f = graft.core.Fence.soft(localDeduped0)
             release += f; f }
    // 3. exact re-arrivals by stored fingerprint, read from the
    //    pk-bucketed `_fp` index pruned to THIS batch's fp buckets
    //    (round 12 — [[seenFpRows]]; legacy states backfill or fall
    //    back to the full fp-column scan). Two consumers, one read:
    //      - a twin whose stored id is <= the arrival's drops at the
    //        anti-join (ascending feeds: every re-delivery, as always);
    //      - a twin whose stored id is LARGER becomes a FORCED merge
    //        pair injected into the cross-pair graph below (round 12,
    //        replacing round 11's route through the LSH cascade: fp
    //        hashes only a text PREFIX, so fp-equality does not
    //        guarantee a verifiable J >= t pair — a prefix-sharing
    //        divergent body, or a sub-shingle-length doc, would never
    //        verify and the dethroned stored copy would survive as a
    //        duplicate. The forced edge makes the dethronement
    //        unconditional — exactly dp01's keep-smallest-id-per-fp
    //        rule.)
    //    seenFp == null means no stored bucket collides — the common
    //    batch skips the anti-join shuffle entirely, driver-decided.
    val seenFp =
      if (state == null) null
      else jd(batch.sparkSession, s"b$batchKey seen fp") {
        seenFpRows(catalog, stateTable, batchKey, state,
          localDeduped, pkSplitMinRows) }
    val newDocs = graft.core.Fence(
      if (seenFp == null) localDeduped
      else localDeduped.join(seenFp,
        fp === col("__seen_fp") && col("__seen_id") <= col("doc_id"),
        "left_anti"))
    val fpForced =
      if (seenFp == null) null
      else newDocs.join(seenFp,
          fp === col("__seen_fp") && col("__seen_id") > col("doc_id"))
        .select(col("doc_id").cast("long").as("doc_a"),
                col("__seen_id").cast("long").as("doc_b"))
    // 4. shingle + sign the NEW docs once; band them against their own
    //    bands (internal pairs) and the STORED bands (cross pairs) —
    //    seen docs are never re-shingled
    val newSigs = graft.core.Fence(
      MinHashLSH.signatureFrame(newDocs, "doc_id", "text", 3, geom)
        .withColumn("sb", MinHashLSH.bottomKCol(col("sh"))))
    // sig-carrying band frames + the fused floor (collidedSurvivors):
    // the size prune + agreement floor filter inside the band join's
    // own stage, so the per-batch shuffle is linear in band rows —
    // at scale the stored corpus's band side is the big one, and this
    // is exactly the shape that keeps it from re-joining per candidate
    val newBands = MinHashLSH.bandFrameWithSig(newSigs, geom)
    val newSk = newSigs.select(col("id"), col("sh"), col("n"),
      col("sig"), col("sb"))
    // internal pairs are new×new: their sample/verify fetches touch
    // only this batch's sketches, never the state
    val internal = MinHashLSH.verifySurvivors(
        MinHashLSH.collidedSurvivors(newBands, newBands, threshold,
          geom, selfJoin = true),
        newSk, threshold, sb = Some(newSk.select(col("id"), col("sb"))))
      .select(col("doc_a"), col("doc_b"))
    // cross PAIRS (new doc, seen doc), not just touched flags: merging
    // needs to know WHICH seen components this batch connects. The
    // forced fp-duplicate pairs union in here — same capped collect,
    // same merge machinery, unconditional dethronement.
    // Evaluated as a LANE concurrent with the internal-components
    // collect below (guide §2.6): the two cascades are independent
    // until the merge step consumes both (internal×internal vs
    // new×seen), and each is several serial driver-latency-bound
    // jobs over the same fenced signature frame.
    val crossPairsThunk: () => DataFrame = () =>
      if (state == null) null
      else {
        val covered = bandsCovered(catalog, stateTable, batchKey)
        val seenBands = seenBandFrame(catalog, stateTable, batchKey,
          state, newBands, geom, covered)
        def fullStateVerify(survivors: DataFrame): DataFrame = {
          val sigs = newSk.unionByName(state.select(col("id"),
            col("sh"), col("n"), col("sig"), col("sb")))
          MinHashLSH.verifySurvivors(survivors, sigs, threshold,
              sb = Some(sigs.select(col("id"), col("sb"))))
            .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        }
        val verified =
          if (!covered)
            // legacy not-covered path (pre-round-8 state, no bands
            // table): the full-state fetch — it re-bands the full
            // state anyway, and the one pair collect below evaluates
            // the fused cascade exactly once
            fullStateVerify(MinHashLSH.collidedSurvivors(newBands,
              seenBands, threshold, geom, selfJoin = false))
          else {
            // the verify stage fetches `sh` arrays for the SEEN side
            // of every candidate pair. Collect the candidates (band
            // join + agreement floor — the cheap prefix of the
            // cascade, NOT the array verify) up to the merge cap,
            // with each seen id's sketch pk riding along in the same
            // job; the fetch then reads only the colliding pk
            // DIRECTORIES of the pk-split sketch partitions, and
            // inside them only the row groups the (sorted-by-id)
            // candidate id IN-filter survives — metadata-scale, where
            // the round-12 first cut (pk set of every id in colliding
            // band BUCKETS) saturated all 64 buckets on any batch
            // with a few hundred collisions and pruned nothing
            // (ProbeSketch measured split slower than plain). The
            // verify re-joins the collected pairs as a broadcast
            // LOCAL relation, so the cascade prefix still runs once.
            // Over the cap — a pathological mass-collision batch —
            // the cascade re-derives distributed against the full
            // state, the same fallback shape as [[cappedComponents]].
            val cand = MinHashLSH.collidedSurvivors(newBands, seenBands,
              threshold, geom, selfJoin = false)
            val candRows = jd(batch.sparkSession,
                s"b$batchKey cross candidates") { cand
              .select(col("doc_a").cast("long"),
                col("doc_b").cast("long"),
                emitPkCol(col("doc_b")).as("__pk"))
              .limit(MergeGraphCap + 1).collect() }
            if (candRows.length > MergeGraphCap)
              fullStateVerify(cand)
            else if (candRows.isEmpty)
              // nothing survived the floor: no cross verify at all
              null
            else {
              val ids = candRows.map(_.getLong(1)).distinct
              val aIds = candRows.map(_.getLong(0)).distinct
              val ipks = candRows.map(_.getLong(2)).toSet
              val fetched = readSketchBatches(catalog, stateTable,
                  catalog.listPartitions(stateTable, "batch_id")
                    .filter(_ != batchKey),
                  Some(ipks))
                .map { f =>
                  // the IN pushdown prunes row groups; past the cap
                  // the literal list costs more than it prunes and
                  // the directory pruning stands alone
                  if (ids.length <= IsinCap)
                    f.filter(col("id").isin(ids.toIndexedSeq: _*))
                  else f
                }
                .getOrElse(state)
              val spark = batch.sparkSession
              import spark.implicits._
              if (candRows.length <= DriverVerifyPairCap &&
                  ids.length <= DriverVerifyIdCap &&
                  aIds.length <= DriverVerifyIdCap) {
                // driver fast path (see [[DriverVerifyIdCap]]): two
                // bounded array collects, then the shared scalar
                // kernels decide each pair — no distributed
                // prune/verify joins for a metadata-scale candidate
                // set
                def arrMap(df: DataFrame, sel: Seq[Long])
                    : Map[Long, (Array[Long], Array[Long])] =
                  jd(batch.sparkSession, s"b$batchKey verify fetch") {
                  df.filter(col("id").isin(sel.toIndexedSeq: _*))
                    .select(col("id"), col("sh"), col("sb"))
                    .collect() }
                    .flatMap { r =>
                      if (r.isNullAt(1) || r.isNullAt(2)) None
                      else Some(r.getLong(0) ->
                        (r.getSeq[Long](1).toArray,
                         r.getSeq[Long](2).toArray))
                    }.toMap
                val bArr = arrMap(fetched, ids.toSeq)
                val aArr = arrMap(newSk, aIds.toSeq)
                val floor = threshold - 0.05
                val usePrune = threshold < MinHashLSH.SampleCutoff
                val kept = candRows.iterator.flatMap { r =>
                  val a = r.getLong(0); val b = r.getLong(1)
                  (aArr.get(a), bArr.get(b)) match {
                    case (Some((sha, sba)), Some((shb, sbb))) =>
                      val pass = !usePrune || {
                        val (inter, taken) = graft.sim.SetVerify
                          .bottomKInterTaken(sba, sbb,
                            MinHashLSH.BottomK)
                        taken > 0 && inter.toDouble / taken >= floor
                      }
                      if (!pass) None
                      else {
                        val xs = sha.clone; java.util.Arrays.sort(xs)
                        val ys = shb.clone; java.util.Arrays.sort(ys)
                        val inter =
                          graft.sim.SetVerify.sortedIntersect(xs, ys)
                        val union = xs.length + ys.length - inter
                        if (inter.toDouble / union >= threshold)
                          Some((a, b))
                        else None
                      }
                    case _ => None // an absent/null array never joins
                  }
                }.toSeq
                if (kept.isEmpty) null
                else kept.toDF("doc_a", "doc_b")
              } else {
                val sigs = newSk.unionByName(fetched.select(col("id"),
                  col("sh"), col("n"), col("sig"), col("sb")))
                val pairsLocal = candRows
                  .map(r => (r.getLong(0), r.getLong(1))).toSeq
                  .toDF("doc_a", "doc_b")
                MinHashLSH.verifySurvivors(pairsLocal, sigs, threshold,
                    sb = Some(sigs.select(col("id"), col("sb"))))
                  .select(col("doc_a").cast("long"),
                    col("doc_b").cast("long"))
              }
            }
          }
        (verified, fpForced) match {
          case (null, null) => null
          case (null, f) => f.distinct()
          case (v, null) => v.distinct()
          case (v, f) => v.unionByName(f).distinct()
        }
      }
    // 5. component resolution within the batch — the capped driver
    //    union-find ([[cappedComponents]]): a batch's internal
    //    near-dup graph is metadata-scale in the common case, and the
    //    iterative CC loop's per-round jobs were most of the chain's
    //    job count; a pathological mass-dup batch falls back to the
    //    distributed operator. Runs as a lane concurrent with the
    //    cross-pair cascade (see crossPairsThunk) — independent
    //    cascades over the shared fenced signatures, joined here.
    val lanes = graft.core.Par.concurrently(Seq[() => Any](
      crossPairsThunk,
      () => jd(batch.sparkSession,
        s"b$batchKey internal pairs + components") {
        cappedComponents(internal, "doc_a", "doc_b") }))
    val crossPairs = lanes(0).asInstanceOf[DataFrame]
    val labelsOpt = lanes(1).asInstanceOf[Option[DataFrame]]
    val labeled = labelsOpt match {
      case None => newDocs.withColumn("label", col("doc_id"))
      case Some(l) => newDocs.join(
          l.select(col("__node").as("doc_id"), col("__m").as("label")),
          Seq("doc_id"), "left")
        .withColumn("label", coalesce(col("label"), col("doc_id")))
    }
    // 5b. ...then CONVERGENT MERGING across batches (round 10 — closes
    //     the late-bridge divergence from batch clusterDedup): each
    //     cross pair is an edge between this batch's component LABEL
    //     and the seen doc's current component label (member docs
    //     resolve through the label state), a contracted-graph CC over
    //     those few labels finds each merged component's true canonical
    //     (the minimum of the involved canonical ids), and
    //       - a new doc survives iff it IS its merged canonical (under
    //         the ascending-id ingestion contract the canonical of a
    //         merged component is always an earlier doc, so this
    //         reduces to the old "touching seen means death" rule —
    //         but an out-of-order feed now elects the new doc when its
    //         id is smallest);
    //       - a previously EMITTED canonical that loses its crown is
    //         RETRACTED: its output partition is rewritten without it
    //         (idempotent — replaying the batch re-derives the same
    //         retraction set and the anti-join is a no-op the second
    //         time). Labels only ever decrease, so a once-dropped doc
    //         can never need re-admission.
    // the capped PAIR collect is the one action on the cross cascade
    // (round 11): an empty result — the common batch, where band
    // collisions exist but nothing verifies — short-circuits ALL merge
    // bookkeeping including the label-state read and its window (the
    // unconditional-convergence overhead ADVICE r10 measured at ~14%
    // per merge-free batch). A merge-bearing batch re-joins the
    // collected pairs as a broadcast-sized LOCAL relation, so the
    // cascade still evaluates exactly once and the label joins run
    // against a tiny build side. Over [[MergeGraphCap]] pairs (a
    // pathological mass-merge batch) the cascade is re-derived
    // distributed — fenced, so the CC fallback consumes it once.
    val pairRows: Array[(Long, Long)] =
      if (crossPairs == null) Array.empty
      else jd(batch.sparkSession, s"b$batchKey cross verify") {
        crossPairs.limit(MergeGraphCap + 1).collect()
          .map(r => (r.getLong(0), r.getLong(1))) }
    val overCap = pairRows.length > MergeGraphCap
    val curLbls =
      if (pairRows.isEmpty) null
      else currentLabels(catalog, stateTable, batchKey)
    val mr: DataFrame = if (pairRows.isEmpty) null else {
      val spark = batch.sparkSession
      import spark.implicits._
      val pairsSrc =
        if (!overCap) pairRows.toSeq.toDF("doc_a", "doc_b")
        else { val f = graft.core.Fence.soft(crossPairs)
               release += f; f }
      val la = pairsSrc
        .join(labeled.select(col("doc_id").as("__na"), col("label")),
          col("doc_a") === col("__na"))
        .select(col("label").as("la"), col("doc_b"))
      val edges =
        if (curLbls == null) la.select(col("la"), col("doc_b").as("lb"))
        else la.join(curLbls.withColumnRenamed("id", "__sb"),
            col("doc_b") === col("__sb"), "left")
          .select(col("la"), coalesce(col("lbl"), col("doc_b")).as("lb"))
      cappedComponents(edges, "la", "lb") match {
        case None => null
        case Some(m) =>
          val f = graft.core.Fence.soft(m); release += f; f
      }
    }
    val labeled2 =
      if (mr == null) labeled.withColumn("__fl", col("label"))
      else labeled.join(mr, col("label") === col("__node"), "left")
        .withColumn("__fl", coalesce(col("__m"), col("label")))
        .drop("__node", "__m")
    val kept = labeled2.filter(col("doc_id") === col("__fl"))
      .drop("label", "__fl")
    // dethroned canonicals leave the output before this batch commits.
    // Affected partitions come from the pk-pruned EMIT INDEX (round 11
    // — [[emitTableOf]]; legacy warehouses fall back to the full
    // output semi-join scan), are read by explicit path, and rewrite
    // in ONE dynamic-overwrite job under the output table's writer
    // lock — a per-partition loop pays one serial Spark job per
    // directory (measured ~100 s/batch on a merge-heavy ProbeStream),
    // and an unlocked rewrite window is where a second pipeline
    // writing the same table could interleave its own deletes.
    if (mr != null && catalog.tableExists(outTable)) {
      // no emptiness probe needed: every merge edge joins two distinct
      // labels, so mr != null guarantees a dethroned node; whether any
      // of them is actually IN the output is what `affected` answers
      val retr = graft.core.Fence.soft(
        mr.filter(col("__m") =!= col("__node"))
          .select(col("__node").as("__r")))
      release += retr
      jd(batch.sparkSession, s"b$batchKey retract") {
        retractFromOutput(catalog, stateTable, outTable, batchKey, retr)
      }
    }
    // 6. every new doc's sketch (kept or cluster-dropped) joins the
    //    state — dropped docs still bridge future arrivals. Two tables:
    //    the per-doc sketch (arrays, partitioned by batch) and the
    //    pre-banded rows partitioned by (batch, band-key bucket) so
    //    later batches prune their cross join at the storage layer.
    //    The sketch partition takes the same granularity-aware
    //    `pk = xxhash64(id) mod StatePartitions` layout as the
    //    bands/fp/emit tables (round 12), so the cross-verify `sh`
    //    fetch above prunes at the directory level; small batches stay
    //    one plain file — pk is a pure function of id, so plain files
    //    never store it (see [[readSketchBatches]]).
    val nSigs = jd(batch.sparkSession, s"b$batchKey signatures count") {
      newSigs.count() }
    val skDf = newSigs
      .join(newDocs.select(col("doc_id").as("id"), fp.as("fp")),
        Seq("id"))
      .select(col("id"), col("fp"), col("sh"), col("n"), col("sig"),
        col("sb"))
      .withColumn("batch_id", lit(batchKey))
    val writeSketch: () => Unit = () =>
      jd(batch.sparkSession, s"b$batchKey write sketch") {
    if (nSigs >= pkSplitMinRows)
      // sortWithinPartitions(id): tight per-row-group id min/max, so
      // the cross-verify fetch's candidate-id IN filter skips row
      // groups, not just directories
      catalog.writeSubPartitioned(
        skDf.withColumn("pk", emitPkCol(col("id")))
          .repartition(col("pk"))
          .sortWithinPartitions(col("id")),
        stateTable, "batch_id", batchKey, "pk")
    else
      // ONE sorted file, like the other plain-layout tables (round 13:
      // skDf comes off a shuffle join, so the unfused write left ~32
      // hash-scattered files whose row-group id spans covered the whole
      // partition — the residual per-state term ProbeSketch measured;
      // one file sorted by id costs one open and prunes by row-group
      // min/max under the candidate IN filter)
      catalog.writePartition(
        skDf.coalesce(1).sortWithinPartitions(col("id")),
        stateTable, "batch_id", batchKey)
    }
    val bandsDf = newBands.withColumn("pk", pkCol)
      .withColumn("batch_id", lit(batchKey))
    val writeBands: () => Unit = () =>
      jd(batch.sparkSession, s"b$batchKey write bands") {
    if (nSigs * geom.bands >= pkSplitMinRows)
      // repartition by pk first: otherwise every shuffle task writes a
      // file into every pk dir (tasks × 64 small files); this way each
      // pk's rows land in one task → ~one file per pk
      catalog.writeSubPartitioned(bandsDf.repartition(col("pk")),
        bandsTableOf(stateTable), "batch_id", batchKey, "pk")
    else
      // small batch: one plain file, pk as a data column (see
      // PkSplitMinRows)
      catalog.writePartition(bandsDf.coalesce(1),
        bandsTableOf(stateTable), "batch_id", batchKey)
    }
    // the fingerprint index rides beside the bands: (id, fp) bucketed
    // by hash(fp) so later batches' exact-dedup gate reads only
    // colliding buckets ([[seenFpRows]]); same granularity-aware
    // layout, nSigs rows by construction
    val fpDf = newDocs.select(col("doc_id").as("id"), fp.as("fp"))
      .withColumn("pk", fpPkCol(col("fp")))
      .withColumn("batch_id", lit(batchKey))
    val writeFp: () => Unit = () =>
      jd(batch.sparkSession, s"b$batchKey write fp") {
    if (nSigs >= pkSplitMinRows)
      catalog.writeSubPartitioned(fpDf.repartition(col("pk")),
        fpTableOf(stateTable), "batch_id", batchKey, "pk")
    else
      catalog.writePartition(fpDf.coalesce(1), fpTableOf(stateTable),
        "batch_id", batchKey)
    }
    // 6b. label-state updates (see [[lblTableOf]]): new member docs of
    //     multi/merged components, dethroned canonicals, and stored
    //     members whose component merged — one latest-wins row each.
    //     Only written when non-empty, so a merge-free stream never
    //     grows a label table at all.
    val lblRows = {
      val newMembers = labeled2.filter(col("__fl") =!= col("doc_id"))
        .select(col("doc_id").as("id"), col("__fl").as("lbl"))
      if (mr == null) newMembers
      else {
        val ex = mr.filter(col("__m") =!= col("__node"))
        val exRows = ex.select(col("__node").as("id"),
          col("__m").as("lbl"))
        val memberRows =
          if (curLbls == null) exRows.limit(0)
          else curLbls.select(col("id"), col("lbl").as("__ol"))
            .join(ex.select(col("__node"), col("__m")),
              col("__ol") === col("__node"))
            .select(col("id"), col("__m").as("lbl"))
        newMembers.unionByName(exRows).unionByName(memberRows)
      }
    }
    // one row per id. The three sources can only ever AGREE on an id's
    // label (their id sets are pairwise disjoint by construction, and
    // overlap through multiple merge paths resolves to the same __m) —
    // so a conflict is a real invariant violation, surfaced by the
    // row-level assert during the write instead of being masked by an
    // arbitrary-pick dedup (ADVICE r10). Same single shuffle as the
    // dropDuplicates it replaces.
    val lblChecked = lblRows
      .groupBy(col("id"))
      .agg(min(col("lbl")).as("lbl"), max(col("lbl")).as("__mx"))
      .filter(coalesce(
        assert_true(col("lbl") === col("__mx"),
          concat(lit("CorpusStream: conflicting labels for doc "),
            col("id"), lit(": "), col("lbl"), lit(" vs "), col("__mx")))
          .cast("boolean"),
        lit(true)))
      .select(col("id"), col("lbl"))
    // write-emptiness is derivable without ANY action: any verified
    // pair makes a 2+ component (a non-canonical member row), and any
    // merge graph dethrones at least one node — so rows exist exactly
    // when the batch found internal pairs or a merge graph, both known
    // driver-side
    val writeLbl: () => Unit = () =>
      if (mr != null || labelsOpt.nonEmpty)
        jd(batch.sparkSession, s"b$batchKey write lbl") {
        catalog.writePartition(lblChecked
            .withColumn("b", lit(batchId))
            .withColumn("batch_id", lit(batchKey))
            .coalesce(1),
          lblTableOf(stateTable), "batch_id", batchKey)
        }
    // 7. sample + project; the emit-INDEX partition lands first — a
    //    crash between the two writes leaves an index row whose doc
    //    never reached the output (a harmless superset; the replay
    //    rewrites both) — then the output partition itself, into the
    //    current EPOCH table when rolling is on ([[resolveOutputEpoch]];
    //    eb addresses the partition across epochs)
    val outRows = graft.core.Fence.soft(
      kept.filter(samplePredicate)
        .select(col("doc_id"), col("lang"),
          size(TextHash.tokens(col("text"))).as("n_toks")))
    release += outRows
    val outEpoch = resolveOutputEpoch(catalog, outTable, batchKey,
      epochEvery)
    val emitTable = emitTableOf(stateTable)
    val emitDf = outRows
      .select(col("doc_id").as("id"),
        lit(encodeEb(outEpoch, batchKey)).as("eb"))
      .withColumn("pk", emitPkCol(col("id")))
      .withColumn("batch_id", lit(batchKey))
    val writeEmitThenOut: () => Unit = () => {
      // in-lane ORDER preserved: the emit-index partition must commit
      // before the output partition (crash contract above)
      jd(batch.sparkSession, s"b$batchKey write emit") {
      if (nSigs >= pkSplitMinRows)
        catalog.writeSubPartitioned(emitDf.repartition(col("pk")),
          emitTable, "batch_id", batchKey, "pk")
      else
        catalog.writePartition(emitDf.coalesce(1), emitTable,
          "batch_id", batchKey)
      }
      jd(batch.sparkSession, s"b$batchKey write out") {
      catalog.writePartition(
        outRows.withColumn("batch_id", lit(batchKey)),
        epochTableName(outTable, outEpoch), "batch_id", batchKey)
      }
    }
    // the five sinks above land in DISJOINT tables/partitions and every
    // consumer of a sibling table runs in a LATER batch — run them as
    // concurrent lanes (guide §2.6); the only ordered pair (emit before
    // out) stays sequential inside its lane. A crash now leaves an
    // arbitrary subset of partitions instead of a prefix; the replay
    // overwrites every one of them idempotently, exactly as before.
    graft.core.Par.concurrently(Seq(
      writeSketch, writeBands, writeFp, writeLbl, writeEmitThenOut))
    } finally release.foreach(_.unpersist(false))
  }

  /** Remove `retr`'s ids (column `__r`) from every output partition
    * holding them — the locked, one-dynamic-overwrite-job-per-table
    * rewrite both the merge-retraction path and [[removeDocs]] drive. */
  private def retractFromOutput(catalog: TableCatalog,
      stateTable: String, outTable: String, batchKey: String,
      retr: DataFrame): Unit = {
    val affected = affectedOutputPartitions(catalog, stateTable,
      outTable, batchKey, retr)
    // one lane per affected table — tables are disjoint (base + epoch
    // generations), each rewrite is self-contained under its own lock,
    // and at takedown scale each is a couple of small serial jobs
    // whose driver latency the lanes overlap (guide §2.6)
    graft.core.Par.concurrently(affected.map { case (tbl, keys) => () =>
      catalog.withTableLock(tbl) {
        // materialize before the self-overwrite: the rewritten rows
        // must not be read lazily from the files being replaced
        val keepRows = catalog.readPaths(tbl,
            keys.map(catalog.partitionPath(tbl, "batch_id", _)))
          .join(retr, col("doc_id") === col("__r"), "left_anti")
          .localCheckpoint(true)
        // dynamic overwrite replaces only partitions PRESENT in the
        // frame — a partition whose every row was retracted would
        // survive untouched, so the now-empty ones delete explicitly
        val surviving = keepRows
          .select(col("batch_id").cast("string")).distinct()
          .collect().map(_.getString(0)).toSet
        if (surviving.nonEmpty)
          catalog.overwritePartitionsDynamic(keepRows, tbl,
            "batch_id")
        (keys.toSet -- surviving).foreach(
          catalog.deletePartition(tbl, "batch_id", _))
      }
    })
  }

  /** Operator-facing takedown for the streamed corpus: every given doc
    * id leaves the emitted output — base table and epoch tables alike,
    * located through the pk-pruned emit index and rewritten in the
    * same locked dynamic-overwrite jobs the merge-retraction path
    * uses, so the cost scales with the AFFECTED partitions, never the
    * corpus. Content removal, not history rewrite: the doc's state
    * rows (sketch, bands, fingerprint, label) deliberately REMAIN — it
    * keeps suppressing its near-duplicates, and a re-ingested copy of
    * the removed content still dies against the state instead of
    * resurrecting. (Re-admitting suppressed near-dupes would silently
    * change the corpus a consumer already trained on; if the cluster
    * itself must be reconsidered, re-run the batch pipeline over the
    * retained sources.) Idempotent — a second run, or an id that was
    * never emitted (a dropped duplicate, an unknown id), is a no-op. */
  def removeDocs(catalog: TableCatalog, stateTable: String,
                 outTable: String, ids: DataFrame,
                 idCol: String = "doc_id"): Unit = {
    // an id that doesn't cast to the pipeline's long doc_id would
    // anti-join nothing — a takedown that silently does NOT take the
    // doc down. Raise per row (try_cast: mode-independent — a plain
    // cast nulls silently under non-ANSI, throws engine-speak under
    // ANSI) instead of no-op'ing.
    val tryLong = expr(s"try_cast(`$idCol` as bigint)")
    val asLong = when(col(idCol).isNull,
      raise_error(lit("removeDocs: id is NULL — the takedown would " +
        "silently miss it")))
      .when(tryLong.isNull,
        raise_error(concat(lit("removeDocs: id '"),
          col(idCol).cast("string"),
          lit("' is not a long doc_id — the takedown would silently " +
            "miss it")))).otherwise(tryLong)
    val retr = graft.core.Fence.soft(
      ids.select(asLong.as("__r")).distinct())
    // the sentinel matches no real batch key, so every committed
    // partition is in scope (processBatch passes its own in-flight key
    // to keep the uncommitted batch out of the rewrite)
    try jd(ids.sparkSession, "removeDocs") {
      retractFromOutput(catalog, stateTable, outTable,
        "__takedown__", retr)
    } finally retr.unpersist(false)
  }

  /** [[processBatch]] for a change-data feed — the corpus twin of
    * [[graft.ann.AnnIndex.ingestCdcBatch]]: each micro-batch carries
    * `opCol` = "add" | "delete" rows, the adds run the full
    * gate/dedup/sample chain and the deletes then apply through the
    * [[removeDocs]] partition-scoped rewrite — the one foreachBatch
    * body a live corpus points at when its upstream interleaves
    * takedowns with new documents. Idempotent end to end under the
    * streaming engine's replay contract: the add half overwrites its
    * own `batch_id` partitions ([[processBatch]]'s contract) and the
    * delete half's rewrite is idempotent by construction, so a
    * replayed batch converges. Adds apply FIRST: a batch that adds and
    * deletes the same doc nets to deleted (the delete is the later
    * intent); a delete for a doc that never arrived (or was dropped as
    * a duplicate) is a no-op. The removed docs' STATE deliberately
    * remains — [[removeDocs]]'s near-dup-suppression semantics. A
    * NULL or unknown op is refused loudly before anything lands (the
    * `!isin` NULL trap — see the ANN twin). */
  def processCdcBatch(batch: DataFrame, catalog: TableCatalog,
                      stateTable: String, outTable: String,
                      opCol: String, batchId: Long,
                      threshold: Double = CorpusPipeline.NearDupThreshold,
                      benchmark: Option[DataFrame] = None,
                      admit: DataFrame => DataFrame = gate,
                      pkSplitMinRows: Long = PkSplitMinRows,
                      compactEvery: Int = CompactEvery,
                      epochEvery: Int = 0): Unit = {
    require(batch.filter(col(opCol).isNull ||
        !col(opCol).isin("add", "delete")).isEmpty,
      s"CorpusStream: '$opCol' must be 'add' or 'delete' in every row")
    processBatch(batch.filter(col(opCol) === "add").drop(opCol),
      catalog, stateTable, outTable, batchId, threshold, benchmark,
      admit, pkSplitMinRows, compactEvery, epochEvery)
    val dels = batch.filter(col(opCol) === "delete")
      .select(col("doc_id"))
    if (!dels.isEmpty)
      removeDocs(catalog, stateTable, outTable, dels)
  }

  /** Output partitions holding at least one retracted doc, grouped by
    * the (epoch) table they live in. Fast path: the emit index
    * ([[emitTableOf]]) pruned to the retracted ids' pk buckets — reads
    * kilobytes of (id, eb) rows however large and however many epochs
    * the output has grown. Fallback when the index doesn't cover every
    * BASE-table partition (a warehouse whose early batches predate the
    * index): the legacy column-pruned full semi-join over the base
    * table only — epoch tables never need the fallback, because they
    * are written exclusively by epoch-aware code whose emit rows
    * precede every output partition. */
  private[graft] def affectedOutputPartitions(catalog: TableCatalog,
      stateTable: String, outTable: String, batchKey: String,
      retr: DataFrame): Seq[(String, Seq[String])] = {
    val emitTable = emitTableOf(stateTable)
    val baseKeys = catalog.listPartitions(outTable, "batch_id")
      .filter(_ != batchKey)
    // STRUCTURAL coverage (round 12 — replaces the `_covered_from`
    // low-water id, whose "batch ids are monotone with processing
    // order" assumption misclassified pre-index output partitions
    // when a post-upgrade batch ran with a smaller id): an output
    // partition is covered iff its emit partition still EXISTS, or
    // its key was recorded by a compaction fold (`_covered_keys`).
    // The legacy low-water marker is still honored for warehouses
    // whose pre-round-12 compactions already folded their emit keys
    // away — there the key list is unrecoverable and the documented
    // monotonicity caveat stands until those partitions age out.
    val liveEmit: Set[String] =
      if (!catalog.tableExists(emitTable)) Set.empty
      else catalog.listPartitions(emitTable, "batch_id").toSet - batchKey
    val foldedKeys = catalog.readMarker(emitTable, CoveredKeysMarker)
      .flatMap(decodeCoveredKeys).getOrElse(Seq.empty)
    val coveredFrom = catalog.readMarker(emitTable, CoveredFromMarker)
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    val baseCovered = baseKeys.forall(k =>
      liveEmit.contains(k) ||
        scala.util.Try(k.toLong).toOption.exists(n =>
          rangesContain(foldedKeys, n) || coveredFrom.exists(n >= _)))
    // the pk-pruned index lookup serves every epoch table's hits (and
    // the base table's, when covered)
    val idxHits: Seq[String] = {
      val pks = retr.select(emitPkCol(col("__r")).as("pk"))
        .distinct().collect().map(_.getLong(0)).toSet
      prunedStateRead(catalog, emitTable, batchKey, pks,
          Seq(col("id"), col("eb")), EmitDataSchema) match {
        case None => Seq.empty
        case Some(em) =>
          em.join(retr, col("id") === col("__r"), "left_semi")
            .select(col("eb")).distinct()
            .collect().map(_.getString(0)).toSeq
      }
    }
    val ebHits =
      if (baseCovered) idxHits
      else idxHits.filter(EpochEb.matches) ++ (
        if (baseKeys.isEmpty) Seq.empty
        else catalog.read(outTable)
          .filter(col("batch_id").cast("string") =!= batchKey)
          .join(retr, col("doc_id") === col("__r"), "left_semi")
          .select(col("batch_id").cast("string").as("eb")).distinct()
          .collect().map(_.getString(0)).toSeq)
    // stale index rows may name partitions an earlier retraction
    // already deleted — keep only what each table actually has (one
    // listing per AFFECTED table, bounded by the hit set, not age)
    ebHits.map(ebTarget(outTable, _))
      .filter(_._2 != batchKey)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (tbl, pairs) =>
        val existing =
          (if (tbl == outTable) baseKeys
           else catalog.listPartitions(tbl, "batch_id")).toSet
        val keys = pairs.map(_._2).distinct.filter(existing)
        if (keys.isEmpty) None else Some(tbl -> keys)
      }
  }

  /** The seen corpus's sig-carrying band rows for the cross-batch
    * candidate join. Fast path: the `_bands` state table, pruned to the
    * `pk` sub-partitions this batch's own band keys hash into — the
    * collected pk list is bounded by [[StatePartitions]] (a constant-
    * size driver list, not data), and a batch whose keys cover few
    * buckets skips the rest of the stored corpus entirely; since
    * `pk` is a function of `band_key`, pruning by the new side's pk
    * set loses no colliding pair. Fallback (bands table missing or not
    * covering every sketch batch — a pre-round-8 state): re-band the
    * sketch state in memory, the old per-batch linear scan. */
  private def bandsCovered(catalog: TableCatalog, stateTable: String,
      batchKey: String): Boolean = {
    val bandsTable = bandsTableOf(stateTable)
    catalog.tableExists(bandsTable) && {
      val sk = catalog.listPartitions(stateTable, "batch_id").toSet -
        batchKey
      val bd = catalog.listPartitions(bandsTable, "batch_id").toSet -
        batchKey
      sk.subsetOf(bd)
    }
  }

  private def seenBandFrame(catalog: TableCatalog, stateTable: String,
      batchKey: String, state: DataFrame, newBands: DataFrame,
      geom: graft.sim.LshGeometry, covered: Boolean): DataFrame = {
    val bandsTable = bandsTableOf(stateTable)
    if (!covered) MinHashLSH.bandFrameWithSig(state, geom)
    else {
      val pks = newBands.select(pkCol.as("pk")).distinct()
        .collect().map(_.getLong(0)).toSet
      prunedStateRead(catalog, bandsTable, batchKey, pks,
          Seq(col("id"), col("n"), col("sig"), col("band_idx"),
            col("band_key")), BandsDataSchema)
        .getOrElse(newBands.limit(0))
    }
  }

  /** Read a pk-bucketed state table (`_bands`, `_emit`) pruned to the
    * given pk set — the listing-and-scan shape both consumers share.
    * Enumerates exactly the colliding directories and reads only
    * those: a table-root read would LIST every partition of the
    * growing table each batch (a linear term in files, even with
    * partition pruning skipping the data). pk-split batch dirs prune
    * at the directory level; plain small-batch dirs (see
    * [[PkSplitMinRows]]) are read whole (tiny by construction) and
    * pruned by the pk data column. One Hadoop LISTING per batch dir
    * (not a per-(dir,pk) exists round-trip — on an object store each
    * exists() is a remote call), intersected with the pk set
    * driver-side. None when nothing collides. */
  private def prunedStateRead(catalog: TableCatalog, table: String,
      batchKey: String, pks: Set[Long],
      cols: Seq[org.apache.spark.sql.Column],
      dataSchema: StructType): Option[DataFrame] = {
    val withSubs = catalog
      .listPartitions(table, "batch_id")
      .filter(_ != batchKey)
      .map(b => b ->
        catalog.listSubPartitions(table, "batch_id", b, "pk"))
    val (split, plain) = withSubs.partition(_._2.nonEmpty)
    val splitDirs = for {
      (b, subs) <- split
      p <- subs.filter(s =>
        scala.util.Try(s.toLong).toOption.exists(pks.contains))
    } yield s"${catalog.partitionPath(table, "batch_id", b)}/pk=$p"
    val plainDirs = plain.map(_._1)
      .filter(catalog.partitionHasDataFiles(table, "batch_id", _))
      .map(catalog.partitionPath(table, "batch_id", _))
    val parts = Seq(
      if (splitDirs.nonEmpty)
        Some(catalog.readPaths(table, splitDirs, dataSchema)
          .select(cols: _*))
      else None,
      if (plainDirs.nonEmpty)
        Some(catalog.readPaths(table, plainDirs, withPk(dataSchema))
          .filter(col("pk").isin(pks.toSeq: _*)).select(cols: _*))
      else None).flatten
    if (parts.isEmpty) None else Some(parts.reduce(_ unionByName _))
  }

  /** Shape-aware read of the given sketch-table batch partitions
    * (round 12 — the sketch table joined the pk-bucketed layouts):
    * batch partitions with ≥ `pkSplitMinRows` rows are laid out as
    * `pk = xxhash64(id) mod StatePartitions` sub-directories, smaller
    * ones stay plain files — so a table-ROOT read's partition
    * discovery would see conflicting directory depths. Each shape
    * group reads through [[TableCatalog.readPaths]] (uniform depth
    * within a group), the legacy optional `sb` column normalizes per
    * group, and the groups union.
    *
    * With `pks` set, pk-split partitions prune at the DIRECTORY level
    * and plain partitions — tiny by construction, or legacy ones this
    * degrades gracefully on until compaction rewrites them split —
    * prune on the COMPUTED pk: pk is a pure function of id, so plain
    * files never store it and legacy states need no backfill pass.
    * None when no listed partition holds a matching row source. */
  private[graft] def readSketchBatches(catalog: TableCatalog,
      stateTable: String, keys: Seq[String],
      pks: Option[Set[Long]]): Option[DataFrame] = {
    val withSubs = keys.map(b => b ->
      catalog.listSubPartitions(stateTable, "batch_id", b, "pk"))
    val (split, plain0) = withSubs.partition(_._2.nonEmpty)
    val plain = plain0.map(_._1)
      .filter(catalog.partitionHasDataFiles(stateTable, "batch_id", _))
    def normalize(df: DataFrame): DataFrame = {
      val sb = if (df.columns.contains("sb"))
          coalesce(col("sb"), MinHashLSH.bottomKCol(col("sh")))
        else MinHashLSH.bottomKCol(col("sh"))
      df.select(col("id"), col("fp"), col("sh"), col("n"), col("sig"),
        sb.as("sb"))
    }
    val splitDirs = pks match {
      case Some(ps) => for {
        (b, subs) <- split
        p <- subs.filter(s =>
          scala.util.Try(s.toLong).toOption.exists(ps.contains))
      } yield s"${catalog.partitionPath(stateTable, "batch_id", b)}/pk=$p"
      case None => split.map(s =>
        catalog.partitionPath(stateTable, "batch_id", s._1))
    }
    val splitFrame =
      if (splitDirs.isEmpty) None
      else Some(normalize(catalog.readPaths(stateTable, splitDirs,
        SketchDataSchema)))
    val plainFrame =
      if (plain.isEmpty) None
      else {
        val raw = catalog.readPaths(stateTable,
          plain.map(catalog.partitionPath(stateTable, "batch_id", _)),
          SketchDataSchema)
        Some(normalize(pks match {
          case Some(ps) =>
            raw.filter(emitPkCol(col("id")).isin(ps.toSeq: _*))
          case None => raw
        }))
      }
    (splitFrame, plainFrame) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
  }

  /** Public shape-aware reader for a sketch state table (mixed
    * plain/pk-split partitions — see [[readSketchBatches]]): what
    * tests and tools must use instead of a table-root read. Falls back
    * to the root read when no committed batch partition exists (the
    * `_schema`-anchor empty-table case). */
  def readState(catalog: TableCatalog, stateTable: String): DataFrame =
    readSketchBatches(catalog, stateTable,
        catalog.listPartitions(stateTable, "batch_id"), None)
      .getOrElse(catalog.read(stateTable))

  /** Stored `(__seen_fp, __seen_id)` rows that could fp-collide with
    * this batch, from the pk-bucketed `_fp` index ([[fpTableOf]])
    * pruned to the pk buckets the batch's own fingerprints hash into —
    * the collected pk set is bounded by [[StatePartitions]]. Returns
    * null when no stored bucket collides (the caller then skips the
    * anti-join entirely — driver-decided, no emptiness job).
    *
    * A state written by pre-index code (sketch batches the fp table
    * does not cover) is BACKFILLED here, once, from the sketch rows'
    * own fp column — one column-pruned pass per missing batch, under
    * the state's writer lock so concurrent pipelines don't interleave
    * overwrites; if the lock is held elsewhere, this batch falls back
    * to the legacy full fp-column scan and the next one retries. */
  private def seenFpRows(catalog: TableCatalog, stateTable: String,
      batchKey: String, state: DataFrame, localDeduped: DataFrame,
      pkSplitMinRows: Long): DataFrame = {
    val fpTable = fpTableOf(stateTable)
    val skKeys = catalog.listPartitions(stateTable, "batch_id").toSet -
      batchKey
    val fpKeys =
      if (!catalog.tableExists(fpTable)) Set.empty[String]
      else catalog.listPartitions(fpTable, "batch_id").toSet - batchKey
    var covered = skKeys.subsetOf(fpKeys)
    if (!covered) {
      // heartbeated hold (round 13): a backfill over a 10^10-doc
      // pre-index state is one column-pruned pass per missing batch
      // and can outlive the 15-min lease — a bare acquire would let a
      // waiter break the lock mid-write. Lock held elsewhere: fall
      // back to the full fp scan; the next batch retries.
      covered = catalog.withTableLockIfFree(stateTable) {
        (skKeys -- fpKeys).foreach { b =>
          val rows = catalog.readPaths(stateTable,
              Seq(catalog.partitionPath(stateTable, "batch_id", b)),
              FpDataSchema)
            .select(col("id"), col("fp"))
            .withColumn("pk", fpPkCol(col("fp")))
            .withColumn("batch_id", lit(b))
          // granularity-aware like the live write path; the count is
          // a one-time backfill cost, not a per-batch term
          if (rows.count() >= pkSplitMinRows)
            catalog.writeSubPartitioned(rows.repartition(col("pk")),
              fpTable, "batch_id", b, "pk")
          else
            catalog.writePartition(rows.coalesce(1), fpTable,
              "batch_id", b)
        }
      }.isDefined
    }
    if (!covered)
      state.select(col("fp").as("__seen_fp"), col("id").as("__seen_id"))
    else {
      val pks = localDeduped.select(fpPkCol(fp).as("pk")).distinct()
        .collect().map(_.getLong(0)).toSet
      prunedStateRead(catalog, fpTable, batchKey, pks,
          Seq(col("fp").as("__seen_fp"), col("id").as("__seen_id")),
          FpDataSchema)
        .orNull
    }
  }

  /** Launch the incremental pipeline over a streaming document frame
    * (columns doc_id, text, lang). Output accumulates in `outTable`,
    * one partition per micro-batch; per-doc sketches accumulate in
    * `stateTable`. */
  def incremental(docs: DataFrame, catalog: TableCatalog,
                  checkpointDir: String,
                  stateTable: String = "corpus_state",
                  outTable: String = "corpus_sampled",
                  threshold: Double = CorpusPipeline.NearDupThreshold,
                  benchmark: Option[DataFrame] = None,
                  epochEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, catalog, stateTable, outTable, batchId,
          threshold, benchmark, epochEvery = epochEvery)
      }
      .start()
}
