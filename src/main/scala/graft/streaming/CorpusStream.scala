package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
  *  - exact dedup: keep-first across batches — with ids ascending in
  *    arrival order (the ingestion contract; the reference's daily
  *    extracts have the same property) this equals dp01's global
  *    keep-smallest-id;
  *  - near-dup clustering: a batch-internal component dies WHOLE when
  *    any member verifies against any previously-seen doc (seen =
  *    every gated+exact-deduped doc, including cluster-dropped ones —
  *    a dropped doc still bridges later arrivals to its component);
  *    otherwise its smallest id survives, like the batch operator.
  *    This is the strongest sound no-retraction semantics: the one
  *    divergence from global [[Dedup.clusterDedup]] is a component
  *    whose only bridge arrives in a LATER batch (the earlier doc is
  *    already emitted and cannot be retracted) — inherent to any
  *    streaming dedup, documented rather than hidden.
  */
object CorpusStream {

  // gate / fingerprint / sample definitions come from the shared
  // graft.text.CorpusPipeline object — the same one LlmQueries.dp01
  // reads — so the batch/streaming equality StreamingSpec asserts
  // cannot silently break by editing one side's constants
  private def gate(docs: DataFrame): DataFrame =
    CorpusPipeline.gate(docs)

  private def samplePredicate =
    CorpusPipeline.samplePredicate

  private def fp = md5(CorpusPipeline.fingerprintPrefix)

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
                   admit: DataFrame => DataFrame = gate): Unit = {
    // the threshold-fitted band geometry (MinHashLSH.geometryFor) fixes
    // the stored signature width, so every batch of one pipeline derives
    // the same geometry from the same threshold; changing the threshold
    // of an existing pipeline means a new state table, not a reread
    val geom = MinHashLSH.geometryFor(threshold)
    val batchKey = batchId.toString
    // 1. row-local gate + batch-local exact dedup (keep smallest id —
    //    the same rule dp01 applies globally); when a benchmark set is
    //    configured, decontaminate each batch against it before any
    //    state is written (eval-set leaks must never enter the corpus)
    val gated = benchmark match {
      case Some(b) => graft.text.Decontaminate
        .decontaminate(admit(batch), "doc_id", "text", b, "text")
      case None => admit(batch)
    }
    val localDeduped = Dedup.exactDedup(gated,
      CorpusPipeline.fingerprintPrefix, col("doc_id"))
      .select(col("doc_id"), col("text"), col("lang"))
    // 2. sketch state from EARLIER batches (a replay of this batch
    //    excludes its own half-written partition, so reprocessing is
    //    idempotent end-to-end)
    val state =
      if (catalog.tableExists(stateTable))
        catalog.read(stateTable)
          .filter(col("batch_id").cast("string") =!= batchKey)
          .select(col("id"), col("fp"), col("sh"), col("n"), col("sig"))
      else null
    // 3. drop exact re-arrivals by stored fingerprint
    val newDocs = graft.core.Fence(
      if (state == null) localDeduped
      else localDeduped.join(state.select(col("fp").as("__seen_fp")),
        fp === col("__seen_fp"), "left_anti"))
    // 4. shingle + sign the NEW docs once; band them against their own
    //    bands (internal pairs) and the STORED bands (cross pairs) —
    //    seen docs are never re-shingled
    val newSigs = graft.core.Fence(
      MinHashLSH.signatureFrame(newDocs, "doc_id", "text", 3, geom))
    // sig-carrying band frames + the fused floor (collidedSurvivors):
    // the size prune + agreement floor filter inside the band join's
    // own stage, so the per-batch shuffle is linear in band rows —
    // at scale the stored corpus's band side is the big one, and this
    // is exactly the shape that keeps it from re-joining per candidate
    val newBands = MinHashLSH.bandFrameWithSig(newSigs, geom)
    val allSigs =
      if (state == null) newSigs.select(col("id"), col("sh"), col("n"),
        col("sig"))
      else newSigs.select(col("id"), col("sh"), col("n"), col("sig"))
        .unionByName(state.select(col("id"), col("sh"), col("n"),
          col("sig")))
    val internal = MinHashLSH.verifySurvivors(
        MinHashLSH.collidedSurvivors(newBands, newBands, threshold,
          geom, selfJoin = true),
        allSigs, threshold)
      .select(col("doc_a"), col("doc_b"))
    val crossTouched =
      if (state == null) newDocs.select(col("doc_id")).limit(0)
      else {
        val seenBands = MinHashLSH.bandFrameWithSig(state, geom)
        MinHashLSH.verifySurvivors(
            MinHashLSH.collidedSurvivors(newBands, seenBands, threshold,
              geom, selfJoin = false),
            allSigs, threshold)
          .select(col("doc_a").as("doc_id")).distinct()
      }
    // 5. component resolution within the batch; a component dies whole
    //    when any member touches the seen corpus
    val labels = Dedup.connectedComponents(internal, "doc_a", "doc_b")
    val labeled = newDocs.join(
        labels.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .withColumn("label", coalesce(col("label"), col("doc_id")))
    val deadLabels = labeled
      .join(crossTouched, Seq("doc_id"), "left_semi")
      .select(col("label")).distinct()
    val kept = labeled.filter(col("doc_id") === col("label"))
      .join(deadLabels.withColumnRenamed("label", "__dead"),
        col("label") === col("__dead"), "left_anti")
      .drop("label")
    // 6. every new doc's sketch (kept or cluster-dropped) joins the
    //    state — dropped docs still bridge future arrivals
    catalog.writePartition(
      newSigs.join(newDocs.select(col("doc_id").as("id"), fp.as("fp")),
          Seq("id"))
        .select(col("id"), col("fp"), col("sh"), col("n"), col("sig"))
        .withColumn("batch_id", lit(batchKey)),
      stateTable, "batch_id", batchKey)
    // 7. sample + project + idempotent partition write
    catalog.writePartition(
      kept.filter(samplePredicate)
        .select(col("doc_id"), col("lang"),
          size(TextHash.tokens(col("text"))).as("n_toks"),
          lit(batchKey).as("batch_id")),
      outTable, "batch_id", batchKey)
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
                  benchmark: Option[DataFrame] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, catalog, stateTable, outTable, batchId,
          threshold, benchmark)
      }
      .start()
}
