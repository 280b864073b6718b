package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.catalog.TableCatalog
import graft.ops.Dedup
import graft.sim.MinHashLSH
import graft.text.{TextAnalysis, TextHash}

/** Incremental (micro-batched) twin of the dp01 corpus pipeline — the
  * reference's own partition-at-a-time daily loop
  * (get_similarity.py:89-103) generalized to the LLM corpus stages:
  * every micro-batch is gated, deduped against everything already seen,
  * near-dup-clustered, sampled, and lands as one idempotent partition
  * (`TableCatalog.writePartition`), so replaying a failed batch
  * overwrites its own partition instead of duplicating it.
  *
  * Cross-batch semantics (the part a row-local twin can't fake):
  *  - exact dedup: keep-first across batches — with ids ascending in
  *    arrival order (the ingestion contract; the reference's daily
  *    extracts have the same property) this equals dp01's global
  *    keep-smallest-id;
  *  - near-dup clustering: a batch-internal component dies WHOLE when
  *    any member pairs with any previously-seen doc (seen = every
  *    gated+exact-deduped doc, including cluster-dropped ones — a
  *    dropped doc still bridges later arrivals to its component);
  *    otherwise its smallest id survives, like the batch operator.
  *    This is the strongest sound no-retraction semantics: the one
  *    divergence from global [[Dedup.clusterDedup]] is a component
  *    whose only bridge arrives in a LATER batch (the earlier doc is
  *    already emitted and cannot be retracted) — inherent to any
  *    streaming dedup, documented rather than hidden.
  *
  * Scale notes: the twin recomputes MinHash signatures of the seen
  * corpus each batch by unioning it with the new docs (keeps
  * [[MinHashLSH.nearDupPairs]] reusable unchanged); a production
  * deployment would persist the signature/band table once per doc and
  * join new bands against it — same joins, amortized prep.
  */
object CorpusStream {

  /** dp01's row-local gate: language identified and quality above the
    * pipeline floor. */
  private def gate(docs: DataFrame): DataFrame = {
    val toks = TextHash.tokens(col("text"))
    docs.filter(TextAnalysis.langId(toks) =!= "und" &&
      TextAnalysis.qualityScore(toks) >= 0.42)
  }

  /** dp01's deterministic stratified-sample predicate. */
  private def samplePredicate = {
    val bucket =
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
    val threshold = when(col("lang") === "en", "c0").otherwise("80")
    bucket < threshold
  }

  /** One micro-batch through the full chain. Exposed (not inlined in
    * the foreachBatch closure) so the spec can drive batches directly
    * and assert intermediate semantics. */
  def processBatch(batch: DataFrame, catalog: TableCatalog,
                   seenTable: String, outTable: String, batchId: Long,
                   threshold: Double = 0.7): Unit = {
    val batchKey = batchId.toString
    // 1. row-local gate + batch-local exact dedup (keep smallest id —
    //    the same rule dp01 applies globally)
    val localDeduped = Dedup.exactDedup(gate(batch),
      substring(col("text"), 1, 60), col("doc_id"))
      .select(col("doc_id"), col("text"), col("lang"))
    // 2. drop re-arrivals: fingerprints already seen in EARLIER batches
    //    (a replay of this batch excludes its own half-written partition,
    //    so reprocessing is idempotent end-to-end)
    val seen =
      if (catalog.tableExists(seenTable))
        catalog.read(seenTable)
          .filter(col("batch_id").cast("string") =!= batchKey)
          .select(col("doc_id"), col("text"), col("lang"))
      else localDeduped.limit(0)
    val newDocs = graft.core.Fence(localDeduped.join(
      seen.select(md5(substring(col("text"), 1, 60)).as("__fp")).distinct(),
      md5(substring(col("text"), 1, 60)) === col("__fp"), "left_anti"))
    // 3. near-dup pairs over seen ∪ new, classified by which side each
    //    end lives on
    val pairs = MinHashLSH.nearDupPairs(seen.unionByName(newDocs),
      "doc_id", "text", threshold = threshold)
    val newIds = newDocs.select(col("doc_id").as("__nid"))
    val flagged = graft.core.Fence(pairs
      .join(newIds.select(col("__nid").as("doc_a"),
        lit(true).as("__a_new")), Seq("doc_a"), "left")
      .join(newIds.select(col("__nid").as("doc_b"),
        lit(true).as("__b_new")), Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("__a_new"), lit(false)).as("a_new"),
        coalesce(col("__b_new"), lit(false)).as("b_new")))
    val internal = flagged.filter(col("a_new") && col("b_new"))
      .select(col("doc_a"), col("doc_b"))
    val crossTouched = flagged.filter(col("a_new") =!= col("b_new"))
      .select(when(col("a_new"), col("doc_a")).otherwise(col("doc_b"))
        .as("doc_id"))
      .distinct()
    // 4. component resolution within the batch; a component dies whole
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
    // 5. every new doc (kept or cluster-dropped) becomes part of the
    //    seen corpus — dropped docs still bridge future arrivals
    catalog.writePartition(
      newDocs.withColumn("batch_id", lit(batchKey)),
      seenTable, "batch_id", batchKey)
    // 6. sample + project + idempotent partition write
    catalog.writePartition(
      kept.filter(samplePredicate)
        .select(col("doc_id"), col("lang"),
          size(TextHash.tokens(col("text"))).as("n_toks"),
          lit(batchKey).as("batch_id")),
      outTable, "batch_id", batchKey)
  }

  /** Launch the incremental pipeline over a streaming document frame
    * (columns doc_id, text, lang). Output accumulates in `outTable`,
    * one partition per micro-batch. */
  def incremental(docs: DataFrame, catalog: TableCatalog,
                  checkpointDir: String,
                  seenTable: String = "corpus_seen",
                  outTable: String = "corpus_sampled",
                  threshold: Double = 0.7): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, catalog, seenTable, outTable, batchId,
          threshold)
      }
      .start()
}
