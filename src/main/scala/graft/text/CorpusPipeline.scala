package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The corpus pipeline's shared stage definitions — the single source
  * of truth for the constants and row-local predicates that the batch
  * query (`LlmQueries.dp01_corpus_pipeline`), its DuckDB oracle, and
  * the incremental twin ([[graft.streaming.CorpusStream]]) all apply.
  * Hoisted here so the batch/streaming equality StreamingSpec asserts
  * (and the Spark/oracle equality the gate asserts) cannot silently
  * break by editing one copy of a constant.
  */
object CorpusPipeline {

  /** Quality-score gate floor (dp01's admission bar). */
  val QualityFloor = 0.42

  /** Exact-dedup fingerprints hash this many leading characters. */
  val FingerprintPrefixLen = 60

  /** Near-dup clustering threshold: deliberately below dd03's 0.8 —
    * the pipeline position where near-dup clustering earns its keep is
    * the J-band the exact prefix dedup can't see. */
  val NearDupThreshold = 0.7

  /** Stratified-sample md5-bucket ceilings, per language. */
  val SampleBucketEn = "c0"
  val SampleBucketOther = "80"

  /** Row-local admission gate: language identified and quality at or
    * above [[QualityFloor]]. */
  def gateCondition: Column = {
    val toks = TextHash.tokens(col("text"))
    TextAnalysis.langId(toks) =!= "und" &&
      TextAnalysis.qualityScore(toks) >= QualityFloor
  }

  def gate(docs: DataFrame): DataFrame = docs.filter(gateCondition)

  /** The exact-dedup content key (hashed by the dedup/state layers). */
  def fingerprintPrefix: Column =
    substring(col("text"), 1, FingerprintPrefixLen)

  /** Deterministic stratified-sample predicate over (doc_id, lang). */
  def samplePredicate: Column = {
    val bucket =
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
    bucket < when(col("lang") === "en", SampleBucketEn)
      .otherwise(SampleBucketOther)
  }
}
