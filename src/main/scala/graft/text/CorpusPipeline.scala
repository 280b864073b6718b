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

  /** Dataset datasheet: the per-(lang, source) documentation table a
    * published corpus ships with — document and token counts, mean
    * quality score, and the exact-duplicate rate at the pipeline's
    * fingerprint (the fraction of the stratum that exact-dedup would
    * drop: every non-first row of a corpus-wide fingerprint group,
    * attributed to the DUPLICATE's stratum). Mean quality is averaged
    * through the floor(q·2²⁰ + 0.5) integer quantization so the double
    * is order-free and engine-replayable (the k-means-mean trick).
    *
    * Scale: one fingerprint-partitioned window (hash shuffle on md5
    * keys — uniform, skew-free) and one group aggregate with a
    * map-side partial; no driver state. Output: (lang, source,
    * n_docs, n_toks, mean_quality, dup_rate). */
  def datasheet(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextHash.tokens(col("text"))
    val w = Window.partitionBy(md5(fingerprintPrefix))
      .orderBy(col("doc_id"))
    docs
      .withColumn("__nt", size(toks).cast("long"))
      .withColumn("__qi",
        floor(TextAnalysis.qualityScore(toks) * lit(1048576.0) +
          lit(0.5)).cast("long"))
      .withColumn("__dup",
        (row_number().over(w) > 1).cast("int").cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_toks"),
        (sum(col("__qi")).cast("double") / lit(1048576.0) /
          count(lit(1)).cast("double")).as("mean_quality"),
        (sum(col("__dup")).cast("double") /
          count(lit(1)).cast("double")).as("dup_rate"))
  }

  /** Stage-attrition funnel — "where did my data go": one row per
    * pipeline stage (raw → gated → exact_dedup → neardup_cluster →
    * sampled) with the surviving document count and how many the stage
    * dropped. The first question an operator asks when a corpus build
    * comes out smaller than expected, answered from the SAME stage
    * definitions the dp01 chain runs (this object's constants), so the
    * funnel cannot drift from the pipeline it explains.
    *
    * Scale shape: the chain runs ONCE — the gate+dedup and cluster
    * subtrees are fenced, so each stage count is a partial-aggregated
    * count(1) over a materialized stage, not a chain re-run per row of
    * output. The 5-row `dropped` window is funnel-sized (stage count),
    * never corpus-sized. */
  def funnel(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gated = graft.core.Fence.soft(gate(docs))
    val deduped = graft.core.Fence(graft.ops.Dedup.exactDedup(
      gated, fingerprintPrefix, col("doc_id")))
    val pairs = graft.sim.MinHashLSH.nearDupPairs(deduped, "doc_id",
      "text", threshold = NearDupThreshold)
    val clustered = graft.core.Fence(graft.ops.Dedup.clusterDedup(
      deduped, "doc_id", pairs, "doc_a", "doc_b"))
    def cnt(df: DataFrame, ord: Int, name: String) =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col("n_docs"))
    val counts = cnt(docs, 0, "raw")
      .unionAll(cnt(gated, 1, "gated"))
      .unionAll(cnt(deduped, 2, "exact_dedup"))
      .unionAll(cnt(clustered, 3, "neardup_cluster"))
      .unionAll(cnt(clustered.filter(samplePredicate), 4, "sampled"))
    counts.withColumn("dropped",
      coalesce(lag(col("n_docs"), 1).over(Window.orderBy("stage_ord"))
        - col("n_docs"), lit(0L)))
  }

  /** DuckDB rendering of [[datasheet]] over `docsTable` — identical
    * quantization, window and division shapes. */
  def datasheetSql(docsTable: String): String = {
    val toks = "string_split(text, ' ')"
    val q = TextAnalysis.qualityScoreSql(toks)
    s"""WITH d AS (SELECT lang, source,
          CAST(len($toks) AS BIGINT) AS nt,
          CAST(FLOOR($q * 1048576.0 + 0.5) AS BIGINT) AS qi,
          CASE WHEN row_number() OVER (
              PARTITION BY md5(substring(text, 1, $FingerprintPrefixLen))
              ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS dup
          FROM $docsTable)
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(nt) AS BIGINT) AS n_toks,
          CAST(SUM(qi) AS DOUBLE) / 1048576.0
            / CAST(COUNT(*) AS DOUBLE) AS mean_quality,
          CAST(SUM(dup) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS dup_rate
        FROM d GROUP BY lang, source ORDER BY lang, source"""
  }
}
