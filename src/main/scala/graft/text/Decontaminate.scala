package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-corpus hygiene step next to
  * dedup: remove every corpus document that shares a word n-gram with
  * the evaluation/benchmark set, so test data cannot leak into
  * training data (the GPT-3/Pile overlap rule, at word-gram
  * granularity).
  *
  * Scale shape: both sides explode to (id, gram-hash) rows — the same
  * staged, fenced shingling as [[graft.sim.JaccardJoin]] — and
  * contamination is one semi-join on the gram hash (an equi-join
  * Catalyst plans as broadcast while the benchmark gram set is small,
  * the overwhelmingly common case, and as shuffle beyond), then one
  * anti-join removes flagged ids. No pair enumeration, no driver
  * state, no cartesian at any corpus size.
  */
object Decontaminate {

  /** Corpus rows whose text shares NO word n-gram with any benchmark
    * row. Gram hashing is [[TextHash.wordShingleHashesFromTokenHashes]]
    * — identical on both engines, so the oracle replicates the whole
    * rule. Documents shorter than n words have no grams and always
    * survive. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 5): DataFrame = {
    // gram hashing via the one-pass shingle kernel (Column-form twin
    // pinned by TextSimSpec; the oracle recomputes the Column form)
    val corpusGrams = graft.sim.JaccardJoin
      .wordShingleFrame(corpus, idCol, textCol, n)
      .select(col("id").as("__id"), explode(col("sh")).as("__g"))
    val benchGrams = graft.sim.JaccardJoin
      .wordShingleFrame(benchmark.withColumn("__bid", lit(0L)),
        "__bid", benchTextCol, n)
      .select(explode(col("sh")).as("__g")).distinct()
    val contaminated = corpusGrams.join(benchGrams, Seq("__g"), "left_semi")
      .select(col("__id")).distinct()
    corpus.join(contaminated, corpus(idCol) === contaminated("__id"),
      "left_anti")
  }

  /** The explainability record [[decontaminate]] drops silently: for
    * every (corpus doc, benchmark doc) pair sharing at least one word
    * n-gram, how many DISTINCT gram hashes they share — the audit row
    * a removal review or an overlap-threshold tuning pass reads ("why
    * was doc X removed, and against which benchmark item, on how much
    * overlap"). Both sides shingle exactly as the removal path does;
    * each side dedups its grams per id BEFORE the join (array_distinct
    * — so the count is of distinct shared gram VALUES, not occurrence
    * pairs), and the pair list stays gram-hash-equi-join + one
    * partially-aggregated count: no pair enumeration beyond actual
    * collisions, no cartesian. Output: (doc_id, bench_id,
    * shared_grams). */
  def provenance(corpus: DataFrame, idCol: String, textCol: String,
                 benchmark: DataFrame, benchIdCol: String,
                 benchTextCol: String, n: Int = 5): DataFrame = {
    val corpusGrams = graft.sim.JaccardJoin
      .wordShingleFrame(corpus, idCol, textCol, n)
      .select(col("id").as("doc_id"),
        explode(array_distinct(col("sh"))).as("__g"))
    val benchGrams = graft.sim.JaccardJoin
      .wordShingleFrame(benchmark, benchIdCol, benchTextCol, n)
      .select(col("id").as("bench_id"),
        explode(array_distinct(col("sh"))).as("__g"))
    corpusGrams.join(benchGrams, Seq("__g"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_grams"))
  }
}
