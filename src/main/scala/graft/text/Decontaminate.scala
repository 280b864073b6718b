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

  /** The benchmark gram set compressed into a Bloom filter — the
    * approximate-membership form of [[decontaminate]] for when even
    * the distinct benchmark gram set is too large to ship to every
    * probe site: `d` hash functions into `m` bits cap the filter at
    * `m` bits NO MATTER how many grams the benchmark holds. Served
    * relationally as the DISTINCT set-bit positions (≤ m int rows —
    * the broadcastable bitset; a physical bitmask is the same content
    * packed 8 per byte). Bit positions are [[graft.ops.CountMin]]'s
    * depth-salted md5 buckets, so the DuckDB oracle replays every bit.
    */
  def bloomBits(benchmark: DataFrame, benchTextCol: String,
                n: Int = 5, d: Int = 3, m: Int = 262144): DataFrame = {
    require(d > 0 && m > 0, s"need d > 0 and m > 0, got d=$d m=$m")
    val grams = graft.sim.JaccardJoin
      .wordShingleFrame(benchmark.withColumn("__bid", lit(0L)),
        "__bid", benchTextCol, n)
      .select(explode(col("sh")).as("__g"))
    (0 until d)
      .map(r => grams.select(
        graft.ops.CountMin.bucket(col("__g"), r, m).as("pos")))
      .reduce(_.unionAll(_)).distinct()
  }

  /** Corpus rows the Bloom filter clears: a document is flagged when
    * ANY of its grams finds ALL `d` of its bits set (one-sided error —
    * every truly-contaminated document is flagged, a clean one is
    * falsely flagged with probability (fill ratio)^d, the standard
    * Bloom trade: over-removal bounded by the filter size, NEVER
    * under-removal). `n`/`d`/`m` must match the [[bloomBits]] build —
    * positions mean nothing under another geometry.
    *
    * Scale shape: grams probe the broadcast bit set with one semi-join
    * landing BEFORE the per-(doc, gram) hit count (so only set-bit
    * rows survive to the aggregation), then one anti-join removes
    * flagged ids — no pair enumeration, no cartesian. */
  def bloomDecontaminate(corpus: DataFrame, idCol: String,
                         textCol: String, bits: DataFrame,
                         n: Int = 5, d: Int = 3,
                         m: Int = 262144): DataFrame = {
    require(d > 0 && m > 0, s"need d > 0 and m > 0, got d=$d m=$m")
    val corpusGrams = graft.sim.JaccardJoin
      .wordShingleFrame(corpus, idCol, textCol, n)
      .select(col("id").as("__id"),
        explode(array_distinct(col("sh"))).as("__g"))
    val probes = corpusGrams.select(col("__id"), col("__g"),
      explode(array((0 until d).map(r =>
        graft.ops.CountMin.bucket(col("__g"), r, m)): _*)).as("pos"))
    val flagged = probes
      .join(broadcast(bits.select(col("pos"))), Seq("pos"), "left_semi")
      .groupBy(col("__id"), col("__g"))
      .agg(count(lit(1)).as("__nh"))
      .filter(col("__nh") === d)
      .select(col("__id")).distinct()
    corpus.join(flagged, corpus(idCol) === flagged("__id"), "left_anti")
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
