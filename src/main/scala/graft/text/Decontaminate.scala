package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Fence

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
    def grams(df: DataFrame, id: Option[String], text: String) = {
      val base = df.select(
        (id.map(c => Seq(col(c).as("__id"))).getOrElse(Seq.empty) :+
          TextHash.tokenHashes(col(text)).as("__th")): _*)
      val sh = Fence(base.select(
        (id.map(_ => Seq(col("__id"))).getOrElse(Seq.empty) :+
          TextHash.wordShingleHashesFromTokenHashes(col("__th"), n)
            .as("__sh")): _*))
      sh.select((id.map(_ => Seq(col("__id"))).getOrElse(Seq.empty) :+
        explode(col("__sh")).as("__g")): _*)
    }
    val corpusGrams = grams(corpus, Some(idCol), textCol)
    val benchGrams = grams(benchmark, None, benchTextCol)
      .select(col("__g")).distinct()
    val contaminated = corpusGrams.join(benchGrams, Seq("__g"), "left_semi")
      .select(col("__id")).distinct()
    corpus.join(contaminated, corpus(idCol) === contaminated("__id"),
      "left_anti")
  }
}
