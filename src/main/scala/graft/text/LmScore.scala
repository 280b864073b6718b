package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model fluency scoring — the
  * perplexity-proxy quality signal of CCNet-style pipelines
  * (arXiv:1911.00359 trains a KenLM; this is the self-trained
  * distributed counterpart: the corpus IS the model). A document
  * whose word transitions are common corpus-wide scores high; word
  * salad and boilerplate-noise score low.
  *
  * Numerics are engine-exact by construction, so the DuckDB oracle
  * gates bit-identical values: every per-bigram probability is
  * integer-scaled (`floor(1e6·c12/c1 + 0.5)` — counts are exact
  * doubles below 2^53 and *,/ are IEEE-deterministic), per-doc
  * aggregation sums INTEGERS (commutative under Spark's partial
  * aggregation), and the final fluency is two fixed-order divisions.
  * No log/exp — libm differs across engines; a monotone transform of
  * the mean scaled probability ranks identically anyway.
  *
  * Scale shape: one explode (bigram instances, linear in tokens), one
  * map-side-combined count per distinct bigram, a context aggregate
  * over the COUNTS table (not the instances), and one shuffle join of
  * instances against the model keyed on the bigram string — the
  * canonical distributed LM-count topology. Nothing is collected; the
  * model never needs to fit anywhere.
  */
object LmScore {

  private val Scale = 1000000.0

  /** Per-document bigram fluency over `docs`: (id, n_bigrams,
    * fluency), where fluency = mean over the doc's bigrams of the
    * integer-scaled corpus transition probability c12/c1 (c12 = corpus
    * count of the bigram, c1 = corpus count of its left word as a
    * bigram context). Documents with fewer than two tokens have
    * n_bigrams = 0 and a null fluency. */
  def bigramFluency(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val toks = TextHash.tokens(col(textCol))
    val inst = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.bigrams(toks)).as("bg"))
    val pair = inst.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val ctx = pair
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val model = pair
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, Seq("w1"))
      .select(col("bg"),
        floor(lit(Scale) * col("c12").cast("double")
            / col("c1").cast("double") + lit(0.5))
          .cast("long").as("p6"))
    val perDoc = inst.join(model, Seq("bg"))
      .groupBy(col("id"))
      .agg(sum(col("p6")).as("fl6"),
        count(lit(1)).cast("int").as("nb"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("nb"), lit(0)).as("n_bigrams"),
        (col("fl6").cast("double") / lit(Scale)
          / col("nb").cast("double")).as("fluency"))
  }
}
