package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: derive a `factor`× scale-probe corpus from an existing sf
  * dir, for BenchOne scaling datapoints on the cluster-family queries
  * (dd03, dd07, dp01, j05). NOT gate input — the driver's testdata
  * stays the only correctness source.
  *
  * Documents replicate with disjoint id ranges and a per-replica
  * Caesar shift of EVERY letter. A whole-alphabet shift is an
  * injective character map, and the base-31 char-trigram hash is
  * injective on letter/space trigrams (a ±25 difference in one
  * position cannot cancel a 31² term), so within a replica every
  * pair's shingle-set relations — sizes, intersections, Jaccard — are
  * EXACTLY the source corpus's, while across replicas only
  * digit/space trigrams survive (J ≈ 0) — ten independent copies of
  * the real similarity structure.
  *
  * The cost: shifted text defeats the language gate (every marker
  * word shifts away → langId 'und'), so GATED queries (dp01) admit
  * only replica 0 — their 10× datapoint measures the scan/gate/dedup
  * side at 10× and the cluster stages at 1×. The ungated operators
  * (dd03, dd07, and ProbeDp --nogate at any threshold) get the true
  * 10× similarity workload. Three gate-preserving designs were tried
  * and rejected with measurements — each broke the J structure or the
  * gate population: (1) shifting only ≥6-char tokens breaks shingles
  * shared across word contexts ("wat" from both "water" and
  * "waterfall"): corpus J deflates ~0.03–0.05 and 85% of the marginal
  * [0.70,0.75) true-pair band vanishes; (2) full shift + appended
  * marker preamble admits originally-rejected docs (1500 → 3964
  * gated) and its ~25 uniform shared shingles lift the 50k-pair
  * [0.65,0.70) shoulder over the threshold (pairs 314 → 3538);
  * (3) shifting everything except the 26 marker words replicates the
  * gate bit-exactly (1500 gated) but marker-boundary trigrams ("a b"
  * from "a big" vs "data batch") shift inconsistently — measured
  * ≈0.032 J deflation on marginal pairs, collapsing true pairs
  * 314 → 16. In this template corpus no text perturbation preserves
  * both the gate population and the threshold-straddling J structure;
  * the split probe (gated scan at 10× / ungated similarity at 10×) is
  * the honest decomposition.
  *
  * Customers replicate with per-replica digit rotation in c_name
  * (injective: distinct keys stay distinct, name shapes unchanged);
  * supplier — j05's bounded lookup side — is copied once, matching
  * the operator's contract at scale.
  *
  * Embeddings replicate under per-replica SIGNED DIMENSION
  * PERMUTATIONS (rotate dimensions by k, negate a k-dependent
  * subset): an orthogonal map, so every within-replica cosine — and
  * therefore the near-dup/top-k structure — replicates EXACTLY,
  * while cross-replica cosines scatter like random pairs.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val docs = spark.read.parquet(s"$src/documents.parquet")
    def docRep(k: Int): DataFrame =
      if (k == 0) docs
      else {
        val shift = 1 + (k - 1) % 25 // never the identity map
        val sl = lower.drop(shift) + lower.take(shift)
        docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
          .withColumn("text",
            translate(col("text"), lower + upper, sl + sl.toUpperCase))
      }
    (0 until factor).map(docRep).reduce(_ unionByName _)
      .repartition(cpus.toInt).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val digits = "0123456789"
    val cust = spark.read.parquet(s"$src/customer.parquet")
    def custRep(k: Int): DataFrame =
      if (k == 0) cust
      else cust
        .withColumn("c_custkey", col("c_custkey") + lit(k * 10000000L))
        .withColumn("c_name", translate(col("c_name"), digits,
          digits.drop(k % 10) + digits.take(k % 10)))
    (0 until factor).map(custRep).reduce(_ unionByName _)
      .repartition(cpus.toInt).write.mode("overwrite")
      .parquet(s"$out/customer.parquet")

    spark.read.parquet(s"$src/supplier.parquet").write.mode("overwrite")
      .parquet(s"$out/supplier.parquet")

    // events replicate by user/event id offset (timestamps untouched):
    // per-user session and as-of structure replicates exactly, the
    // window/watermark key space grows 10×. Read and write at the raw
    // INT64-nanos level (the source is TIMESTAMP(NANOS), which Spark's
    // inference rejects; Tables.loadEvents declares ts LONG the same
    // way, so the replica stays loadable through the same path)
    val ev = spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(s"$src/events.parquet")
    def evRep(k: Int): DataFrame =
      if (k == 0) ev
      else ev.withColumn("event_id", col("event_id") + lit(k * 10000000L))
        .withColumn("user_id", col("user_id") + lit(k * 10000000L))
    (0 until factor).map(evRep).reduce(_ unionByName _)
      .repartition(cpus.toInt).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    def embRep(k: Int): DataFrame =
      if (k == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => {
            // signed permutation: dimension i takes the source value
            // from dimension (i + k) mod dim, negated when
            // (i + k) % 3 == 0 — orthogonal, so all dot products and
            // norms within a replica are exactly preserved
            val src = element_at(col("embedding"),
              ((i + lit(k)) % size(col("embedding"))) + 1)
            when((i + lit(k)) % 3 === 0, -src).otherwise(src)
          }))
    (0 until factor).map(embRep).reduce(_ unionByName _)
      .repartition(cpus.toInt).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    println(s"wrote ${factor}x probe corpus to $out")
    spark.stop()
  }
}
