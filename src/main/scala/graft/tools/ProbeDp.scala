package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Fence, Par}
import graft.ops.Dedup
import graft.sim.MinHashLSH
import graft.text.{TextAnalysis, TextHash}

/** Dev-only: stage timing of dp01's cluster extension at sf0.1. */
object ProbeDp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PART $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = TextHash.tokens(col("text"))
    val gated = docs.filter(TextAnalysis.langId(toks) =!= "und" &&
      TextAnalysis.qualityScore(toks) >= 0.42)
    val deduped = Fence(Dedup.exactDedup(gated,
      substring(col("text"), 1, 60), col("doc_id")))
    println("deduped = " + timeIt("gate+dedup")(deduped.count()))

    // stage timing via the operator's own composable pieces, so the
    // probe can never drift from what the gate actually runs
    val threshold = 0.7
    val q = 3
    val all = Fence(MinHashLSH.signatureFrame(deduped, "doc_id", "text", q))
    timeIt("signatures")(all.write.format("noop").mode("overwrite").save())
    val bands = MinHashLSH.bandFrame(all)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b")).distinct()
    val candF = Fence(cand)
    println("cand = " + timeIt("candidates")(candF.count()))
    val pairsF = Fence(MinHashLSH.verifyCandidates(candF, all, threshold))
    println("pairs = " + timeIt("two-stage verify")(pairsF.count()))
    timeIt("cc + anti-join") {
      Dedup.clusterDedup(deduped, "doc_id", pairsF, "doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
// appended probe: round counting for CC on the dp01 pairs
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.sim.MinHashLSH.nearDupPairs(docs, "doc_id", "text")
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    println("edges = " + pairs.count())
    val t0 = System.nanoTime()
    val fwd = pairs.select(col("doc_a").cast("long").as("src"),
      col("doc_b").cast("long").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint(false)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(false)
    var round = 0; var converged = false
    while (!converged) {
      round += 1
      val r0 = System.nanoTime()
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("__nl"))
        .withColumnRenamed("src", "id")
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("__nl"), col("label"))).as("label"),
          col("label").as("__prev"))
        .localCheckpoint(true)
      converged = next.filter(col("label") < col("__prev")).isEmpty
      labels = next.drop("__prev")
      println(f"round $round ${(System.nanoTime() - r0) / 1e9}%.2f s")
    }
    println(f"cc total ${(System.nanoTime() - t0) / 1e9}%.2f s, rounds = $round")
    spark.stop()
  }
}
// appended: operator-level timing with the kernel verify
object ProbeDp2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val toks = graft.text.TextHash.tokens(col("text"))
    val gated = docs.filter(
      graft.text.TextAnalysis.langId(toks) =!= "und" &&
      graft.text.TextAnalysis.qualityScore(toks) >= 0.42)
    val deduped = graft.core.Fence(graft.ops.Dedup.exactDedup(gated,
      substring(col("text"), 1, 60), col("doc_id")))
    deduped.count()
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PART $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = graft.sim.MinHashLSH.nearDupPairs(deduped, "doc_id",
      "text", threshold = 0.7).localCheckpoint(false)
    println("pairs = " + timeIt("nearDupPairs@0.7 (kernel verify)")(
      pairs.count()))
    timeIt("clusterDedup") {
      graft.ops.Dedup.clusterDedup(deduped, "doc_id", pairs,
        "doc_a", "doc_b").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
