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
