package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Fence, Par}
import graft.ops.Dedup

/** Dev-only: stage timing + LSH pruning profile of dp01's cluster
  * extension. Args: [sfDir] [threshold] [bands] [rows] [--nogate] —
  * geometry defaults to the threshold-fitted one, override for A/B
  * against the frozen 4×6; `--nogate` skips the language/quality gate
  * (for ProbeScale corpora, whose letter shift defeats langId but
  * replicates the similarity structure exactly). Prints, per stage,
  * wall time and cardinality, and the pruning contract's key ratio:
  * the fraction of band candidates that survive the size prune +
  * signature-agreement floor and therefore reach the exact
  * shingle-array verify. */
object ProbeDp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.7)
    val geom = (args.lift(2), args.lift(3)) match {
      case (Some(b), Some(r)) => LshGeometry(b.toInt, r.toInt)
      case _ => MinHashLSH.geometryFor(threshold)
    }
    val noGate = args.contains("--nogate")
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
    println(s"geometry = ${geom.bands}x${geom.rows} " +
      s"(numPerm=${geom.numPerm}), threshold = $threshold")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val gated =
      if (noGate) docs else graft.text.CorpusPipeline.gate(docs)
    val deduped = Fence(Dedup.exactDedup(gated,
      graft.text.CorpusPipeline.fingerprintPrefix, col("doc_id")))
    println("deduped = " + timeIt("gate+dedup")(deduped.count()))

    // stage timing via the operator's own composable pieces, so the
    // probe can never drift from what the gate actually runs
    val q = 3
    val all = Fence(
      MinHashLSH.signatureFrame(deduped, "doc_id", "text", q, geom))
    timeIt("signatures")(all.write.format("noop").mode("overwrite").save())
    // stage cardinalities via the operator's OWN composable pieces
    // (collidedSurvivors = the fused band-join floor nearDupPairs
    // runs), so the probe cannot drift from the gated plan; the
    // raw collision count is a diagnostic-only variant with the
    // floor filters removed
    val bands = Fence(MinHashLSH.bandFrameWithSig(all, geom))
    val nCand = timeIt("candidates (diagnostic, pre-floor)") {
      bands.as("a").join(bands.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
    }
    println("cand = " + nCand)
    val floorSurv = Fence(MinHashLSH.collidedSurvivors(bands, bands,
      threshold, geom, selfJoin = true))
    val nFloor = timeIt("fused band join + floor")(floorSurv.count())
    println(f"passing signature floor = $nFloor " +
      f"(${100.0 * nFloor / math.max(1L, nCand)}%.1f%% of band candidates)")
    val nSurv =
      if (threshold < MinHashLSH.SampleCutoff) {
        val n = timeIt("bottom-k sample prune") {
          SetVerify.samplePrune(floorSurv,
            MinHashLSH.bottomKFrame(all), threshold - 0.05,
            MinHashLSH.BottomK).count()
        }
        println(f"passing sample prune = $n " +
          f"(${100.0 * n / math.max(1L, nCand)}%.1f%% of band candidates)")
        n
      } else nFloor
    println(f"reaching exact verify = $nSurv " +
      f"(${100.0 * nSurv / math.max(1L, nCand)}%.1f%% of band candidates)")

    // the real operator end-to-end (fused band-join floor), not the
    // instrumented stage decomposition above
    val pairsF = Fence(
      MinHashLSH.nearDupPairs(deduped, "doc_id", "text", q, threshold))
    println("pairs = " + timeIt("nearDupPairs end-to-end")(pairsF.count()))
    timeIt("cc + anti-join") {
      Dedup.clusterDedup(deduped, "doc_id", pairsF, "doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
