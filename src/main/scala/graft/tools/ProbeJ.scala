package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Fence
import graft.ops.Dedup


/** Dev-only: exact all-pairs Jaccard histogram of dp01's deduped corpus
  * — the ground truth the LSH geometry fit is judged against. Also
  * reports, per 0.05-wide J bin, how many pairs the current geometry's
  * banding + floor would pass, so geometry candidates can be compared
  * analytically before re-running the pipeline. */
object ProbeJ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val gated = graft.text.CorpusPipeline.gate(docs)
    val deduped = Fence(Dedup.exactDedup(gated,
      graft.text.CorpusPipeline.fingerprintPrefix, col("doc_id")))
    val geom = LshGeometry(1, 1) // signatures irrelevant here; q-grams only
    val all = Fence(
      MinHashLSH.signatureFrame(deduped, "doc_id", "text", 3, geom))
    val ids = all.select(col("id"))
    val cand = ids.as("a").select(col("a.id").as("doc_a"))
      .crossJoin(ids.as("b").select(col("b.id").as("doc_b")))
      .filter(col("doc_a") < col("doc_b"))
    val pairs = SetVerify.jaccard(
      cand, all.select(col("id"), col("sh")), 0.0)
    val hist = pairs.groupBy(floor(col("jacc") * 20).as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bin")).collect()
    println("J histogram (bin = floor(J*20), i.e. 0.05-wide):")
    hist.foreach(r => println(f"  J in [${r.getLong(0) * 0.05}%.2f, " +
      f"${r.getLong(0) * 0.05 + 0.05}%.2f): ${r.getLong(1)}"))
    spark.stop()
  }
}
