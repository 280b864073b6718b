package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.streaming.CorpusStream

/** Dev-only: per-batch wall time of the dp03 gate's exact body (the
  * corpus split into 3 consecutive id-range batches through
  * `CorpusStream.processBatch` with compactEvery=2) — for attributing
  * the gate's cost between the three pipeline passes, the state
  * compactions they trigger, and the final output read.
  * Args: [sfDir] [compactEvery]. */
object ProbeDp03 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val compactEvery = args.lift(1).map(_.toInt).getOrElse(2)
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
      .select(col("doc_id"), col("text"), col("lang"))
    val b = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val lo = b.getLong(0); val hi = b.getLong(1)
    val cut1 = lo + (hi - lo) / 3; val cut2 = lo + 2 * ((hi - lo) / 3)
    val wh = java.nio.file.Files
      .createTempDirectory("probe_dp03_").toString
    val cat = new TableCatalog(spark, wh)
    Seq(docs.filter(col("doc_id") <= cut1),
        docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
        docs.filter(col("doc_id") > cut2))
      .zipWithIndex.foreach { case (batch, i) =>
        timeIt(s"batch$i") {
          CorpusStream.processBatch(batch, cat, "p_seen", "p_out",
            i.toLong, compactEvery = compactEvery)
        }
      }
    timeIt("read_out") {
      cat.read("p_out").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
