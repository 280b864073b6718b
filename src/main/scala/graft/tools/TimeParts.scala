package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextHash

/** Dev-only: isolate the Generate/explode slowdown. */
object TimeParts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PART $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs
      .select(col("doc_id").as("id"),
        TextHash.tokenHashes(col("text")).as("__th"))
      .select(col("id"),
        TextHash.wordShingleHashesFromTokenHashes(col("__th"), 3).as("sh"))
    timeIt("A-sh-plain")(sh.write.format("noop").mode("overwrite").save())
    timeIt("B-sh-size")(sh.select(col("id"), size(col("sh")))
      .write.format("noop").mode("overwrite").save())
    timeIt("C-sh-explode")(sh.select(col("id"), explode(col("sh")))
      .write.format("noop").mode("overwrite").save())
    timeIt("D-tokenhash-explode")(
      docs.select(col("doc_id"), explode(TextHash.tokenHashes(col("text"))))
        .write.format("noop").mode("overwrite").save())
    timeIt("E-split-explode")(
      docs.select(col("doc_id"), explode(split(col("text"), " ")))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
