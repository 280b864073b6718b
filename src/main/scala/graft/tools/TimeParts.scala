package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Fence, Par}
import graft.sim.MinHashLSH
import graft.text.TextHash

/** Dev-only: stage-wise timing of the MinHash-LSH pipeline. */
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
    val sh = Fence(docs
      .select(col("doc_id").as("id"),
        TextHash.charCodes(col("text")).as("__codes"))
      .select(col("id"),
        TextHash.shingleHashesFromCodes(col("__codes"), 3).as("sh")))
    timeIt("sh")(sh.write.format("noop").mode("overwrite").save())
    val bands = Par.fanOut(sh.select(col("id"),
      posexplode(array((0 until MinHashLSH.Bands).map(b =>
        MinHashLSH.bandKey(col("sh"), b)): _*))
        .as(Seq("band_idx", "band_key"))))
    timeIt("bands")(bands.write.format("noop").mode("overwrite").save())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    println("cand = " + timeIt("cand")(cand.count()))
    spark.stop()
  }
}
