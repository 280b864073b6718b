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
    val sig = Fence(sh.select(col("id"),
      array((0 until MinHashLSH.NumPerm).map(j =>
        MinHashLSH.minhash(col("sh"), j)): _*).as("sig")))
    def bandKey(b: Int) = concat_ws("_",
      (0 until MinHashLSH.Rows).map(r =>
        element_at(col("sig"),
          b * MinHashLSH.Rows + r + 1).cast("string")): _*)
    val bands = Par.fanOut(sig.select(col("id"),
      posexplode(array((0 until MinHashLSH.Bands).map(bandKey): _*))
        .as(Seq("band_idx", "band_key"))))
    timeIt("bands")(bands.write.format("noop").mode("overwrite").save())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    println("cand = " + timeIt("cand")(cand.count()))
    val sig2 = Fence(sh.select(col("id"), size(col("sh")).as("n"),
      array((0 until MinHashLSH.NumPerm).map(j =>
        MinHashLSH.minhash(col("sh"), j)): _*).as("sig")))
    timeIt("sig2")(sig2.write.format("noop").mode("overwrite").save())
    val ga = sig2.select(col("id").as("doc_a"), col("n").as("n_a"),
      col("sig").as("sig_a"))
    val gb = sig2.select(col("id").as("doc_b"), col("n").as("n_b"),
      col("sig").as("sig_b"))
    val agree = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
    val surv = cand.join(ga, Seq("doc_a")).join(gb, Seq("doc_b"))
      .filter(lit(10) * least(col("n_a"), col("n_b")) >=
        lit(8) * greatest(col("n_a"), col("n_b")))
      .filter(agree >= MinHashLSH.minAgree(0.8))
      .select(col("doc_a"), col("doc_b"))
    println("surv = " + timeIt("surv")(surv.count()))
    val sa = sh.select(col("id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    val fin = surv.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("jacc", inter.cast("double") / union)
      .filter(col("jacc") >= 0.8)
    println("fin = " + timeIt("fin")(fin.count()))
    val fin2 = Par.fanOut(surv).join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("jacc", inter.cast("double") / union)
      .filter(col("jacc") >= 0.8)
    fin2.explain("formatted")
    println("fin2 = " + timeIt("fin2")(fin2.count()))
    spark.stop()
  }
}
