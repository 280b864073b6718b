package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.MinHashLSH

/** Dev-only: measure the per-corpus MinHash recall variance that
  * doc-frequency-weighted shingle filtering is meant to narrow
  * (COVERAGE "Known limits": structurally identical corpora returned
  * 404 vs 267 verified pairs because which common shingle wins a
  * permutation's argmin is corpus-globally correlated).
  *
  * Method: the [[ProbeScale]] replica construction — per-replica
  * whole-alphabet Caesar shifts of the documents table, an injective
  * character map under which every pair's shingle-set relations
  * (sizes, intersections, Jaccard) replicate EXACTLY — so each
  * replica is the same similarity structure drawn with different
  * shingle identities. A decorrelated detector returns (near-)equal
  * pair counts on every replica; spread across replicas IS the
  * recall variance. Runs `nearDupPairs` plain and df-weighted on each
  * replica separately and prints both count lists with min/max/mean
  * and relative spread.
  *
  * Usage: runMain graft.tools.ProbeDf [sfDir] [reps] [maxDfFrac] [t]
  */
object ProbeDf {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val frac = args.lift(2).map(_.toDouble).getOrElse(0.5)
    val threshold = args.lift(3).map(_.toDouble).getOrElse(0.8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    def replica(k: Int): DataFrame =
      if (k == 0) docs
      else {
        val shift = 1 + (k - 1) % 25
        val sl = lower.drop(shift) + lower.take(shift)
        docs.withColumn("text",
          translate(col("text"), lower + lower.toUpperCase,
            sl + sl.toUpperCase))
      }

    val counts = (0 until reps).map { k =>
      val d = replica(k)
      val plain = MinHashLSH.nearDupPairs(d, "doc_id", "text",
        threshold = threshold).count()
      val weighted = MinHashLSH.nearDupPairs(d, "doc_id", "text",
        threshold = threshold, maxDfFrac = Some(frac)).count()
      println(s"replica $k: plain=$plain weighted=$weighted")
      (plain, weighted)
    }
    def stats(name: String, xs: Seq[Long]): Unit = {
      val mean = xs.sum.toDouble / xs.size
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
      println(f"$name: n=${xs.size} min=${xs.min} max=${xs.max} " +
        f"mean=$mean%.1f sd=$sd%.1f rel-spread=${(xs.max - xs.min) / mean}%.3f")
    }
    stats("plain   ", counts.map(_._1))
    stats("weighted", counts.map(_._2))
    spark.stop()
  }
}
