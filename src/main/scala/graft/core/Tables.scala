package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over a driver-provided scale-factor directory
  * (`/root/testdata/sf*`). Mirrors the reference's "everything is a table"
  * model (SURVEY §1.1; reference delegates storage to BigQuery tables —
  * e.g. /root/reference/get_similarity.py:163-177 `SELECT * FROM` scans).
  *
  * Reads are plain `spark.read.parquet`, so Catalyst column pruning and
  * filter pushdown reach the scan for free; at cluster scale the same
  * call works on a directory of many files / partitions.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Convenience: all standard tables as a name->DataFrame map (lazy scans). */
  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, sfDir, n)).toMap
}
