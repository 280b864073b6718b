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
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects; read it as raw nanos and truncate to a microsecond
    * timestamp (exactly what DuckDB's `ts::TIMESTAMP` does, keeping the
    * oracle comparable).
    *
    * Scoped, not session-global: the declared schema (ts LONG) skips
    * footer schema inference — the one path that reads the legacy-nanos
    * flag from the session conf — and the per-read option lands in this
    * relation's hadoop conf for the execution-time schema converter. No
    * shared-session parquet behavior is mutated. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }

  /** Convenience: all standard tables as a name->DataFrame map (lazy scans). */
  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, sfDir, n)).toMap
}
