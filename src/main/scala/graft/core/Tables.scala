package graft.core

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.TimestampType

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

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects — and TIMESTAMP(MICROS), depending
    * on the producer. A loader must read whatever legal encoding it is
    * pointed at, so sniff one file's footer for the column's logical type
    * annotation and pick the decode path from it, instead of hard-coding
    * either physical layout (the hard-coded-nanos version silently
    * compressed a MICROS corpus 1000x — round-8 postmortem).
    *
    *  - MICROS / MILLIS: plain `spark.read.parquet`; the file is NTZ
    *    (isAdjustedToUTC=false) so cast to TimestampType — an identity on
    *    the stored micros under the UTC session this engine pins.
    *  - NANOS, or a bare INT64 with no annotation: declared `ts LONG`
    *    schema + the scoped legacy `nanosAsLong` read option, then
    *    truncate to micros (exactly what DuckDB's `ts::TIMESTAMP` does,
    *    keeping the oracle comparable). The declared schema skips footer
    *    inference and the per-read option stays in this relation's hadoop
    *    conf — no shared-session parquet behavior is mutated. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    if (tsStoredAsNanos(spark, path)) {
      spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, " +
          "event_type STRING, value DOUBLE, props STRING")
        .option("spark.sql.legacy.parquet.nanosAsLong", "true")
        .parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(path)
        .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** One-footer probe: true iff the `ts` column needs the legacy-nanos
    * shim (TIMESTAMP(NANOS) annotation, or a raw INT64 with no logical
    * type — the shape the nanos producer wrote). Reads a single footer of
    * the first data file, so the probe cost is O(1) regardless of table
    * size; at cluster scale this is one metadata round-trip, not a scan. */
  private[graft] def tsStoredAsNanos(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(root).isDirectory) {
        val parts = fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
        require(parts.nonEmpty, s"no parquet data files under $path")
        parts.minBy(_.getName.toString)
      } else root
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField("ts")) false
      else {
        val prim = schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
        val isInt64 = prim.getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
        prim.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation =>
            isInt64 && t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          // bare INT64 with no annotation: the raw-nanos producer shape.
          // Anything else (INT96, annotated micros/millis) Spark reads
          // natively — plain path.
          case null => isInt64
          case _ => false
        }
      }
    } finally reader.close()
  }

  /** Convenience: all standard tables as a name->DataFrame map (lazy scans). */
  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, sfDir, n)).toMap
}
