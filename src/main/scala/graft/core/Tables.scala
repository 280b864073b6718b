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

  /** How a file's `ts` column must be decoded — see [[tsEncodingOf]]. */
  private[graft] sealed trait TsEncoding
  private[graft] object TsEncoding {
    /** Annotated micros/millis/INT96 — Spark reads it natively. */
    case object Native extends TsEncoding
    /** TIMESTAMP(NANOS) annotation, or a bare INT64 whose value
      * magnitude says epoch-nanos. */
    case object RawNanos extends TsEncoding
    /** Bare INT64 whose magnitude says epoch-micros. */
    case object RawMicros extends TsEncoding
    /** Bare INT64 whose magnitude says epoch-millis. */
    case object RawMillis extends TsEncoding
  }

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects — and TIMESTAMP(MICROS), depending
    * on the producer. A loader must read whatever legal encoding it is
    * pointed at, so sniff one file's footer for the column's logical type
    * annotation and pick the decode path from it, instead of hard-coding
    * either physical layout (the hard-coded-nanos version silently
    * compressed a MICROS corpus 1000x — round-8 postmortem).
    *
    *  - Native (annotated MICROS / MILLIS / INT96): plain
    *    `spark.read.parquet`; the file is NTZ (isAdjustedToUTC=false) so
    *    cast to TimestampType — an identity on the stored micros under
    *    the UTC session this engine pins.
    *  - Raw paths (NANOS annotation, or a bare unannotated INT64):
    *    declared `ts LONG` schema, then rescale by the unit the footer
    *    probe determined; nanos truncate to micros (exactly what
    *    DuckDB's `ts::TIMESTAMP` does, keeping the oracle comparable).
    *    The declared schema skips footer inference and the per-read
    *    `nanosAsLong` option stays in this relation's hadoop conf — no
    *    shared-session parquet behavior is mutated. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    def raw = spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(path)
    import org.apache.spark.sql.functions.expr
    tsEncodingOf(spark, path) match {
      case TsEncoding.RawNanos =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TsEncoding.RawMicros =>
        raw.withColumn("ts", expr("timestamp_micros(ts)"))
      case TsEncoding.RawMillis =>
        raw.withColumn("ts", expr("timestamp_millis(ts)"))
      case TsEncoding.Native =>
        spark.read.parquet(path)
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Compatibility shim for the probe tooling/specs: does the file take
    * the legacy-nanos decode path? */
  private[graft] def tsStoredAsNanos(spark: SparkSession,
                                     path: String): Boolean =
    tsEncodingOf(spark, path) == TsEncoding.RawNanos

  /** One-footer probe for the `ts` decode path. Reads a single footer of
    * the first data file, so the probe cost is O(1) regardless of table
    * size; at cluster scale this is one metadata round-trip, not a scan.
    *
    * A bare INT64 with no logical-type annotation is AMBIGUOUS — the
    * nanos producer writes that shape, but so would a producer dumping
    * plain epoch micros/millis, and guessing nanos silently compresses
    * a micros corpus 1000× (the round-8 failure class, flagged again by
    * ADVICE r9). The footer's column STATISTICS disambiguate for free:
    * epoch-nanos for any plausible year sits near 1.6e18, micros near
    * 1.6e15, millis near 1.6e12 — three orders of magnitude apart, so
    * decade-wide bands around each cannot overlap. An unannotated
    * column whose max lands outside every band (or a footer with no
    * stats) fails LOUDLY here, naming the observed magnitude, instead
    * of decoding into the wrong century. */
  private[graft] def tsEncodingOf(spark: SparkSession,
                                  path: String): TsEncoding = {
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
      if (!schema.containsField("ts")) TsEncoding.Native
      else {
        val prim = schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
        val isInt64 = prim.getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
        prim.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation =>
            if (isInt64 && t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS)
              TsEncoding.RawNanos
            else TsEncoding.Native
          case null if isInt64 =>
            // unannotated: decide the unit from the row-group max stat
            import scala.jdk.CollectionConverters._
            val maxOpt = reader.getFooter.getBlocks.asScala.toSeq
              .flatMap { b =>
                b.getColumns.asScala
                  .find(_.getPath.toDotString == "ts")
                  .flatMap(c => Option(c.getStatistics))
                  .filter(s => !s.isEmpty && s.hasNonNullValue)
                  .map(_.genericGetMax match {
                    case l: java.lang.Long => l.longValue()
                    case other => other.toString.toLong
                  })
              }.maxOption
            maxOpt match {
              // 1971..~2200 in each unit; the bands are separated by
              // ~1000x so no legal corpus is near a boundary
              case Some(v) if v >= 3e16.toLong && v <= 8e18.toLong =>
                TsEncoding.RawNanos
              case Some(v) if v >= 3e13.toLong && v < 8e15.toLong =>
                TsEncoding.RawMicros
              case Some(v) if v >= 3e10.toLong && v < 8e12.toLong =>
                TsEncoding.RawMillis
              case Some(v) => throw new IllegalArgumentException(
                s"events.ts at $path is an unannotated INT64 whose max " +
                  s"value $v sits outside every plausible epoch band " +
                  "(nanos/micros/millis, years ~1971-2200) — refusing " +
                  "to guess a unit; annotate the column or fix the " +
                  "producer")
              case None => throw new IllegalArgumentException(
                s"events.ts at $path is an unannotated INT64 and the " +
                  "footer carries no column statistics to infer the " +
                  "unit from — refusing to guess; annotate the column " +
                  "or write stats")
            }
          case _ => TsEncoding.Native
        }
      }
    } finally reader.close()
  }

  /** Convenience: all standard tables as a name->DataFrame map (lazy scans). */
  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, sfDir, n)).toMap
}
