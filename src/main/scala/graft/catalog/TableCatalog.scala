package graft.catalog

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Path-based table catalog over a parquet warehouse directory — the
  * Spark mirror of the reference's gitignored BigQuery layer (SURVEY
  * §3.1: write / exist / create_from_schema_partition_table /
  * write_partition_table, reconstructed from call sites like
  * custom_search_extraction.py:41-42,151,215-218).
  *
  * Partitioned tables use one `field=value` directory per partition;
  * [[writePartition]] overwrites exactly that directory (dynamic
  * partition overwrite), making the reference's partition-at-a-time
  * daily loop idempotent by construction. At cluster scale the same
  * layout is what `insertInto` with dynamic partitionOverwriteMode
  * produces — partition pruning on `field` filters comes free.
  */
class TableCatalog(spark: SparkSession, warehouse: String) {

  def tablePath(table: String): String = s"$warehouse/$table"

  /** K3's exists-check (custom_search_extraction.py:151). */
  def tableExists(table: String): Boolean =
    new File(tablePath(table)).exists()

  /** K1: full-table overwrite write (process_open_data.py:250-258). */
  def writeFull(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(tablePath(table))

  /** K3: write only when the table is absent
    * (custom_search_extraction.py:147-155). Returns true if written. */
  def writeIfAbsent(df: DataFrame, table: String): Boolean =
    if (tableExists(table)) false
    else { writeFull(df, table); true }

  /** Create an empty partitioned table from a registry schema (K2's
    * create_from_schema_partition_table). The schema anchor is one empty
    * footer-bearing parquet file under `_schema/` — an underscore prefix
    * is invisible to Spark partition discovery, so a fresh table lists
    * zero partitions and never shows a phantom partition value (the
    * previous `_schema_placeholder=true` directory did). */
  def createFromSchema(table: String, schema: StructType): Unit = {
    if (!tableExists(table)) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .repartition(1) // one 0-row file that still carries the schema
        .write.mode("overwrite")
        .parquet(tablePath(table) + "/_schema")
    }
  }

  /** K2: idempotent single-partition overwrite
    * (custom_search_extraction.py:215-218): rewriting the same partition
    * value replaces it, other partitions untouched. */
  def writePartition(df: DataFrame, table: String, partField: String,
                     partValue: String): Unit =
    df.filter(col(partField) === partValue).drop(partField)
      .write.mode("overwrite")
      .parquet(s"${tablePath(table)}/$partField=$partValue")

  /** [[writePartition]] with a second, nested partition level: the
    * replaced `partField=value` directory is itself laid out as
    * `subField=v/` directories, so equality/IN filters on `subField`
    * prune sub-directories across every outer partition — the
    * band-key-prefix layout [[graft.streaming.CorpusStream]] uses for
    * its sketch-band state. */
  def writeSubPartitioned(df: DataFrame, table: String, partField: String,
                          partValue: String, subField: String): Unit =
    df.filter(col(partField) === partValue).drop(partField)
      .write.mode("overwrite").partitionBy(subField)
      .parquet(s"${tablePath(table)}/$partField=$partValue")

  /** Bulk form of [[writePartition]]: all partitions in one job via the
    * native partitioned writer (same field=value layout, full
    * overwrite). Use for backfills; the single-partition form is the
    * daily incremental path. */
  def writePartitioned(df: DataFrame, table: String,
                       partField: String): Unit =
    df.write.mode("overwrite").partitionBy(partField)
      .parquet(tablePath(table))

  /** Read a table; partition columns are recovered from directory names.
    * A fresh schema-only table (no partitions written yet) reads as an
    * empty frame with the declared schema from the `_schema` anchor. */
  def read(table: String): DataFrame = {
    val hasData = Option(new File(tablePath(table)).listFiles())
      .getOrElse(Array.empty)
      .exists(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    if (hasData)
      spark.read.option("basePath", tablePath(table))
        .parquet(tablePath(table))
    else
      spark.read.parquet(tablePath(table) + "/_schema")
  }

  /** Read an explicit subset of a table's partition directories,
    * partition columns recovered relative to the table root — the
    * pruned-LISTING companion to [[read]] for callers that enumerate
    * their colliding partitions themselves (a table-root read lists
    * every file of a growing table even when partition pruning skips
    * the data). */
  def readPaths(table: String, paths: Seq[String]): DataFrame =
    spark.read.option("basePath", tablePath(table)).parquet(paths: _*)

  /** Remove one partition directory — the cleanup half of a compaction
    * pass ([[graft.streaming.CorpusStream.compactState]]): the merged
    * target partition is written first, sources deleted after, so a
    * crash between the two leaves a recoverable (target-superset)
    * state, never a lossy one. */
  def deletePartition(table: String, partField: String,
                      partValue: String): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      f.delete()
    }
    rm(new File(s"${tablePath(table)}/$partField=$partValue"))
  }

  /** S7: partition-metadata scan (the `$__PARTITIONS_SUMMARY__` scans at
    * custom_search_extraction.py:53-57) — directory listing only, no
    * data read. */
  def listPartitions(table: String, partField: String): Seq[String] = {
    val dir = new File(tablePath(table))
    val prefix = s"$partField="
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName.stripPrefix(prefix))
      .sorted.toSeq
  }
}
