package graft.sql

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.TableCatalog

/** SQL-template entry point (SURVEY §2.1 S5/S6 fidelity): the
  * reference's query surface is nine `.sql` template files with
  * positional `{i}` substitution, loaded by `read_sql` and executed
  * against the warehouse (`/root/reference/sql/get_products_id.sql:1-3`
  * consumed at `update_open_data.py:59-61`). This module lets those
  * template assets run unmodified on Spark: read + substitute, translate
  * the template dialect's warehouse-isms to Spark SQL, and execute over
  * temp views of catalog tables.
  *
  * Translation covers exactly the constructs the reference's template
  * corpus uses — deliberately narrow, documented, and tested rather
  * than a general dialect translator:
  *   - `` `project.dataset.table` `` three-part ids → the bare table
  *     name, resolved against registered temp views;
  *   - legacy `[project:dataset.table$__PARTITIONS_SUMMARY__]` partition
  *     scans → a `table__partitions_summary` view, registered by
  *     [[registerCatalog]] from the catalog's *directory listing* (no
  *     data read — same S7 metadata-only contract as
  *     `TableCatalog.listPartitions`);
  *   - `PARSE_DATE('%Y%m%d', x)` → `to_date(x, 'yyyyMMdd')` (strftime
  *     codes mapped to Spark datetime patterns).
  *
  * Scale: `spark.sql` over a temp view is the same Catalyst plan as the
  * DataFrame form — pushdown, pruning and AQE apply identically; the
  * gate asserts byte-identical results between the two paths.
  */
object SqlTemplates {

  private def substitute(raw: String, params: Seq[String]): String =
    params.zipWithIndex.foldLeft(raw) { case (s, (p, i)) =>
      s.replace(s"{$i}", p)
    }

  /** The reference's `read_sql(path, p0, p1, p2)`: load the template and
    * substitute positional `{i}` markers. */
  def readSql(path: String, params: String*): String = {
    val raw = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8)
    substitute(raw, params)
  }

  /** Text of one of the reference's template assets, by file name.
    * Prefers the live reference checkout when one is present (root
    * overridable via `GRAFT_REFERENCE_ROOT`, default `/root/reference`);
    * falls back to the byte-identical vendored copy under
    * `resources/graft/reference_sql/`, so gates built on the corpus run
    * on machines without the reference tree. SqlTemplatesSpec asserts
    * fixture ≡ reference byte-for-byte whenever both exist. */
  def referenceTemplate(
      name: String,
      root: String =
        sys.env.getOrElse("GRAFT_REFERENCE_ROOT", "/root/reference"))
      : String = {
    val ref = Paths.get(root, "sql", name)
    if (Files.isReadable(ref))
      new String(Files.readAllBytes(ref), StandardCharsets.UTF_8)
    else {
      val in = getClass.getClassLoader
        .getResourceAsStream(s"graft/reference_sql/$name")
      require(in != null, s"no vendored copy of reference template $name")
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
  }

  /** Run a reference template asset by name (see [[referenceTemplate]]):
    * substitute, translate, execute. */
  def runReferenceTemplate(spark: SparkSession, name: String,
                           params: String*): DataFrame =
    run(spark, substitute(referenceTemplate(name), params))

  private val backtickId = "`[A-Za-z0-9_.-]+`".r
  private val partitionsSummary =
    """\[[A-Za-z0-9_-]+:[A-Za-z0-9_]+\.([A-Za-z0-9_]+)\$__PARTITIONS_SUMMARY__\]""".r
  // PARSE_DATE(fmt, expr): expr is an unnested argument in the corpus
  // (a quoted literal or column), so [^)]+ is sufficient and honest.
  private val parseDate =
    """PARSE_DATE\(\s*'([^']+)'\s*,\s*([^)]+)\)""".r

  private val strftimeToSpark = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")

  /** Template dialect → Spark SQL (the three rewrites above). */
  def translate(sql: String): String = {
    val noPartSummary = partitionsSummary.replaceAllIn(sql,
      m => s"${m.group(1)}__partitions_summary")
    val noBackticks = backtickId.replaceAllIn(noPartSummary, m => {
      val parts = m.matched.stripPrefix("`").stripSuffix("`").split('.')
      parts.last
    })
    parseDate.replaceAllIn(noBackticks, m => {
      val fmt = strftimeToSpark.foldLeft(m.group(1)) {
        case (s, (a, b)) => s.replace(a, b)
      }
      s"to_date(${m.group(2).trim}, '$fmt')" // arg order flips
    })
  }

  /** Register one table as a temp view for template queries. */
  def registerTable(spark: SparkSession, name: String,
                    df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Register every catalog table as a temp view, plus a
    * `<t>__partitions_summary(partition_id)` view per partitioned table
    * backed by the metadata-only directory listing. */
  def registerCatalog(spark: SparkSession, catalog: TableCatalog,
                      warehouse: String): Unit = {
    import spark.implicits._
    val tables = Option(new File(warehouse).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
    tables.foreach { t =>
      registerTable(spark, t, catalog.read(t))
      val partFields = Option(new File(s"$warehouse/$t").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("="))
        .map(_.getName.takeWhile(_ != '=')).distinct
      partFields.foreach { pf =>
        catalog.listPartitions(t, pf).toDF("partition_id")
          .createOrReplaceTempView(s"${t}__partitions_summary")
      }
    }
  }

  /** Execute a (substituted) template: translate, then `spark.sql`. */
  def run(spark: SparkSession, sql: String): DataFrame =
    spark.sql(translate(sql))

  /** One-shot convenience mirroring the reference call shape:
    * `execute_sql(read_sql(path, params...))`. */
  def runFile(spark: SparkSession, path: String,
              params: String*): DataFrame =
    run(spark, readSql(path, params: _*))
}
