package graft

import java.nio.file.{Files, Paths}

import graft.catalog.TableCatalog
import graft.sql.SqlTemplates

class SqlTemplatesSpec extends SparkSpec {
  import spark.implicits._

  test("readSql substitutes positional params") {
    val dir = Files.createTempDirectory("sqlt_")
    val p = dir.resolve("q.sql")
    Files.write(p, "SELECT * FROM t WHERE a = '{0}' AND b = '{1}'"
      .getBytes("UTF-8"))
    assert(SqlTemplates.readSql(p.toString, "x", "y") ==
      "SELECT * FROM t WHERE a = 'x' AND b = 'y'")
  }

  test("translate maps warehouse ids, partition scans and PARSE_DATE") {
    assert(SqlTemplates.translate(
      "SELECT * FROM `graft.main.custom_search`") ==
      "SELECT * FROM custom_search")
    assert(SqlTemplates.translate(
      "SELECT partition_id FROM [graft:main.similarity$__PARTITIONS_SUMMARY__]") ==
      "SELECT partition_id FROM similarity__partitions_summary")
    assert(SqlTemplates.translate(
      "WHERE date_extract = PARSE_DATE('%Y%m%d', '20210601')") ==
      "WHERE date_extract = to_date('20210601', 'yyyyMMdd')")
  }

  test("template path equals the DataFrame form over a catalog") {
    val wh = Files.createTempDirectory("sqlt_wh_").toString
    val cat = new TableCatalog(spark, wh)
    val df = Seq(("a", "2021-06-01", 1), ("b", "2021-06-01", 2),
      ("c", "2021-06-02", 3)).toDF("k", "date_extract", "v")
    Seq("2021-06-01", "2021-06-02").foreach(d =>
      cat.writePartition(df, "custom_search", "date_extract", d))
    SqlTemplates.registerCatalog(spark, cat, wh)

    val dir = Files.createTempDirectory("sqlt_q_")
    Files.write(dir.resolve("get_data.sql"),
      """SELECT k, v
        |FROM `graft.main.custom_search`
        |WHERE date_extract = '{0}'""".stripMargin.getBytes("UTF-8"))
    val viaTemplate = SqlTemplates
      .runFile(spark, dir.resolve("get_data.sql").toString, "2021-06-01")
      .orderBy($"k").collect().toSeq
    val viaDf = cat.read("custom_search")
      .filter($"date_extract" === "2021-06-01")
      .select($"k", $"v").orderBy($"k").collect().toSeq
    assert(viaTemplate == viaDf)

    // the legacy partitions scan sees the metadata-only listing
    val parts = SqlTemplates.run(spark,
      "SELECT partition_id FROM [graft:main.custom_search$__PARTITIONS_SUMMARY__]")
      .orderBy($"partition_id").as[String].collect().toSeq
    assert(parts == Seq("2021-06-01", "2021-06-02"))
  }
}
