package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.io.CsvSink
import graft.io.Connectors.{Geocoder, Notifier, SheetIO}
import graft.ops.{CondOps, Dedup, Enrich}

/** The human-validation round-trip (SURVEY §3.3, last two scripts):
  * assos_with_similarity_not_validated_yet_to_spreadsheets.py pushes FB
  * candidates to a sheet; after a human validates,
  * assos_validation_retreatment.py pulls it back, snapshots a dated
  * partition, geocodes, merges history with keep-last dedup, and ships
  * the WP CSV. SheetIO/Geocoder are injected (hermetic in tests).
  */
class ValidationPipeline(
    catalog: TableCatalog,
    sheets: SheetIO,
    geocoder: Geocoder,
    notifier: Notifier,
    today: String) {

  /** Push not-yet-validated candidates to the validation sheet
    * (assos_..._to_spreadsheets.py:41-99). */
  def pushCandidates(spark: SparkSession, sheet: String): DataFrame = {
    val raw = catalog.read("associations_raw")
    val toAdd = sheets.download(spark, sheet, "to_add")
    val validated = sheets.download(spark, sheet, "validated")
    val candidates = raw
      // semi-join on the to-add list (:52-57)
      .join(toAdd.select(col("titre")), Seq("titre"), "left_semi")
      // anti-join vs already-validated (:61-69)
      .join(validated.select(col("titre")), Seq("titre"), "left_anti")
      // FB-candidate filters (:72-73)
      .filter(col("check_levenshtein_similarity_facebook")
        =!= "no_fb_account")
      // derived address + literals (:76-84)
      .withColumn("adrg_achemine", lit("Paris"))
      .withColumn("combined_address", concat_ws(", ",
        col("adrs_codepostal").cast("string"), col("adrg_achemine")))
      .withColumn("fb_validation", lit(""))
      .withColumn("main_category", lit(""))
      // sort + negative regex (:85-88)
      .filter(!coalesce(col("titre")
        .rlike("LYCEE|FESTIVAL|COLLEGE|PRODUCTION"), lit(false)))
      .orderBy(col("date_extract").asc, col("titre").asc)
    sheets.upload(candidates, sheet, "to_validate")
    candidates
  }

  /** Pull the validated sheet back, snapshot, geocode, merge history,
    * ship (assos_validation_retreatment.py:52-156). */
  def retreat(spark: SparkSession, sheet: String,
              wpCsvPath: String): DataFrame = {
    val validated = sheets.download(spark, sheet, "to_validate")
      .withColumn("date_upload", to_date(lit(today)))
      // checked filter (:70)
      .filter(col("main_category") =!= "" ||
        col("fb_validation") === "no")
      // title-case (:77-78)
      .withColumn("titre", initcap(lower(col("titre"))))
    catalog.writePartition(
      validated.withColumn("date_extract", lit(today)),
      "associations_validation", "date_extract", today)

    val geo = geocoder // local capture: keep `this` out of the closure
    val geocoded = Enrich.viaService(
      validated.filter(col("fb_validation") =!= ""),
      "combined_address", "coordinates")(() => geo.geocode _)
      // split lat/lon (:95-96)
      .withColumn("Lattitude", split(col("coordinates"), ",").getItem(0))
      .withColumn("Longitude", split(col("coordinates"), ",").getItem(1))

    val history = sheets.download(spark, sheet, "history")
      .withColumn("date_upload", to_date(col("date_upload")))
    // union + keep-last dedup: newest upload wins (:98-106; A3 with the
    // implicit order made explicit, SURVEY §7.4(1)). The tie-break is a
    // source-precedence column — when a history row and a fresh geocoded
    // row share the same date_upload (rerunning retreat the same day),
    // pandas keep='last' keeps the freshly-appended row, so the geocoded
    // side gets the smaller (asc-first) precedence value.
    val merged = Dedup.dedupKeepLast(
      history.withColumn("__src", lit(1)).unionByName(
        geocoded.select(history.columns.map(col).toIndexedSeq: _*)
          .withColumn("__src", lit(0)),
        allowMissingColumns = true),
      Seq("titre"), col("date_upload"), col("__src"))
      .drop("__src")
      // arrondissement map (:108-135) + Paris filter (:139)
      .withColumn("arrondissement",
        CondOps.mapLookup(CondOps.arrondissementMap,
          col("adrs_codepostal").cast("int")))
      .filter(coalesce(col("arrondissement").rlike("^Paris"), lit(false)))
    // anti-join removals (:145-149)
    val toRemove = sheets.download(spark, sheet, "to_remove")
    val out = merged.join(toRemove.select(col("titre")), Seq("titre"),
      "left_anti")
    // materialize before sinking: the history upload overwrites a file
    // this frame's lineage reads (sheet-scale rows — human-validated
    // data — so a driver materialization is bounded by construction)
    val rows = java.util.Arrays.asList(out.collect(): _*)
    val materialized = spark.createDataFrame(rows, out.schema)
    sheets.upload(materialized, sheet, "history")
    CsvSink.write(materialized, wpCsvPath, Seq(col("titre")))
    notifier.notify("#scripts", "Validation retreatment done")
    materialized
  }
}
