package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.io.{CsvSink, Fetcher, HttpCsvSource}
import graft.io.Connectors.Notifier
import graft.ops.{Availability, CondOps, DateOps, StringOps}

/** The events pipeline end-to-end (SURVEY §3.2 / §7.2 — the full
  * process_open_data.py dataflow re-expressed as one lazy DataFrame
  * chain): HTTP CSV scan → column slugify → not-null filter →
  * availability algebra → geo split → video extract → HTML strip → date
  * parse/filter → duration → French date → arrondissement map → address
  * concat → category flag/map → price map → table sink → category/Paris/
  * price filters → limit(0) kill-switch → WP CSV sink → notification.
  *
  * The Python row loops (process_open_data.py:50-67) become vectorized
  * array expressions; the two sinks are the only actions. `today` is
  * injected (SURVEY §7.4 D4) so runs are reproducible; `createEnabled`
  * preserves the reference's limit(0) kill-switch (F8,
  * process_open_data.py:268) which ships an intentionally header-only
  * create file.
  */
class EventsPipeline(
    catalog: TableCatalog,
    fetcher: Fetcher,
    notifier: Notifier,
    today: String,
    calendarFrom: String = "2019-01-01",
    calendarTo: String = "2022-01-01",
    categories: Seq[String] = EventsPipeline.defaultCategories,
    categoryMap: Map[String, String] = EventsPipeline.defaultCategoryMap,
    priceMap: Map[String, String] = Map("payant" -> "Payant",
                                        "gratuit" -> "Libre"),
    createEnabled: Boolean = false) {

  /** Full pipeline: returns the frame written to the events table (for
    * tests); side effects are the table write, the WP CSV and the
    * notification. */
  def run(spark: SparkSession, url: String, wpCsvPath: String): DataFrame = {
    val raw = new HttpCsvSource(fetcher).read(spark, url)
    val named = StringOps.normalizeColumns(raw)

    // availability algebra (process_open_data.py:44-67)
    val cal = Availability.calendar(calendarFrom, calendarTo)
    val occ = split(regexp_replace(col("Occurrences"), ";", "_"), "_")
    val usedDates = array_distinct(
      transform(occ, o => to_date(substring(o, 1, 10), "yyyy-MM-dd")))

    val withDates = named
      .filter(col("Occurrences").isNotNull)
      .withColumn("calendar_availability",
        Availability.availability(cal, usedDates))
      // geo split (:72-73)
      .withColumn("Lattitude",
        split(col("Coordonnees_geographiques"), ",").getItem(0))
      .withColumn("Longitude",
        split(col("Coordonnees_geographiques"), ",").getItem(1))
      // video link extract + embed→watch rewrite (:75-76)
      .withColumn("video_link", regexp_replace(
        regexp_extract(col("Description"),
          "(https://www.youtube.com.*)\\?feature=oembed", 1),
        "embed/", "watch?v="))
      // iframe strip (:79)
      .withColumn("Description", regexp_replace(col("Description"),
        ".div.class=.component.*</iframe></div></div>", ""))
      // date parse + as-of filter (:82-91)
      .withColumn("Date_de_debut_clean",
        to_date(substring(col("Date_de_debut"), 1, 10)))
      .withColumn("Date_de_fin_clean",
        to_date(substring(col("Date_de_fin"), 1, 10)))
      .filter(col("Date_de_debut_clean") >= to_date(lit(today)))
      .withColumn("Duree_evenement",
        datediff(col("Date_de_fin_clean"), col("Date_de_debut_clean")))
      .withColumn("Date_de_debut_clean",
        DateOps.frenchLongDate(col("Date_de_debut_clean")))

    val enriched = withDates
      // arrondissement: only Paris rows get the postal map (:97-125)
      .withColumn("arrondissement",
        when(col("Ville") === "Paris",
          CondOps.mapLookup(CondOps.arrondissementMap,
            col("Code_postal").cast("int"))))
      // combined address (:127)
      .withColumn("combined_address", concat_ws(", ",
        col("Adresse_du_lieu").cast("string"),
        col("Code_postal").cast("string"), col("Ville").cast("string")))
      // category flag + maps (:184-245)
      .withColumn("flag_categories_to_import",
        CondOps.flagYesNo(col("Categorie").isin(categories: _*)))
      .withColumn("main_category",
        CondOps.mapLookup(categoryMap, col("Categorie")))
      .withColumn("Type_de_prix",
        CondOps.mapLookup(priceMap, col("Type_de_prix")))

    catalog.writeFull(enriched, "crm_events")

    // WP export: category + Paris + price filters, kill-switch, CSV
    // (:262-273)
    val toCreate = enriched
      .filter(col("Categorie").isin(categories: _*))
      .filter(coalesce(col("arrondissement").rlike("^Paris"), lit(false)))
      .filter(coalesce(col("Type_de_prix").rlike("^Libre$|^Payant$"),
        lit(false)))
    val gated = if (createEnabled) toCreate else toCreate.limit(0)
    CsvSink.write(gated, wpCsvPath, Seq(col("Titre")))

    notifier.notify("#crm", "Events table loaded")
    enriched
  }
}

object EventsPipeline {
  /** Reference category allowlist (subset; process_open_data.py:130-182). */
  val defaultCategories: Seq[String] = Seq(
    "Concerts -> Hip-Hop", "Concerts -> Rock", "Spectacles -> Théâtre",
    "Animations -> Stage", "Concerts -> Musiques du Monde",
    "Événements -> Événement sportif", "Concerts -> Chanson française",
    "Spectacles -> Jeune public", "Concerts -> Autre concert",
    "Expositions -> Autre expo", "Concerts -> Électronique",
    "Expositions -> Art Contemporain", "Spectacles -> Autre spectacle",
    "Concerts -> Classique", "Concerts -> Jazz")

  /** Category → main-category map (subset; process_open_data.py:189-237). */
  val defaultCategoryMap: Map[String, String] = Map(
    "Concerts -> Hip-Hop" -> "Musique",
    "Concerts -> Rock" -> "Musique",
    "Concerts -> Jazz" -> "Musique",
    "Concerts -> Classique" -> "Musique",
    "Spectacles -> Théâtre" -> "Spectacle",
    "Spectacles -> Jeune public" -> "Spectacle",
    "Expositions -> Autre expo" -> "Exposition",
    "Expositions -> Art Contemporain" -> "Exposition",
    "Animations -> Stage" -> "Animation",
    "Événements -> Événement sportif" -> "Événement")
}
