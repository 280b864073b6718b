package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.io.{Fetcher, HttpCsvSource}
import graft.ops.{CondOps, StringOps}

/** The WP CRM export pipeline (SURVEY §3.4, wp_export_data.py): two
  * exported CSVs → default-category fill → listings-per-author aggregate
  * → left join onto users → zero-fill + owner flag → slugify → two full
  * table writes.
  *
  * Quirk preserved deliberately (SURVEY §7.4(5)): the per-author
  * aggregate is computed from the UNFILTERED listings frame — the
  * `_listing_type == 'service'` filtered copy the reference builds at
  * :38 is discarded by its own code.
  */
class ExportPipeline(catalog: TableCatalog) {

  def run(spark: SparkSession, usersCsvUrl: String, listingsCsvUrl: String,
          fetcher: Fetcher): (DataFrame, DataFrame) = {
    val src = new HttpCsvSource(fetcher)
    val users = src.read(spark, usersCsvUrl)
      .withColumnRenamed("ID", "Author_ID")
    val listings = src.read(spark, listingsCsvUrl)
      // default category fill (:33)
      .withColumn("Categories",
        coalesce(col("Categories"), lit("Non catégorisé")))

    // A1 group-count from the UNFILTERED frame (:38-41 quirk)
    val perAuthor = listings.groupBy(col("Author_ID"))
      .agg(count(col("Title")).as("nb_listing_owned"))

    // J4 left join + zero-fill + C1 flag (:44-49)
    val enriched = users
      .join(perAuthor, Seq("Author_ID"), "left")
      .withColumn("nb_listing_owned",
        coalesce(col("nb_listing_owned"), lit(0L)))
      .withColumn("listing_owned",
        CondOps.flagYesNo(col("nb_listing_owned") > 0))

    // P4 slugify + K1 full writes (:52-88)
    val usersOut = StringOps.normalizeColumns(enriched)
    val listingsOut = StringOps.normalizeColumns(listings)
    catalog.writeFull(usersOut, "wp_users")
    catalog.writeFull(listingsOut, "wp_listings")
    (usersOut, listingsOut)
  }
}
