package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.io.Connectors.{FbResolver, Notifier, SearchApi}
import graft.io.{ExcelSource, Fetcher, ZipCsvSource}
import graft.ops.{CondOps, Enrich, StringOps}
import graft.sim.Fuzzy

/** The associations discovery chain (SURVEY §3.3, first two scripts):
  * custom_search_extraction.py + get_similarity.py re-expressed as three
  * idempotent stages over the partitioned catalog. External services
  * (search API, FB resolution) are injected connectors; the ≤quota
  * keyword sample is the only driver-side collection (bounded by the
  * daily API quota, custom_search_extraction.py:32).
  */
class DiscoveryPipeline(
    catalog: TableCatalog,
    searchApi: SearchApi,
    fbResolver: FbResolver,
    notifier: Notifier,
    today: String,
    categories: Seq[String],
    keywordsNb: Int = 100) {

  /** Stage 1 (custom_search_extraction.py:69-228): RNA zip scan →
    * nomenclature lookup → Paris filter → category flag → conditional
    * full write → remaining-keywords diff → seeded sample → search API →
    * partitioned write. */
  /** Default nomenclature path: read the remote `.xlsx` lookup directly
    * (custom_search_extraction.py:92-94 `pd.read_excel(url)`) and copy
    * `Code Objet Social` to the join key, as the reference does. Headers
    * are slug-normalized first — the raw ones contain spaces, which the
    * parquet catalog (unlike pandas) rejects in field names. */
  def runExtraction(spark: SparkSession, rnaZipUrl: String,
                    nomenclatureXlsxUrl: String, fetcher: Fetcher): Unit =
    runExtraction(spark, rnaZipUrl,
      StringOps.normalizeColumns(
        new ExcelSource(fetcher).read(spark, nomenclatureXlsxUrl))
        .withColumn("objet_social1", col("code_objet_social")),
      fetcher)

  def runExtraction(spark: SparkSession, rnaZipUrl: String,
                    nomenclature: DataFrame, fetcher: Fetcher): Unit = {
    val rna = StringOps.normalizeColumns(
      new ZipCsvSource(fetcher).read(spark, rnaZipUrl))
      // Paris filter with na=false (:101)
      .filter(coalesce(col("adrg_codepostal").cast("string")
        .rlike("^75"), lit(false)))
      // nomenclature lookup join (:96-97)
      .join(broadcast(nomenclature), Seq("objet_social1"), "left")
      // category flag (:143-144)
      .withColumn("filtered_cat",
        CondOps.flagYesNo(col("objet_social").isin(categories: _*)))
    // conditional full write (:147-155)
    catalog.writeIfAbsent(rna, "rna_waldec_filtered")

    val filtered = rna.filter(col("objet_social").isin(categories: _*))
    val candidates = filtered.select(lower(col("titre")).as("kw")).distinct()
    val searched =
      if (catalog.tableExists("custom_search"))
        catalog.read("custom_search")
          .select(lower(col("searchTerms")).as("kw")).distinct()
      else candidates.limit(0)
    // A7 symmetric diff (:44-47,174); then A8 deterministic sample+quota
    val remaining = candidates.except(searched)
      .union(searched.except(candidates))
      .orderBy(md5(col("kw").cast("binary"))).limit(keywordsNb)
      .collect().map(_.getString(0)).toSeq
    if (remaining.nonEmpty) {
      import spark.implicits._
      val results = remaining.flatMap(kw =>
        searchApi.search(kw, 10).map(r =>
          (kw, r.rank, r.title, r.snippet, r.link, today)))
        .toDF("searchTerms", "rank", "title", "snippet", "link",
          "date_extract")
      catalog.writePartition(results, "custom_search", "date_extract",
        today)
      notifier.notify("#scripts",
        s"Custom search updated ${remaining.size} queries")
    }
  }

  /** Stage 2 (get_similarity.py:89-161): for each custom_search
    * partition without a similarity partition — rank==1 filter, FB
    * enrichment, URL-slug normalization, fuzzy top-1 score, partitioned
    * write. The skip-if-done loop is partition metadata only (S7). */
  def runSimilarity(spark: SparkSession): Unit = {
    val done = catalog.listPartitions("similarity", "date_extract").toSet
    val todo = catalog.listPartitions("custom_search", "date_extract")
      .filterNot(done)
    todo.foreach { date =>
      val cs = catalog.read("custom_search")
        .filter(col("date_extract") === date)
        .filter(col("rank") === 1.0)
        .withColumn("titre", upper(col("searchTerms")))
      // U1/U2 enrichment via partition-batched service calls (:121-126).
      // Local capture: the lambda must not close over the pipeline
      // instance (it holds the catalog/session — not serializable).
      val resolver = fbResolver
      val withId = Enrich.viaService(cs, "link", "Facebook_ID")(
        () => resolver.resolveId _)
      val withUrl = Enrich.viaService(withId, "Facebook_ID",
        "Facebook_URL")(() => resolver.resolveUrl _)
      // URL-slug normalization chain (:125-141)
      val slugged = withUrl
        .withColumn("link_new",
          when(col("Facebook_ID") === "0", col("link"))
            .otherwise(col("Facebook_URL")))
        .withColumn("link_new",
          regexp_extract(col("link_new"), "([^/.*/]+)/?$", 1))
        .withColumn("link_new", regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(trim(lower(col("link_new"))),
            " ", ""), "%C3%A9", "e"), "[0-9]+", ""), "-", ""))
        .withColumn("searchTerms",
          regexp_replace(trim(lower(col("searchTerms"))), " ", ""))
      // J5 fuzzy top-1 score within the daily partition (:148-152);
      // reference keeps the best score only
      val scored = Fuzzy.fuzzyTop1Join(slugged, "searchTerms",
          slugged, "link_new", "levenshtein_similarity")
        .drop("link_new")
        .withColumnRenamed("searchTerms", "searchTerms")
      catalog.writePartition(
        scored.withColumn("date_extract", lit(date)),
        "similarity", "date_extract", date)
    }
  }

  /** Stage 3 (get_similarity.py:163-204): similarity × rna join on
    * titre, 3-way banding, full overwrite of associations_raw. */
  def runAssociationsRaw(spark: SparkSession): DataFrame = {
    val sim = catalog.read("similarity")
    val rna = catalog.read("rna_waldec_filtered")
      .filter(col("filtered_cat") === "yes")
      .withColumn("titre", upper(col("titre"))) // align with similarity's
                                                // upper(searchTerms) key
    val joined = rna.join(
      sim.select(col("titre"), col("levenshtein_similarity"),
        col("date_extract")), Seq("titre"), "left")
      .withColumn("check_levenshtein_similarity_facebook",
        CondOps.band3(col("levenshtein_similarity"),
          "fb_account", "potential_fb_account", "no_fb_account"))
    catalog.writeFull(joined, "associations_raw")
    joined
  }
}
