package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-service connector traits (SURVEY §2.1 S8/S9, K5/K6, §2.8
  * U1-U3). Pipelines depend only on these interfaces; tests and the
  * zero-egress environment bind the deterministic stubs, production
  * binds real HTTP/Sheets/Slack clients. Keeping nondeterminism behind
  * injected traits is what makes reruns replayable (SURVEY §7.4(2)).
  */
object Connectors {

  /** S9: search API source (adv.serp_goog, custom_search_extraction
    * .py:186-190). */
  trait SearchApi extends Serializable {
    def search(query: String, limit: Int): Seq[SearchResult]
  }
  final case class SearchResult(rank: Double, title: String, link: String,
                                snippet: String)

  /** Deterministic stub: results derived from the query text alone. */
  object StubSearchApi extends SearchApi {
    def search(query: String, limit: Int): Seq[SearchResult] = {
      val slug = query.toLowerCase.replaceAll("[^a-z0-9]+", "-")
      (1 to math.min(limit, 3)).map(i =>
        SearchResult(i.toDouble, s"$query — result $i",
          s"https://example.org/$slug/$i", s"snippet $i for $query"))
    }
  }

  /** U1/U2: Facebook id/url resolution (get_similarity.py:44-60).
    * Stub outputs derive from [[graft.text.TextHash.charHashStr]] — the
    * same polynomial the DuckDB oracle can evaluate via `charHashSql` —
    * so the enrichment plumbing itself is oracle-gated, not just
    * suite-tested. */
  trait FbResolver extends Serializable {
    def resolveId(url: String): String
    def resolveUrl(id: String): String
  }
  object StubFbResolver extends FbResolver {
    def resolveId(url: String): String =
      if (url == null || url.isEmpty) "0"
      else graft.text.TextHash.charHashStr(url).toString
    def resolveUrl(id: String): String =
      if (id == null || id == "0") "" else s"https://facebook.com/page-$id"
  }

  /** U3: geocoder (assos_validation_retreatment.py:32-39): "lat,lon" or
    * empty on failure. Deterministic coordinates from the same
    * oracle-expressible charHash as the FB stub. */
  trait Geocoder extends Serializable {
    def geocode(address: String): String
  }
  object StubGeocoder extends Geocoder {
    def geocode(address: String): String =
      if (address == null || address.isEmpty) ""
      else {
        val h = graft.text.TextHash.charHashStr(address)
        f"48.8${h % 100}%02d,2.3${(h / 100) % 100}%02d"
      }
  }

  /** S8/K5: sheet IO (g2d/d2g round-trip). Stub backs worksheets with
    * CSV files under a local directory. */
  trait SheetIO {
    def download(spark: SparkSession, sheet: String, ws: String): DataFrame
    def upload(df: DataFrame, sheet: String, ws: String): Unit
  }
  class CsvSheetIO(dir: String) extends SheetIO {
    private def path(sheet: String, ws: String) = s"$dir/$sheet/$ws"
    def download(spark: SparkSession, sheet: String, ws: String): DataFrame =
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(path(sheet, ws))
    /** Sheets are driver-scale by nature; materialize before writing so
      * a worksheet can be rewritten from a frame derived from itself
      * (the reference's clean=True replace semantics). */
    def upload(df: DataFrame, sheet: String, ws: String): Unit = {
      val spark = df.sparkSession
      val rows = java.util.Arrays.asList(df.collect(): _*)
      spark.createDataFrame(rows, df.schema)
        .coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(path(sheet, ws))
    }
  }

  /** K6: notification sink (Slack postMessage at
    * process_open_data.py:278-289) — a runner side-channel, not a
    * dataflow op. */
  trait Notifier {
    def notify(channel: String, message: String): Unit
  }
  class CollectingNotifier extends Notifier {
    val messages = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def notify(channel: String, message: String): Unit =
      messages += ((channel, message))
  }
}
