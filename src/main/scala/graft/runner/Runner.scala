package graft.runner

import graft.catalog.TableCatalog
import graft.io.Connectors.Notifier

/** Orchestration shell (SURVEY §3.3/§4): the skip-if-done daily loop the
  * reference drives from partition metadata
  * (custom_search_extraction.py:53-66), plus the fire-and-forget HTTP
  * trigger sink (K7, processing_launch.py:16-54). This is control flow,
  * not planning — it stays outside Catalyst by design.
  */
object Runner {

  /** K7: HTTP trigger sink behind a trait; hermetic impls collect. */
  trait Trigger {
    def fire(url: String): Unit
  }
  class CollectingTrigger extends Trigger {
    val fired = scala.collection.mutable.ArrayBuffer[String]()
    def fire(url: String): Unit = fired += url
  }
  /** Production impl: fire-and-forget GET (unused in tests). Both
    * timeouts are set — without a read timeout a hung endpoint would
    * block the daily loop indefinitely — and IO failures are logged,
    * never propagated: a dead trigger endpoint must not abort the run. */
  class HttpTrigger extends Trigger {
    def fire(url: String): Unit =
      try {
        val conn = new java.net.URI(url).toURL.openConnection()
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(10000)
        conn.getInputStream.close()
      } catch {
        case e: java.io.IOException =>
          System.err.println(s"[graft] trigger $url failed: ${e.getMessage}")
      }
  }

  /** Idempotency guard: run `step` only when `today`'s partition of
    * `table` is absent; notify and skip otherwise. Returns whether the
    * step ran. */
  def runDailyPartition(catalog: TableCatalog, notifier: Notifier,
                        table: String, partField: String, today: String)(
      step: => Unit): Boolean =
    if (catalog.listPartitions(table, partField).contains(today)) {
      notifier.notify("#scripts", s"$table already processed $today")
      false
    } else {
      step
      true
    }
}
