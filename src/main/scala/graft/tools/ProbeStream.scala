package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.streaming.CorpusStream

/** Dev-only: per-batch cost of the incremental corpus pipeline as the
  * seen-state grows — the measurement behind CorpusStream's
  * "per-batch work is O(new docs + band collisions), never O(corpus)"
  * claim. Feeds the [[ProbeScale]] corpus one replica per micro-batch
  * (identity admission — the probe corpus's letter shift defeats
  * langId by design) and prints each batch's wall time against the
  * accumulated state size. The honest expectation is NOT perfectly
  * flat: the state table is re-read and banded every batch (columnar
  * scan, linear in state), while the shuffle/verify work tracks new
  * docs + collisions; the probe separates gentle linear scan growth
  * from the quadratic blow-up the design rules out.
  *
  * Args: [scaleDir] [batches] [slicesPerReplica]. Slices > 1 cut each
  * replica into that many consecutive id ranges — small batches
  * against a growing state, the regime where any per-batch O(state)
  * term (re-banding, re-sorting the stored sketches) shows up as a
  * visible slope while O(new + collisions) work stays flat. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val slices = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files
      .createTempDirectory("probe_stream_").toString
    val cat = new TableCatalog(spark, wh)
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    // replica k occupies ids [k*10M, k*10M + span); slices divide the
    // OCCUPIED span, not the offset stride
    val span = docs.filter(col("doc_id") < 10000000L)
      .agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val width = (span + slices - 1) / slices
    (0 until batches).foreach { k =>
      val lo = (k / slices).toLong * 10000000L + (k % slices) * width
      val batch = docs.filter(col("doc_id") >= lo &&
        col("doc_id") < lo + width)
      val t0 = System.nanoTime()
      CorpusStream.processBatch(batch, cat, "probe_state", "probe_out",
        k.toLong, admit = identity)
      val secs = (System.nanoTime() - t0) / 1e9
      val stateRows = CorpusStream.readState(cat, "probe_state").count()
      println(f"BATCH $k%2d  ${secs}%6.2f s   state=$stateRows rows")
    }
    spark.stop()
  }
}
