package graft.tools

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.streaming.CorpusStream

/** Dev-only: the round-11 emit-index retraction lookup vs the legacy
  * full-output semi-join, measured DIRECTLY and against a GROWING
  * output table. Seeds a small real incremental warehouse, then
  * inflates the output (and, to be fair to the index, the emit
  * table) with synthetic already-emitted partitions in steps, timing
  * at each step the affected-partition lookup for a small retraction
  * set via both paths — index present (pk-pruned index read) and
  * index hidden (full output scan). The claim under test: fallback
  * cost grows with output size, index cost does not.
  * Args: [scaleDir] [seedBatches] [inflateSteps] [rowsPerStepM]. */
object ProbeEmit {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val seedBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val steps = args.lift(2).map(_.toInt).getOrElse(3)
    val rowsPerStep = args.lift(3).map(_.toInt).getOrElse(4) * 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files
      .createTempDirectory("probe_emit_").toString
    val fs = new Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cat = new TableCatalog(spark, wh)
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val span = docs.filter(col("doc_id") < 10000000L)
      .agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    (0 until seedBatches).foreach { k =>
      val lo = k.toLong * 10000000L
      CorpusStream.processBatch(
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + span),
        cat, "pe_state", "pe_out", k.toLong, admit = identity)
    }
    // a small retraction set (the common shape: a handful of
    // dethroned canonicals) — absent ids still drive the full lookup
    import spark.implicits._
    val retr = Seq(31L, 4207L, 9811L, 13313L, 900017L)
      .toDF("__r").persist()
    retr.count()
    def timeLookup(label: String, reps: Int = 3): Unit = {
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val a = CorpusStream.affectedOutputPartitions(cat, "pe_state",
          "pe_out", "999999", retr)
        println(f"LOOKUP $label ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
          s" affected=${a.map(_._2.size).sum}")
      }
    }
    var off = 900000000L
    (0 to steps).foreach { step =>
      if (step > 0) {
        // inflate: one synthetic already-emitted partition per step on
        // BOTH tables (the index is charged for its own rows too)
        val key = (1000 + step).toString
        val syn = spark.range(rowsPerStep)
          .select((col("id") + off).as("doc_id"), lit("en").as("lang"),
            lit(100).as("n_toks"))
          .withColumn("batch_id", lit(key))
        cat.writePartition(syn, "pe_out", "batch_id", key)
        cat.writeSubPartitioned(
          syn.select(col("doc_id").as("id"), lit(key).as("eb"))
            // the REAL pipeline's pk column — a drifted constant here
            // would land the inflated index rows in wrong buckets and
            // silently measure the wrong thing (ADVICE r11)
            .withColumn("pk", CorpusStream.emitPkCol(col("id")))
            .withColumn("batch_id", lit(key))
            .repartition(col("pk")),
          "pe_state_emit", "batch_id", key, "pk")
        off += rowsPerStep
      }
      val outRows = cat.read("pe_out").count()
      println(s"=== output rows: $outRows ===")
      timeLookup("indexed ")
      // force the fallback by hiding the emit table itself (coverage
      // is structural since round 12 — no marker to delete)
      val emitPath = new Path(cat.tablePath("pe_state_emit"))
      val hidden = new Path(cat.tablePath("pe_state_emit__hidden"))
      fs.rename(emitPath, hidden)
      timeLookup("fallback")
      fs.rename(hidden, emitPath)
    }
    spark.stop()
  }
}
