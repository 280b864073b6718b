package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import graft.streaming.CorpusStream

/** Dev-only: the round-12 candidate-pruned cross-verify sketch fetch
  * vs the legacy full-state read, measured DIRECTLY against a GROWING
  * sketch state. Two warehouses with IDENTICAL state content are
  * seeded from a real batch, then inflated step-by-step with synthetic
  * stored-doc sketch rows — laid out PLAIN in one warehouse (the
  * pre-round-12 shape: read whole, row-filtered) and PK-SPLIT +
  * sorted-by-id in the other (directory-pruned + row-group-pruned by
  * the candidate id IN filter). Each step times the exact fetch shape
  * [[CorpusStream.processBatch]] issues — pk-pruned
  * [[CorpusStream.readSketchBatches]] + `id IN (candidates)` + an
  * array-touching aggregate — for a FIXED small candidate set (the
  * small-batch-on-big-state shape), plus one full processBatch pass
  * per layout for end-to-end sanity. The claim under test: plain
  * fetch cost grows with state size, split fetch cost does not.
  * Args: [srcDir] [inflateSteps] [rowsPerStepK]. */
object ProbeSketch {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = args.lift(1).map(_.toInt).getOrElse(3)
    val rowsPerStep = args.lift(2).map(_.toInt).getOrElse(400) * 1000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val geom = graft.sim.MinHashLSH
      .geometryFor(graft.text.CorpusPipeline.NearDupThreshold)
    val seedIds = docs.limit(200).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    def mkWarehouse(): TableCatalog = {
      val wh = java.nio.file.Files
        .createTempDirectory("probe_sketch_").toString
      val cat = new TableCatalog(spark, wh)
      CorpusStream.processBatch(docs, cat, "ps_state", "ps_out", 0L,
        admit = identity, compactEvery = 0)
      cat
    }
    val plainCat = mkWarehouse()
    val splitCat = mkWarehouse()
    def synRows(step: Int) = {
      val off = 1000000000L + step.toLong * rowsPerStep
      spark.range(rowsPerStep)
        .select((col("id") + off).as("id"))
        .select(col("id"),
          md5(concat(lit("syn-"), col("id"))).as("fp"),
          expr("transform(sequence(1, 16), " +
            "i -> xxhash64(concat('s', id, '-', i)))").as("sh"),
          lit(16).cast("int").as("n"),
          expr(s"transform(sequence(1, ${geom.numPerm}), " +
            "i -> xxhash64(concat('g', id, '-', i)))").as("sig"),
          expr("array_sort(transform(sequence(1, 16), " +
            "i -> xxhash64(concat('s', id, '-', i))))").as("sb"))
    }
    // empty bands/fp partitions per synthetic key keep the coverage
    // checks true without adding collision volume — the candidate set
    // and fp gate stay CONSTANT across steps by construction
    def emptyCover(cat: TableCatalog, key: String): Unit =
      Seq("ps_state_bands", "ps_state_fp").foreach { t =>
        cat.writePartition(
          cat.read(t).limit(0).withColumn("batch_id", lit(key)),
          t, "batch_id", key)
      }
    // the fetch the pipeline issues: pk-pruned shape-aware read,
    // candidate IN filter, and an aggregate that touches the arrays.
    // Candidates live INSIDE the step-1 synthetic id range — needles
    // the pruning must find among the haystack rows; candidates
    // outside every file's id span would let file-level min/max skip
    // the whole state in any layout and measure nothing
    // 4 candidates — the realistic small-batch-on-big-state shape
    // (dp03's batches collide with a handful of stored docs); a wide
    // candidate set saturates the 64 buckets and the directory
    // pruning degrades to the documented bucket-fraction bound
    val candIds = (0 until 4).map(i =>
      1000000000L + rowsPerStep + i.toLong * 1000L)
    val candPks = candIds.toDF("id")
      .select(CorpusStream.emitPkCol(col("id"))).distinct()
      .collect().map(_.getLong(0)).toSet
    // on a warm local page cache with 32 decode cores the SECONDS
    // flatten long before the I/O does, so the structural signal rides
    // along: how many FILES (and how many state rows' worth of bytes)
    // each layout's fetch plan touches — on an object store every
    // touched file is a remote open, and the byte superset is what the
    // store actually serves
    def timeFetch(label: String, cat: TableCatalog, step: Int): Unit = {
      val keys = cat.listPartitions("ps_state", "batch_id")
      val frame = CorpusStream
        .readSketchBatches(cat, "ps_state", keys, Some(candPks)).get
        .filter(col("id").isin(candIds: _*))
      val files = frame.inputFiles.length
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val got = frame
          .agg(count(lit(1)), sum(size(col("sh")))).collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"FETCH $label step=$step rep=$rep $secs%6.2f s " +
          s"rows=${got.getLong(0)} files=$files pks=${candPks.size}")
      }
    }
    def probeBatch(step: Int) = {
      val ids = seedIds.take(5).toDF("doc_id")
      docs.join(ids, Seq("doc_id"))
        .select((col("doc_id") + 500000000L + step.toLong * 1000L)
            .as("doc_id"),
          concat(lit(s"zzprobe$step "), col("text")).as("text"),
          col("lang"))
    }
    (0 to steps).foreach { step =>
      if (step > 0) {
        val key = (1000 + step).toString
        val syn = synRows(step).withColumn("batch_id", lit(key))
        // the legacy plain layout lands AS THE OLD PIPELINE WROTE IT:
        // skDf came out of a shuffle join, so each file holds
        // hash-scattered ids and row-group id min/max spans the whole
        // partition — contiguous synthetic ids would hand the plain
        // layout tight row-group stats no real state has
        plainCat.writePartition(
          syn.repartition(32, pmod(xxhash64(col("id")), lit(32))),
          "ps_state", "batch_id", key)
        splitCat.writeSubPartitioned(
          syn.withColumn("pk", CorpusStream.emitPkCol(col("id")))
            .repartition(col("pk"))
            .sortWithinPartitions(col("id")),
          "ps_state", "batch_id", key, "pk")
        emptyCover(plainCat, key); emptyCover(splitCat, key)
      }
      val stateRows = CorpusStream.readState(plainCat, "ps_state").count()
      println(s"=== state rows: $stateRows ===")
      timeFetch("plain", plainCat, step)
      timeFetch("split", splitCat, step)
      Seq(("plain", plainCat), ("split", splitCat)).foreach {
        case (label, cat) =>
          val t0 = System.nanoTime()
          CorpusStream.processBatch(probeBatch(step), cat,
            "ps_state", "ps_out", (10 + step).toLong,
            admit = identity, compactEvery = 0)
          println(f"BATCH $label step=$step " +
            f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    // the residual per-step slope above is the UNCOMPACTED batch-dir
    // term (each inflation step is its own state partition, so a fetch
    // opens |touched pks| files per partition). Production bounds it
    // with periodic compaction; demonstrate the bound: compact, fetch
    // again — opens collapse to the single compacted partition's
    // touched pks, independent of how many batches fed it
    println("=== post-compact ===")
    Seq(("plain", plainCat), ("split", splitCat)).foreach {
      case (label, cat) =>
        CorpusStream.compactState(cat, "ps_state", "zz-none")
        timeFetch(label, cat, 99)
    }
    spark.stop()
  }
}
