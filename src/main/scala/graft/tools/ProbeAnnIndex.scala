package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{Ann, AnnIndex}
import graft.catalog.TableCatalog

/** Dev-only: the persisted-index claim measured directly — a serving
  * workload that answers R repeated neighbor/top-k queries should pay
  * the fit ONCE (at build), not once per query. Times R repetitions of
  * (a) the fit-inline forms (lshBucketNeighborsAuto / trained ivfTopK,
  * which re-count, re-bucket, re-train every call) against (b) one
  * index build + R probes off the loaded artifact.
  * Args: [sfDir] [reps]. */
object ProbeAnnIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val wh = java.nio.file.Files
      .createTempDirectory("probe_annidx_").toString
    val cat = new TableCatalog(spark, wh)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        s" rows=$n")
    }
    println(s"=== LSH neighbors, $reps reps ===")
    (1 to reps).foreach { _ =>
      timed("fresh-fit ") {
        Ann.lshBucketNeighborsAuto(e, "vec_id", "embedding", 1).count()
      }
    }
    timed("build     ") {
      AnnIndex.buildLsh(cat, e, "vec_id", "embedding", "ix",
        targetBucketRows = 1).toLong
    }
    (1 to reps).foreach { _ =>
      timed("from-index") {
        AnnIndex.lshNeighborsFromIndex(cat, "ix").count()
      }
    }
    println(s"=== IVF top-10 (2 Lloyd rounds), $reps reps ===")
    (1 to reps).foreach { _ =>
      timed("fresh-fit ") {
        Ann.ivfTopK(e, q, "vec_id", "embedding", 10, trainIters = 2)
          .count()
      }
    }
    timed("build     ") {
      AnnIndex.buildIvf(cat, e, "vec_id", "embedding", "ivf",
        trainIters = 2); 0L
    }
    (1 to reps).foreach { _ =>
      timed("from-index") {
        AnnIndex.ivfTopKFromIndex(cat, "ivf", q, "vec_id", "embedding",
          10).count()
      }
    }
    println(s"=== SQ8 top-10, $reps reps ===")
    (1 to reps).foreach { _ =>
      timed("fresh-fit ") {
        Ann.sq8TopK(e, q, "vec_id", "embedding", 10).count()
      }
    }
    timed("build     ") {
      AnnIndex.buildSq8(cat, e, "vec_id", "embedding", "sq8"); 0L
    }
    (1 to reps).foreach { _ =>
      timed("from-index") {
        AnnIndex.sq8TopKFromIndex(cat, "sq8", q, "vec_id", "embedding",
          10).count()
      }
    }
    println(s"=== PQ/ADC top-10 (4x8 codebooks, 2 rounds), $reps reps ===")
    (1 to reps).foreach { _ =>
      timed("fresh-fit ") {
        Ann.pqTopK(e, q, "vec_id", "embedding", 10).count()
      }
    }
    timed("build     ") {
      AnnIndex.buildPq(cat, e, "vec_id", "embedding", "pq",
        trainIters = 2); 0L
    }
    (1 to reps).foreach { _ =>
      timed("from-index") {
        AnnIndex.pqTopKFromIndex(cat, "pq", q, "vec_id", "embedding",
          10).count()
      }
    }
    println(s"=== residual IVF-PQ + refine top-10 (two-stage), $reps reps ===")
    (1 to reps).foreach { _ =>
      timed("fresh-fit ") {
        Ann.ivfPqResidualTopK(e, q, "vec_id", "embedding", 10,
          refine = 64).count()
      }
    }
    timed("build     ") {
      AnnIndex.buildIvfPq(cat, e, "vec_id", "embedding", "rq"); 0L
    }
    (1 to reps).foreach { _ =>
      timed("from-index") {
        AnnIndex.ivfPqRefineTopKFromIndex(cat, "rq", e, q, "vec_id",
          "embedding", 10, refine = 64).count()
      }
    }
    // r14: appends are O(batch) — indexed_n comes from the _segmeta
    // counts, never a corpus recount, so a 16-row append onto the
    // corpus-sized index should cost the same at every SF (run the
    // probe at two sfDirs to see the flat line).
    println(s"=== 16-row appends onto the corpus index, $reps reps ===")
    val batch = e.filter(col("vec_id") < 16)
      .withColumn("vec_id", col("vec_id") + lit(10000000L))
    (1 to reps).foreach { i =>
      timed("append-sq8") {
        AnnIndex.appendSq8(cat, batch, "vec_id", "embedding", "sq8",
          segKey = Some(s"probe$i")); 16L
      }
    }
    (1 to reps).foreach { i =>
      timed("append-lsh") {
        AnnIndex.appendLsh(cat, batch, "vec_id", "embedding", "ix",
          segKey = Some(s"probe$i")); 16L
      }
    }
    // r15: the deletion serving tax — probes with ~1/7 of the corpus
    // tombstoned pay one read-time anti-join; compaction purges and
    // the probe returns to its no-tombstone cost.
    println(s"=== SQ8 probes under deletion (1/7 tombstoned), $reps reps ===")
    timed("delete    ") {
      AnnIndex.deleteIds(cat, e.filter(pmod(col("vec_id"), lit(7)) === 0)
        .select(col("vec_id")), "vec_id", "sq8"); 0L
    }
    (1 to reps).foreach { _ =>
      timed("masked    ") {
        AnnIndex.sq8TopKFromIndex(cat, "sq8", q, "vec_id", "embedding",
          10).count()
      }
    }
    timed("compact   ") { AnnIndex.compactSegs(cat, "sq8"); 0L }
    (1 to reps).foreach { _ =>
      timed("purged    ") {
        AnnIndex.sq8TopKFromIndex(cat, "sq8", q, "vec_id", "embedding",
          10).count()
      }
    }
    spark.stop()
  }
}
