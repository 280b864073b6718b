package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.AnnIndex
import graft.catalog.TableCatalog

/** Dev-only: phase timing of the ann17 gate (residual IVF-PQ build +
  * append + refine probe) — attributes the gate's cost between the
  * coarse fit, the PQ training, the encode/write, the append, and the
  * probe. Usage: `runMain graft.tools.ProbeBuild [sfDir] [reps]`. */
object ProbeBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PART $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      val wh = java.nio.file.Files
        .createTempDirectory("probe_build_").toString
      val cat = new TableCatalog(spark, wh)
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val (first, rest) = (e.filter(pmod(col("vec_id"), lit(2)) === 0),
        e.filter(pmod(col("vec_id"), lit(2)) === 1))
      timed("build") {
        AnnIndex.buildIvfPq(cat, first, "vec_id", "embedding", "ix",
          numCells = 16, trainIters = 2, pqIters = 2,
          trainData = Some(e))
      }
      timed("append") {
        AnnIndex.appendIvfPq(cat, rest, "vec_id", "embedding", "ix")
      }
      timed("probe") {
        AnnIndex.ivfPqRefineTopKFromIndex(cat, "ix", e,
            e.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
            nprobe = 2, refine = 64)
          .orderBy(col("q_id"), col("rank"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
