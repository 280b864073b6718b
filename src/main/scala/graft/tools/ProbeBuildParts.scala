package graft.ann

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog

/** Dev-only: sub-phase timing inside [[AnnIndex.buildIvfPq]] for the
  * ann17 shape — metric frame, coarse k-means, residual fence, PQ
  * training, counts, artifact writes. Usage:
  * `runMain graft.ann.ProbeBuildParts [sfDir] [reps]`. */
object ProbeBuildParts {
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
    import spark.implicits._
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PART $label%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      val wh = java.nio.file.Files
        .createTempDirectory("probe_bp_").toString
      val cat = new TableCatalog(spark, wh)
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val data = e.filter(pmod(col("vec_id"), lit(2)) === 0)
      val geom = Ann.DefaultGeom
      val trainUn = timed("metricFrame") {
        val f = Ann.metricFrame(e, "vec_id", "embedding", geom.dim,
          "cosine")
        f.write.format("noop").mode("overwrite").save(); f
      }
      val cents = timed("coarseKmeans") {
        Ann.kmeansCentroidsL2(
          trainUn.select(col("id"), col("u").as("s")), 16, 2)
      }
      val resid = timed("residFence") {
        val f = Ann.residualFrame(trainUn, cents)
        f.write.format("noop").mode("overwrite").save(); f
      }
      val books = timed("pqTrain") { Ann.pqTrainOn(resid, 2, geom) }
      val n = timed("counts") { data.count() + e.count() }
      timed("encode") {
        AnnIndex.assignIvfPq(data, "vec_id", "embedding", cents,
            books, geom, "cosine")
          .write.format("noop").mode("overwrite").save()
      }
      timed("writeSection") {
        val centRows = cents.zipWithIndex.flatMap { case ((v, _), c) =>
          v.zipWithIndex.map { case (x, p) => (c, p, x) }
        }.toSeq
        val bookRows = for {
          m <- books.indices
          j <- books(m).indices
          (x, p) <- books(m)(j)._1.zipWithIndex
        } yield (m, j, p, x)
        graft.core.Par.concurrently(Seq(
          () => cat.writeFull(centRows.toDF("cell", "pos", "val"),
            "ix_cent"),
          () => cat.writeFull(bookRows.toDF("m", "cell", "pos", "val"),
            "ix_pqcent"),
          () => AnnIndex.writeSeg(cat, "ix",
            AnnIndex.assignIvfPq(data, "vec_id", "embedding",
              cents, books, geom, "cosine"), "0", "cell")))
      }
      println(s"  n=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
