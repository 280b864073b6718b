package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Fence

/** Dev-only: stage-wise wall-clock of the round-8 dd03 shape —
  * signatures → group-collapse → banding → guarded band join → verify
  * → expand — to attribute the operator's cost to its stages. Each
  * stage is timed cumulatively (computation up to and including that
  * stage, fresh from the fenced signature frame), so the delta between
  * consecutive lines is the stage's own cost. */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val geom = MinHashLSH.geometryFor(threshold)

    val all = Fence(MinHashLSH.signatureFrame(docs, "doc_id", "text", 3,
      geom))
    timed("signatures")(
      all.write.format("noop").mode("overwrite").save())

    val collapsed = timed("collapse.detect")(GroupCollapse.collapse(all))
    val reps = collapsed.reps
    println(s"  collapse active = ${collapsed.active}")
    if (collapsed.active) {
      timed("collapse.groups")(
        collapsed.groups.write.format("noop").mode("overwrite").save())
      timed("collapse.memMulti")(
        collapsed.memMulti.write.format("noop").mode("overwrite").save())
      timed("collapse.reps")(
        reps.write.format("noop").mode("overwrite").save())
    }

    val bands = MinHashLSH.bandFrameWithSig(reps, geom)
    timed("bands")(
      bands.write.format("noop").mode("overwrite").save())

    val survivors = MinHashLSH.collidedSurvivors(bands, bands, threshold,
      geom, selfJoin = true)
    timed("bandJoin+floor")(
      survivors.write.format("noop").mode("overwrite").save())

    val repPairs = MinHashLSH.verifySurvivors(survivors, reps, threshold)
    timed("verify")(
      repPairs.write.format("noop").mode("overwrite").save())

    val out = GroupCollapse.expand(repPairs, collapsed, "jacc")
    timed("expand")(
      out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
