package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      println(s"== $sf nanosProbe=" +
        graft.core.Tables.tsStoredAsNanos(spark, s"$dir/events.parquet"))
      val ev = graft.core.Tables.load(spark, dir, "events")
      ev.printSchema()
      ev.agg(min("ts"), max("ts"), count(lit(1))).show(false)
    }
    spark.stop()
  }
}
