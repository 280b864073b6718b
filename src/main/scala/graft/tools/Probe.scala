package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema(); ev.show(3, false)
    } catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c.getCause != null) c = c.getCause
        println("PLAIN-READ-FAIL: " + c.toString.take(300))
    }
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema(); ev.show(3, false)
      println("NANOS-AS-LONG-OK")
    } catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c.getCause != null) c = c.getCause
        println("NANOS-AS-LONG-FAIL: " + c.toString.take(300))
    }
    spark.stop()
  }
}
