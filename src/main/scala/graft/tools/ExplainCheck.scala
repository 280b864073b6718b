package graft

import org.apache.spark.sql.SparkSession

/** One-off: print the AQE-final physical plan of named queries. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.write.format("noop").mode("overwrite").save()
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString
        .linesIterator.map(_.take(120)).mkString("\n").take(4000))
    }
    spark.stop()
  }
}
