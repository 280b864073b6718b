package graft

import org.apache.spark.sql.functions._

import graft.core.{Fence, Par, Tables}

class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("Fence preserves schema and rows") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("c")))
      .toDF("id", "arr")
      .withColumn("n", size($"arr"))
    val fenced = Fence(df)
    assert(fenced.schema == df.schema)
    assert(fenced.orderBy($"id").collect().toSeq ==
      df.orderBy($"id").collect().toSeq)
  }

  test("Par.fanOut pins the configured shuffle parallelism") {
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val df = Par.fanOut(Seq(1, 2, 3).toDF("v"))
    assert(df.rdd.getNumPartitions == n)
  }

  test("events loader truncates nanos to micros") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() == 1000)
    // the legacy nanos flag is scoped to the events read, not the session
    assert(spark.conf.getOption(
      "spark.sql.legacy.parquet.nanosAsLong").forall(_ == "false"))
  }
}
