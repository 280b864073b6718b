package graft.sim

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the planted-skew probe behind the round-8 hot-bucket
  * containment work. Plants `nDup` byte-identical copies of one
  * document under fresh ids — the boilerplate/mirror-page degenerate
  * case, where every copy computes the same shingle set and therefore
  * lands in the SAME band bucket of every band — then runs the full
  * near-dup operator and reports wall time, emitted pairs, and the MAX
  * single-task wall time across every job (the quantity the
  * group-collapse + salting bound: before round 8 the whole planted
  * group's O(nDup²) pair enumeration ran inside ONE task).
  *
  * A control run on the unmodified corpus calibrates both numbers. The
  * planted group's inherent output is C(nDup, 2) pairs at jacc 1.0 —
  * quadratic OUTPUT no algorithm avoids; the probe verifies the
  * ENUMERATION is spread (max task stays near the control's) and the
  * count is exact.
  *
  * Args: [sfDir] [nDup] [threshold] [op: lsh|jacc|ann02]. `jacc` drives
  * the exact prefix-filtered [[JaccardJoin]] instead (round-8 shares the
  * same GroupCollapse containment: a set-identical flood otherwise
  * inflates its own tokens' document frequency and floods the prefix
  * buckets). `ann02` plants nDup copies of one EMBEDDING vector and
  * drives [[graft.ann.Ann.lshBucketNeighbors]] — the round-9 guard:
  * identical vectors agree on every projection sign, so all copies land
  * in ONE of the 256 buckets and the unguarded self-join enumerated
  * their nDup² pairs in a single task. */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nDup = args.lift(1).map(_.toInt).getOrElse(10000)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.7)
    val op = args.lift(3).getOrElse("lsh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val maxTaskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val d = e.taskInfo.duration
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d))
          cur = maxTaskMs.get()
      }
    })

    def run(label: String, thunk: => Long): Unit = {
      maxTaskMs.set(0L)
      val t0 = System.nanoTime()
      val rows = thunk
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s wall ${secs}%7.2f s   max task " +
        f"${maxTaskMs.get() / 1000.0}%6.2f s   rows $rows")
    }

    if (op == "ann02") {
      import graft.ann.Ann
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      run("control (no planted group)",
        Ann.lshBucketNeighbors(emb, "vec_id", "embedding").count())
      val seedVec = emb.orderBy(col("vec_id")).limit(1)
        .collect()(0).getSeq[Float](1)
      val planted = spark.range(nDup)
        .select((col("id") + 10000000000L).as("vec_id"),
          typedLit(seedVec).as("embedding"))
      println(s"planting $nDup identical vectors (all in one bucket; " +
        s"unguarded enumeration = ${nDup.toLong * nDup} pairs, one task)")
      run(s"planted +$nDup identical",
        Ann.lshBucketNeighbors(emb.unionByName(planted),
          "vec_id", "embedding").count())
    } else {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      def pairs(frame: org.apache.spark.sql.DataFrame): Long =
        (if (op == "jacc")
          JaccardJoin.selfJoinWords(frame, "doc_id", "text", 3, threshold)
        else MinHashLSH
          .nearDupPairs(frame, "doc_id", "text", 3, threshold)).count()
      run("control (no planted group)", pairs(docs))
      val seedText = docs.orderBy(col("doc_id")).limit(1)
        .collect()(0).getString(1)
      val planted = spark.range(nDup)
        .select((col("id") + 10000000000L).as("doc_id"),
          lit(seedText).as("text"))
      val expectedWithin = nDup.toLong * (nDup - 1) / 2
      println(s"planting $nDup copies (inherent within-group output = " +
        s"$expectedWithin pairs)")
      run(s"planted +$nDup identical", pairs(docs.unionByName(planted)))
    }
    spark.stop()
  }
}
