package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType,
  LongType, ShortType, StructField, StructType}

/** Shared exact-Jaccard verify kernels for the set-similarity operators
  * ([[MinHashLSH]], [[JaccardJoin]]): candidate id-pairs join their
  * shingle-hash arrays declaratively (AQE picks broadcast or shuffle by
  * size), then an allocation-free kernel iterates the join's raw
  * InternalRows — UnsafeRow array fields are zero-copy views, each
  * doc's array is copied+sorted once per partition (memoized by id),
  * and each pair is a linear merge-count.
  *
  * Why not the obvious forms, both measured at sf0.1:
  *  - Column `array_intersect` builds a hash set per evaluation
  *    (~24 µs/pair — the dominant stage on a correlated corpus whose
  *    agreement/prefix filters pass ~100k sub-threshold candidates),
  *    and its threshold filter must be fenced away from the join
  *    condition or the intersect runs twice per pair;
  *  - a typed-Dataset kernel deserializes both ~4 KB arrays per pair —
  *    gigabytes of garbage that GC-couple the query to full-run JVM
  *    pressure (dd07 measured 9.4 s under a 113-query run vs 2 s
  *    isolated; the j05 lesson).
  * Intersection size is order-independent and the jaccard division
  * takes the identical int operands, so scores and the oracle SQL are
  * unchanged by kernelization.
  *
  * The kernels key their per-partition caches on the id cast to long,
  * so ids MUST be integral — a string id would cast to null and every
  * pair would be silently skipped. [[requireIntegralIds]] fails fast at
  * plan time instead.
  */
private[graft] object SetVerify {

  /** Linear merge-count of two SORTED arrays — the intersection size
    * both the distributed kernel and the driver-side verify fast path
    * ([[graft.streaming.CorpusStream]]) share, so the two paths
    * cannot drift. */
  private[graft] def sortedIntersect(x: Array[Long],
                                     y: Array[Long]): Int = {
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    inter
  }

  /** Bottom-k sampled-Jaccard counts over two PRESORTED bottom-k
    * sketches: (intersection, taken) over the k smallest distinct
    * union values — shared by the distributed [[samplePrune]] kernel
    * and the driver-side fast path. */
  private[graft] def bottomKInterTaken(x: Array[Long], y: Array[Long],
                                       k: Int): (Int, Int) = {
    var i = 0; var j = 0; var taken = 0; var inter = 0
    while (taken < k && (i < x.length || j < y.length)) {
      if (i < x.length && j < y.length && x(i) == y(j)) {
        inter += 1; taken += 1; i += 1; j += 1
      } else if (j >= y.length || (i < x.length && x(i) < y(j))) {
        taken += 1; i += 1
      } else {
        taken += 1; j += 1
      }
    }
    (inter, taken)
  }

  /** The kernels join and memoize on `id` cast to long; any non-integral
    * id type (string, decimal, …) casts to null and would make the
    * operator silently return empty results. Fail at plan-build time
    * with the remedy named. */
  def requireIntegralIds(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == LongType || dt == IntegerType || dt == ShortType ||
          dt == ByteType,
        s"set-similarity verify: id column '$c' must be integral " +
          s"(byte/short/int/long), got ${dt.simpleString} — map your " +
          "ids to a dense integer key (e.g. monotonically_increasing_id" +
          " + join back) before the near-dup operator")
    }

  /** Exact Jaccard over candidate pairs: join `sh(id, sh)` onto
    * `cand(doc_a, doc_b)` and keep pairs with jacc >= threshold.
    * Output: (doc_a LONG, doc_b LONG, jacc DOUBLE). */
  def jaccard(cand: DataFrame, sh: DataFrame,
              threshold: Double): DataFrame = {
    requireIntegralIds(cand, "doc_a", "doc_b")
    requireIntegralIds(sh, "id")
    val spark = cand.sparkSession
    val sa = sh.select(col("id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("id").as("doc_b"), col("sh").as("sh_b"))
    val joined = cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("sh_a"), col("sh_b"))
    val verified = joined.queryExecution.toRdd.mapPartitions { it =>
      val sortedCache = new java.util.HashMap[Long, Array[Long]]()
      it.flatMap { row =>
        if (row.isNullAt(0) || row.isNullAt(1) ||
            row.isNullAt(2) || row.isNullAt(3)) Iterator.empty
        else {
          val da = row.getLong(0); val db = row.getLong(1)
          def sortedOf(id: Long, ord: Int): Array[Long] = {
            var s = sortedCache.get(id)
            if (s == null) {
              s = row.getArray(ord).toLongArray()
              java.util.Arrays.sort(s)
              sortedCache.put(id, s)
            }
            s
          }
          val x = sortedOf(da, 2); val y = sortedOf(db, 3)
          val inter = sortedIntersect(x, y)
          val union = x.length + y.length - inter
          val jacc = inter.toDouble / union
          if (jacc >= threshold)
            Iterator.single(org.apache.spark.sql.Row(da, db, jacc))
          else Iterator.empty
        }
      }
    }
    spark.createDataFrame(verified, StructType(Seq(
      StructField("doc_a", LongType, false),
      StructField("doc_b", LongType, false),
      StructField("jacc", DoubleType, false))))
  }

  /** Bottom-k sampled-Jaccard prune — the cascade stage between the
    * fixed-width signature floor and the full-array exact verify.
    * `sb(id, sb)` carries each doc's k smallest shingle hashes, sorted
    * ascending. For a pair, the k smallest distinct values of
    * `sb_a ∪ sb_b` are exactly the k smallest of the two docs' full
    * shingle union (any of the union's k smallest that belongs to A is
    * among A's k smallest), and membership in both sketches decides
    * membership in the intersection for those values — the classical
    * bottom-k Jaccard estimator, computed by one O(k) merge of two
    * presorted arrays. Pairs with estimate < `floor` are dropped before
    * their full arrays are ever joined.
    *
    * The estimate is a deterministic rational (inter/taken in doubles,
    * identical operands in the oracle SQL), exact whenever the union
    * has ≤ k elements (short docs carry no sampling noise), and its
    * sampling std at larger unions is √(J(1−J)/k) shrunk by the
    * finite-population factor — calibrated in COVERAGE against the
    * corpus's J histogram. Output: surviving (doc_a LONG, doc_b LONG).
    */
  def samplePrune(cand: DataFrame, sb: DataFrame, floor: Double,
                  k: Int): DataFrame = {
    requireIntegralIds(cand, "doc_a", "doc_b")
    requireIntegralIds(sb, "id")
    val spark = cand.sparkSession
    val sa = sb.select(col("id").as("doc_a"), col("sb").as("sb_a"))
    val sbb = sb.select(col("id").as("doc_b"), col("sb").as("sb_b"))
    val joined = cand.join(sa, Seq("doc_a")).join(sbb, Seq("doc_b"))
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("sb_a"), col("sb_b"))
    val kept = joined.queryExecution.toRdd.mapPartitions { it =>
      val cache = new java.util.HashMap[Long, Array[Long]]()
      it.flatMap { row =>
        if (row.isNullAt(0) || row.isNullAt(1) ||
            row.isNullAt(2) || row.isNullAt(3)) Iterator.empty
        else {
          val da = row.getLong(0); val db = row.getLong(1)
          def arrOf(id: Long, ord: Int): Array[Long] = {
            var s = cache.get(id)
            if (s == null) {
              s = row.getArray(ord).toLongArray() // presorted ascending
              cache.put(id, s)
            }
            s
          }
          val x = arrOf(da, 2); val y = arrOf(db, 3)
          val (inter, taken) = bottomKInterTaken(x, y, k)
          if (taken > 0 && inter.toDouble / taken >= floor)
            Iterator.single(org.apache.spark.sql.Row(da, db))
          else Iterator.empty
        }
      }
    }
    spark.createDataFrame(kept, StructType(Seq(
      StructField("doc_a", LongType, false),
      StructField("doc_b", LongType, false))))
  }
}
