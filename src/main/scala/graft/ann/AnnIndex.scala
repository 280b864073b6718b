package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog

/** Persisted ANN index artifacts. The fit — the corpus count +
  * [[Ann.autoPlanes]] geometry for the LSH path, the Lloyd rounds of
  * [[Ann.kmeansCentroids]] for IVF — is paid ONCE at build time and
  * written to catalog tables; a serving workload loads the index and
  * probes it, instead of re-paying the fit on every query the way the
  * fit-inline operators ([[Ann.lshBucketNeighborsAuto]],
  * [[Ann.ivfTopK]]) do.
  *
  * Layout under one logical index name:
  *   `<index>`         1-row meta (kind, geometry, dim, fitted-over n).
  *                     Written LAST, so a crash mid-build leaves no
  *                     meta and readers see "no index" instead of a
  *                     half-written artifact.
  *   `<index>_assign`  per-vector rows (id, v, nrm, bucket|cell).
  *                     IVF partitions by `cell` directly (numCells is
  *                     a small constant, and a probe's cell equi-join
  *                     prunes to the probed cells at the storage layer
  *                     via dynamic partition pruning — nprobe/numCells
  *                     of the corpus). LSH buckets number ~n/target —
  *                     one directory per bucket would explode into
  *                     corpus-many tiny files (measured 20 s to build
  *                     and probes SLOWER than the fit at sf0.1) — so
  *                     the LSH layout buckets by
  *                     `pk = pmod(bucket, StatePartitions)`: bounded
  *                     directory count, and a point-lookup still reads
  *                     only its bucket's pk directory.
  *   `<index>_cent`    IVF only: (cell, pos, val) centroid components.
  *
  * Vectors and norms round-trip parquet exactly (doubles are stored
  * bit-for-bit), so a probe over the loaded index is bit-identical to
  * the fit-inline operator over the same corpus — gated by
  * ann07/ann08 against the ann06/ann05 oracles. */
object AnnIndex {

  /** Build + persist the LSH bucket index: fits the plane count to the
    * corpus ([[Ann.autoPlanes]]), buckets every vector, writes the
    * assignment table partitioned by bucket, then the meta row.
    * Returns the fitted plane count. */
  def buildLsh(catalog: TableCatalog, data: DataFrame, idCol: String,
               vecCol: String, indexTable: String,
               targetBucketRows: Int = 1024): Int = {
    val n = data.count()
    val planes = Ann.autoPlanes(n, targetBucketRows)
    val d = data.select(col(idCol).as("id"),
        Ann.checkedVec(Ann.toDouble(col(vecCol))).as("v"))
      .withColumn("nrm", sqrt(Ann.dotUnrolled(col("v"), col("v"))))
      .withColumn("bucket", Ann.bucket(col("v"), planes))
      .withColumn("pk", pmod(col("bucket"), lit(LshPkBuckets)))
    catalog.writePartitioned(d.repartition(col("pk")),
      indexTable + "_assign", "pk")
    writeMeta(catalog, indexTable, "lsh", planes, n)
    planes
  }

  /** Directory-count bound for the LSH assignment layout (the
    * [[graft.streaming.CorpusStream.StatePartitions]] rationale). */
  val LshPkBuckets = 64L

  /** Build + persist the IVF index: trains the coarse quantizer
    * ([[Ann.kmeansCentroids]], `trainIters` deterministic Lloyd
    * rounds), assigns every vector to its nearest cell, writes the
    * centroid table and the cell-partitioned assignment table, then
    * the meta row. */
  def buildIvf(catalog: TableCatalog, data: DataFrame, idCol: String,
               vecCol: String, indexTable: String, numCells: Int = 16,
               trainIters: Int = 0): Unit = {
    val spark = data.sparkSession
    import spark.implicits._
    val d = Ann.withNorms(data, idCol, vecCol)
    val cents = Ann.kmeansCentroids(d, numCells, trainIters)
    val centRows = cents.zipWithIndex.flatMap { case ((v, _), c) =>
      v.zipWithIndex.map { case (x, p) => (c, p, x) }
    }.toSeq
    catalog.writeFull(centRows.toDF("cell", "pos", "val"),
      indexTable + "_cent")
    val assigned = d.withColumn("cell",
      array_max(Ann.centroidScores(cents, col("v"), col("nrm")))
        .getField("cell"))
    catalog.writePartitioned(assigned, indexTable + "_assign", "cell")
    writeMeta(catalog, indexTable, "ivf", numCells, data.count())
  }

  /** Within-bucket top-1 neighbors from a persisted LSH index — the
    * [[Ann.lshBucketNeighborsAuto]] result without the count, the
    * norm pass, or the planes×dim bucketing dots: everything comes
    * off the assignment table. */
  def lshNeighborsFromIndex(catalog: TableCatalog,
                            indexTable: String): DataFrame = {
    requireKind(catalog, indexTable, "lsh")
    Ann.bucketNeighborsFrom(
      graft.core.Fence(catalog.read(indexTable + "_assign")
        .select(col("id"), col("v"), col("nrm"), col("bucket"))),
      Ann.NearDupHotCap, Ann.NearDupHotSalts)
  }

  /** Top-k from a persisted IVF index — the [[Ann.ivfTopK]] result
    * without the Lloyd rounds or the corpus assignment pass: the
    * probe loads the trained centroids (a numCells×dim driver
    * constant, same bound as the broadcast the fit-inline form
    * already pays) and equi-joins the probed cells against the
    * cell-partitioned assignment table. */
  def ivfTopKFromIndex(catalog: TableCatalog, indexTable: String,
                       queries: DataFrame, idCol: String, vecCol: String,
                       k: Int, nprobe: Int = 2): DataFrame = {
    requireKind(catalog, indexTable, "ivf")
    def normOf(v: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val cents = catalog.read(indexTable + "_cent")
      .orderBy(col("cell"), col("pos")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        val v: Seq[Double] = rows.sortBy(_.getInt(1))
          .map(_.getDouble(2)).toSeq
        (v, normOf(v))
      }.toArray
    val assigned = catalog.read(indexTable + "_assign")
      .select(col("id"), col("v"), col("nrm"),
        col("cell").cast("int").as("cell"))
    Ann.ivfProbe(assigned, cents, queries, idCol, vecCol, k, nprobe)
  }

  private def writeMeta(catalog: TableCatalog, indexTable: String,
                        kind: String, geometry: Int, n: Long): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    catalog.writeFull(
      Seq((kind, geometry, Ann.Dim, n)).toDF("kind", "geometry", "dim",
        "fitted_n"),
      indexTable)
  }

  private def requireKind(catalog: TableCatalog, indexTable: String,
                          kind: String): Unit = {
    require(catalog.tableExists(indexTable),
      s"AnnIndex: no index meta at '$indexTable' — build it first " +
        "(a missing meta also covers a build that crashed mid-write)")
    val row = catalog.read(indexTable).collect()(0)
    val k = row.getString(row.fieldIndex("kind"))
    require(k == kind,
      s"AnnIndex: '$indexTable' is a '$k' index, expected '$kind'")
  }
}
