package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog

/** Cataloged shard exports — the missing takedown half of the JSONL
  * trainer handoff (dp08): the one-shot `partitionBy("chunk").json`
  * write shipped documents with no record of WHICH docs landed in
  * WHICH shard files, so a later right-to-erasure request had nothing
  * to even name the stale artifact. This records the export in the
  * catalog at write time and makes takedown reach the shipped JSONL.
  *
  * Layout under one logical export name (the AnnIndex meta-last
  * pattern):
  *   `<export>`          1-row meta (dir, n_shards, n_docs) — written
  *                       LAST, so a crash mid-export reads as "no
  *                       export" instead of a half-recorded one.
  *   `<export>_members`  (id, chunk) membership, partitioned by
  *                       `pk = xxhash64(id) mod MemberPk` — a purge
  *                       request reads ONLY the doomed ids' pk
  *                       directories (kilobytes however large the
  *                       export), the CorpusStream emit-index pattern.
  *
  * Purge ([[purge]]) rewrites ONLY the affected `chunk=` JSONL
  * directories — one dynamic-overwrite job for all of them, plus
  * explicit deletes for shards whose every row was purged — then
  * drops the ids from the membership index. Cost scales with the
  * AFFECTED shards, never the export. Idempotent: a second run (or an
  * id that was never exported) finds no members and is a no-op. A
  * purge against an export whose directory is GONE fails loudly
  * naming the export and the recorded dir — the caller learns which
  * shipped artifact is stale instead of silently "succeeding".
  *
  * Crash contract: the shard rewrite lands BEFORE the membership
  * update, so a crash between them leaves members still naming
  * already-clean shards — the re-run rewrites them to the same bytes
  * (anti-join of already-absent ids) and converges. */
object ShardExport {

  /** Directory-count bound for the membership layout (the
    * [[graft.streaming.CorpusStream.StatePartitions]] rationale). */
  val MemberPk = 64L

  /** Registry of every export this warehouse has shipped — one
    * `name=` partition per export (idempotent: a re-export overwrites
    * its own row), so a compliance takedown can reach EVERYTHING ever
    * exported in one call ([[purgeAll]]) without the operator
    * remembering export names. */
  val RegistryTable = "shard_exports"

  private def membersTableOf(exportTable: String) =
    exportTable + "_members"

  private def memberPkCol(id: org.apache.spark.sql.Column) =
    pmod(xxhash64(id), lit(MemberPk))

  /** Export `assigned` — (id, chunk, payload columns) — as JSONL files
    * partitioned by shard under `outDir` (one `chunk=` directory per
    * shard, the layout a training job reads shard-at-a-time), and
    * record the export in the catalog: pk-bucketed (id, chunk)
    * membership, then the meta row LAST. One partitioned write job
    * per table; no driver-side loop over shards. */
  def exportJsonl(catalog: TableCatalog, assigned: DataFrame,
                  exportTable: String, outDir: String): Unit = {
    catalog.withTableLock(membersTableOf(exportTable)) {
      // the shipped JSONL and the membership index are independent
      // projections of `assigned` into disjoint destinations — write
      // them as concurrent lanes (guide §2.6); the meta row still
      // lands strictly AFTER both (a crash earlier reads as "no
      // export"), so the crash contract is unchanged
      graft.core.Par.concurrently(Seq(
        () => assigned
          .write.partitionBy("chunk").mode("overwrite").json(outDir),
        () => catalog.writePartitioned(
          assigned.select(col("id"),
              col("chunk").cast("long").as("chunk"))
            .withColumn("pk", memberPkCol(col("id"))),
          membersTableOf(exportTable), "pk")))
      val spark = assigned.sparkSession
      import spark.implicits._
      val m = catalog.read(membersTableOf(exportTable))
        .agg(count(lit(1)), countDistinct(col("chunk"))).head()
      catalog.writeFull(
        Seq((outDir, m.getLong(1), m.getLong(0)))
          .toDF("dir", "n_shards", "n_docs"),
        exportTable)
      // registry row LAST: an export is discoverable by purgeAll only
      // once its meta exists (a crash earlier reads as "no export")
      catalog.writePartition(
        Seq((exportTable, outDir)).toDF("name", "dir"),
        RegistryTable, "name", exportTable)
    }
  }

  /** [[purge]] across EVERY export the registry records — the one
    * call a right-to-erasure workflow makes after [[
    * graft.streaming.CorpusStream.removeDocs]] handled the catalog
    * tables. Returns the export names purged (each individually
    * idempotent; an export holding none of the ids is a no-op). */
  def purgeAll(catalog: TableCatalog, ids: DataFrame,
               idCol: String = "id"): Seq[String] = {
    if (!catalog.tableExists(RegistryTable)) Seq.empty
    else {
      val names = catalog.listPartitions(RegistryTable, "name").sorted
      // exports are disjoint (own members table, meta and output dir),
      // so the per-export purges run as concurrent lanes
      graft.core.Par.concurrently(
        names.map(n => () => purge(catalog, n, ids, idCol)))
      names
    }
  }

  /** Remove every given doc id from the exported JSONL shards and the
    * membership index — the takedown propagation path. See the object
    * doc for cost, idempotency and crash contracts. */
  def purge(catalog: TableCatalog, exportTable: String,
            ids: DataFrame, idCol: String = "id"): Unit = {
    require(catalog.tableExists(exportTable),
      s"ShardExport: no export meta at '$exportTable' — nothing to " +
        "purge (a missing meta also covers an export that crashed " +
        "mid-write)")
    val meta = catalog.read(exportTable).collect()(0)
    val dir = meta.getString(meta.fieldIndex("dir"))
    val spark = ids.sparkSession
    // a non-long (or NULL) id would anti-join nothing — a takedown
    // that silently doesn't take down; raise per row instead
    val tryLong = expr(s"try_cast(`$idCol` as bigint)")
    val asLong = when(col(idCol).isNull,
      raise_error(lit("ShardExport: purge id is NULL — it would " +
        "silently match nothing")))
      .when(tryLong.isNull,
        raise_error(concat(lit("ShardExport: purge id '"),
          col(idCol).cast("string"),
          lit("' is not a long — it would silently match nothing"))))
      .otherwise(tryLong)
    val retr = graft.core.Fence.soft(
      ids.select(asLong.as("__r")).distinct())
    try {
      // affected shards via the pk-pruned membership index: read only
      // the doomed ids' buckets, kilobytes of (id, chunk) rows
      val members = membersTableOf(exportTable)
      val pks = retr.select(memberPkCol(col("__r")).as("pk"))
        .distinct().collect().map(_.getLong(0)).map(_.toString)
      val present = catalog.listPartitions(members, "pk").toSet
      val hitPks = pks.filter(present.contains)
      if (hitPks.nonEmpty) {
        val hit = catalog.readPaths(members,
            hitPks.map(catalog.partitionPath(members, "pk", _)))
          .join(retr, col("id") === col("__r"), "left_semi")
        val chunks = hit.select(col("chunk").cast("long")).distinct()
          .collect().map(_.getLong(0))
        if (chunks.nonEmpty) {
          val hConf = spark.sparkContext.hadoopConfiguration
          val root = new org.apache.hadoop.fs.Path(dir)
          val fs = root.getFileSystem(hConf)
          require(fs.exists(root),
            s"ShardExport: export '$exportTable' records shipped " +
              s"JSONL at '$dir' but the directory is gone — the " +
              "exported artifact is STALE and its consumer must be " +
              "notified out of band")
          // one dynamic-overwrite job rewrites every affected shard;
          // materialize first (the rewritten rows must not be read
          // lazily from the files being replaced)
          val paths = chunks.map(c => s"$dir/chunk=$c")
          val keep = spark.read.option("basePath", dir)
            .json(paths: _*)
            .join(retr, col("id") === col("__r"), "left_anti")
            .localCheckpoint(true)
          val surviving = keep
            .select(col("chunk").cast("long")).distinct()
            .collect().map(_.getLong(0)).toSet
          keep.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("chunk").json(dir)
          // a shard whose every row was purged survives a dynamic
          // overwrite untouched — delete it explicitly
          chunks.filterNot(surviving.contains).foreach { c =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$dir/chunk=$c"),
              true)
          }
          // membership after the shards (crash contract above): drop
          // the purged ids from the hit pk partitions only
          catalog.withTableLock(members) {
            val keepM = catalog.readPaths(members,
                hitPks.map(catalog.partitionPath(members, "pk", _)))
              .join(retr, col("id") === col("__r"), "left_anti")
              .withColumn("pk", memberPkCol(col("id")))
              .localCheckpoint(true)
            val survPk = keepM.select(col("pk").cast("string"))
              .distinct().collect().map(_.getString(0)).toSet
            if (survPk.nonEmpty)
              catalog.overwritePartitionsDynamic(keepM, members, "pk")
            hitPks.filterNot(survPk.contains).foreach(
              catalog.deletePartition(members, "pk", _))
            // meta LAST: the recorded (n_shards, n_docs) must describe
            // the artifact as it NOW is — a stale export-time count
            // would silently misstate what was shipped after a purge
            val m2 = catalog.read(members)
              .agg(count(lit(1)), countDistinct(col("chunk"))).head()
            val spark2 = ids.sparkSession
            import spark2.implicits._
            catalog.writeFull(
              Seq((dir, m2.getLong(1), m2.getLong(0)))
                .toDF("dir", "n_shards", "n_docs"),
              exportTable)
          }
        }
      }
    } finally retr.unpersist(false)
  }
}
