package graft.catalog

import org.apache.spark.sql.DataFrame

/** Versioned tables: every write is a new immutable snapshot, reads
  * time-travel to any retained version — the reproducibility primitive
  * a training pipeline needs ("train run X read corpus snapshot 17",
  * re-readable months later while the table keeps moving). The public
  * lakehouse shape (Delta/Iceberg snapshots) reduced to the engine's
  * catalog primitives:
  *
  * {{{
  * T/v=1/part-*.parquet     immutable snapshot data
  * T/v=2/...
  * T/_current               the COMMIT POINTER (bytes, written last)
  * }}}
  *
  * Commit protocol: the snapshot directory is fully written FIRST,
  * the `_current` pointer flipped LAST — a reader never observes a
  * half-written snapshot, because nothing points at it until the data
  * job has finished. A crash between the two leaves an orphan `v=n`
  * directory that the next write (which re-derives `n` from the
  * pointer, under the table lock) simply overwrites — convergent, no
  * repair step. [[versions]] and [[readAsOf]] trust the pointer, never
  * the directory listing, so orphans are invisible until re-committed.
  *
  * Scale: a snapshot write is one Spark job; the pointer is a
  * bytes-sized marker; [[versions]] is one directory listing;
  * time-travel reads open exactly one snapshot directory (never a
  * union). Storage is bounded by [[vacuum]], which drops the oldest
  * snapshots but NEVER the current one; a time-travel read of a
  * vacuumed version fails loudly naming the retention decision rather
  * than serving a silently-wrong newer snapshot.
  */
object Versioned {

  private val CurrentMarker = "_current"

  /** The committed version the table currently serves; None when no
    * commit has ever completed. An unparseable pointer is a damaged
    * commit record and fails loudly — degrading it to "absent" would
    * silently un-version a table that has committed data. */
  def currentVersion(catalog: TableCatalog, table: String): Option[Long] =
    catalog.readMarker(table, CurrentMarker).map { s =>
      s.trim.toLongOption.filter(_ >= 1).getOrElse(
        throw new IllegalStateException(
          s"Versioned: damaged commit pointer for '$table' " +
            s"(content: '${s.trim.take(32)}') — restore $CurrentMarker " +
            "to the last known good version"))
    }

  /** Commit `df` as the table's next snapshot; returns the committed
    * version (1 for a fresh table). Data first, pointer last, under
    * the table lock — concurrent writers serialize, readers never see
    * a partial snapshot. */
  def write(catalog: TableCatalog, df: DataFrame, table: String): Long =
    catalog.withTableLock(table) {
      val next = currentVersion(catalog, table).getOrElse(0L) + 1
      df.write.mode("overwrite")
        .parquet(catalog.partitionPath(table, "v", next.toString))
      catalog.writeMarker(table, CurrentMarker, next.toString)
      next
    }

  /** Read the current snapshot. */
  def read(catalog: TableCatalog, table: String): DataFrame =
    readAsOf(catalog, table,
      currentVersion(catalog, table).getOrElse(
        throw new IllegalArgumentException(
          s"Versioned: no committed version for '$table'")))

  /** Time-travel read of a specific committed version. Uncommitted
    * (orphaned or never-written) and vacuumed versions are refused
    * loudly. */
  def readAsOf(catalog: TableCatalog, table: String,
               version: Long): DataFrame = {
    val cur = currentVersion(catalog, table).getOrElse(
      throw new IllegalArgumentException(
        s"Versioned: no committed version for '$table'"))
    require(version >= 1 && version <= cur,
      s"Versioned: version $version of '$table' is not committed " +
        s"(current: $cur)")
    if (!catalog.partitionHasDataFiles(table, "v", version.toString))
      throw new IllegalArgumentException(
        s"Versioned: version $version of '$table' was vacuumed — " +
          s"retained versions: ${versions(catalog, table).mkString(", ")}")
    catalog.spark.read
      .parquet(catalog.partitionPath(table, "v", version.toString))
  }

  /** Committed versions still on disk, ascending — the directory
    * listing intersected with the commit pointer (an orphan `v=` dir
    * beyond the pointer is a crashed uncommitted write, not a
    * version). */
  def versions(catalog: TableCatalog, table: String): Seq[Long] = {
    val cur = currentVersion(catalog, table).getOrElse(return Seq.empty)
    catalog.listPartitions(table, "v")
      .flatMap(_.toLongOption).filter(v => v >= 1 && v <= cur).sorted
  }

  /** Roll the table back to an older snapshot — as a NEW committed
    * version whose content is the old snapshot (the public RESTORE
    * shape: history is preserved, never rewritten, so the bad
    * versions stay inspectable and the restore itself is one more
    * auditable commit). Returns the new version. Restoring a
    * vacuumed or uncommitted version fails loudly via [[readAsOf]]. */
  def restore(catalog: TableCatalog, table: String,
              toVersion: Long): Long =
    write(catalog, readAsOf(catalog, table, toVersion), table)

  /** What changed between two snapshots, by key: one row per key that
    * was `added` (in new only), `removed` (in old only) or `changed`
    * (in both, any non-key column differs — null-safe comparison) —
    * the audit primitive behind "what moved between corpus snapshot
    * 17 and 18" without re-reading either side twice. One full-outer
    * equi-join on the keys; unchanged keys drop out. Output: the key
    * columns + `op`. */
  def diff(catalog: TableCatalog, table: String, vOld: Long,
           vNew: Long, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val o = readAsOf(catalog, table, vOld)
    val n = readAsOf(catalog, table, vNew)
    require(o.columns.toSeq == n.columns.toSeq,
      s"Versioned: snapshot schemas differ between v$vOld " +
        s"(${o.columns.mkString(",")}) and v$vNew " +
        s"(${n.columns.mkString(",")})")
    val nonKey = o.columns.filterNot(keyCols.contains).toSeq
    def payload(df: DataFrame, as: String) = {
      val p = if (nonKey.isEmpty) lit(0) // keys-only: presence diff
              else struct(nonKey.map(col): _*)
      df.select(keyCols.map(col) :+ p.as(as): _*)
    }
    payload(o, "__o").join(payload(n, "__n"), keyCols, "full_outer")
      .withColumn("op",
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(!(col("__o") <=> col("__n")), "changed"))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) :+ col("op"): _*)
  }

  /** MERGE a change batch into the current snapshot and commit the
    * result as the next version — the public copy-on-write upsert
    * shape (Delta/Iceberg `MERGE INTO` reduced to the engine's
    * snapshot primitives). `source` rows upsert by `keyCols`; with
    * `opCol` each row says what it is: `upsert` replaces-or-inserts,
    * `delete` removes the matching key (non-key columns ignored; an
    * unmatched delete is a no-op, the Delta WHEN-MATCHED contract).
    *
    * Refused loudly, never applied silently: a missing target table
    * (merge needs a committed snapshot to merge INTO), a source whose
    * upsert columns don't line up with the target's, a key that
    * appears twice in the source (which row wins would be arbitrary —
    * the ambiguous-merge refusal), a NULL key (it would anti-join
    * nothing and "merge" rows no read could find), and a NULL or
    * unknown op (the `!isin` NULL trap — a dropped CDC row).
    *
    * Scale shape: one equi-anti-join of the current snapshot against
    * the (broadcast-able, batch-sized) source key set plus a union —
    * the snapshot rewrite is one Spark job, and history stays
    * time-travelable: the pre-merge snapshot remains readable, so the
    * merge is auditable with [[diff]]. Returns the committed version.
    */
  def merge(catalog: TableCatalog, table: String, source: DataFrame,
            keyCols: Seq[String], opCol: Option[String] = None): Long = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val cur = read(catalog, table)
    keyCols.foreach { k =>
      require(cur.columns.contains(k) && source.columns.contains(k),
        s"Versioned.merge: key column '$k' must exist in both the " +
          s"target (${cur.columns.mkString(",")}) and the source " +
          s"(${source.columns.mkString(",")})")
    }
    opCol.foreach { oc =>
      require(source.columns.contains(oc),
        s"Versioned.merge: op column '$oc' not in source " +
          s"(${source.columns.mkString(",")})")
      val bad = source.filter(col(oc).isNull ||
        !col(oc).isin("upsert", "delete"))
      if (!bad.isEmpty)
        throw new IllegalArgumentException(
          s"Versioned.merge: op column '$oc' holds values other than " +
            "'upsert'/'delete' (NULL included) — a row with an " +
            "unknown op would be silently dropped; fix the batch")
    }
    // NULL keys would anti-join nothing: raise per row, before any
    // key is used in a join.
    val checkedKeys = keyCols.map { k =>
      when(col(k).isNull, raise_error(lit(
        s"Versioned.merge: NULL value in key column '$k' — a null " +
          "key matches nothing and cannot be merged"))
        .cast(source.schema(k).dataType))
        .otherwise(col(k)).as(k)
    }
    val srcChecked = source.select(
      checkedKeys ++ source.columns.filterNot(keyCols.contains)
        .map(col).toSeq: _*)
    // A key appearing twice makes the merge ambiguous — refuse.
    val dup = srcChecked.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1)
      .collect()
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        "Versioned.merge: source holds multiple rows for key (" +
          keyCols.zipWithIndex.map { case (k, i) =>
            s"$k=${dup.head.get(i)}" }.mkString(", ") +
          ") — which row wins would be arbitrary; dedup the batch first")
    val upserts = opCol.map(oc => srcChecked.filter(col(oc) === "upsert")
        .drop(oc)).getOrElse(srcChecked)
    require(upserts.columns.sorted.toSeq == cur.columns.sorted.toSeq,
      s"Versioned.merge: source upsert columns " +
        s"(${upserts.columns.sorted.mkString(",")}) don't match the " +
        s"target's (${cur.columns.sorted.mkString(",")})")
    val srcKeys = srcChecked.select(keyCols.map(col): _*).distinct()
    val kept = cur.join(broadcast(srcKeys), keyCols, "left_anti")
    write(catalog, kept.unionByName(
      upserts.select(cur.columns.map(col).toSeq: _*)), table)
  }

  /** Every retained snapshot, tagged `version`, under the UNIFIED
    * schema — the audit read that works across schema evolution
    * (snapshots are immutable directories, so each keeps the schema
    * it was written with; a column added in v3 reads as NULL for v1/v2
    * rows). Column order is first-seen (ascending version); a column
    * whose TYPE differs between snapshots is refused loudly — a
    * silent cast would rewrite history. Bounded by the retained
    * version count (one metadata listing + one read per snapshot,
    * unioned — never a directory glob that would sweep in orphans).
    */
  def readHistory(catalog: TableCatalog, table: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val vs = versions(catalog, table)
    require(vs.nonEmpty, s"Versioned: no committed version for '$table'")
    val frames = vs.map(v => v -> readAsOf(catalog, table, v))
    // unified schema, first-seen order; type drift refused
    val unified = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.DataType]
    frames.foreach { case (v, df) =>
      df.schema.fields.foreach { f =>
        unified.get(f.name) match {
          case None => unified(f.name) = f.dataType
          case Some(t) => require(t == f.dataType,
            s"Versioned.readHistory: column '${f.name}' changed type " +
              s"across snapshots of '$table' ($t vs ${f.dataType} at " +
              s"v$v) — a silent cast would rewrite history")
        }
      }
    }
    frames.map { case (v, df) =>
      val cols = lit(v).as("version") +: unified.toSeq.map {
        case (name, dt) =>
          if (df.columns.contains(name)) col(name)
          else lit(null).cast(dt).as(name)
      }
      df.select(cols: _*)
    }.reduce(_.unionByName(_))
  }

  /** Drop all but the newest `keepLast` committed snapshots; returns
    * the versions dropped. The current version is never dropped
    * (`keepLast >= 1` enforced); a later [[readAsOf]] of a dropped
    * version fails loudly naming the retention. Runs under the table
    * lock so a concurrent writer can't commit between the listing and
    * the deletes. */
  def vacuum(catalog: TableCatalog, table: String,
             keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    catalog.withTableLock(table) {
      val vs = versions(catalog, table)
      val drop = vs.dropRight(keepLast)
      drop.foreach(v => catalog.deletePartition(table, "v", v.toString))
      drop
    }
  }
}
