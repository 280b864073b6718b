package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * `dedupKeepLast` generalizes pandas `drop_duplicates(subset, keep='last')`
  * (reference: /root/reference/assos_validation_retreatment.py:106), whose
  * semantics depend on implicit row order. Spark has no implicit order, so
  * the caller names an explicit ordering column (batch timestamp, priority,
  * file order) — SURVEY §7.4(1).
  *
  * At scale this is a single hash-shuffle on `keys` (window partitionBy);
  * no driver collection, skew-safe under AQE.
  */
object Dedup {

  /** Keep, per key group, the single row with the greatest `order` value
    * (ties broken by `tieBreak` ascending so the result is deterministic).
    */
  def dedupKeepLast(df: DataFrame, keys: Seq[String], order: Column,
                    tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.desc, tieBreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup: group rows by a fingerprint of `contentCol`,
    * keep the representative with the smallest `idCol`. One shuffle on the
    * fingerprint; at 100 TB the md5 keys distribute uniformly (no skew).
    */
  def exactDedup(df: DataFrame, contentCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(contentCol)).orderBy(idCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
