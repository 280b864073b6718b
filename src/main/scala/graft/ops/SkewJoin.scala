package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-joins — the manual skew defense for when ONE key
  * dominates a join's shuffle (the hot-customer / empty-string /
  * default-value key): AQE's skew-join split handles sort-merge
  * spills, but a key so hot that a single task cannot hold its build
  * side needs the classic salting rewrite, and having it as a named
  * operator keeps the rewrite CORRECT (the subtle bugs live in the
  * join-type and null handling).
  *
  * The rewrite: the probe (big) side gets a deterministic salt bucket
  * per row; the build (small-per-key but hot) side is replicated once
  * per bucket; the join keys grow the salt column, so the hot key's
  * rows spread over `buckets` tasks instead of one. Row-for-row equal
  * to the plain join BY CONSTRUCTION: each probe row carries exactly
  * one salt value and meets exactly one replica of every matching
  * build row.
  */
object SkewJoin {

  /** Equi-join `left` (probe side, salted) with `right` (build side,
    * replicated ×`buckets`) on `keys`. `saltExpr` must be a
    * deterministic NON-NULL expression over `left`'s columns (a row
    * id, a hash of one) — a NULL salt would silently drop the row
    * from an inner join, so it raises per row instead. Join types are
    * restricted to the ones replication cannot corrupt: `inner` and
    * `left` (an unmatched probe row still appears exactly once;
    * `right`/`full`/`semi`/`anti` would see build-side replicas as
    * distinct unmatched rows — refused). */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     keys: Seq[String], saltExpr: Column,
                     buckets: Int,
                     joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedEquiJoin: need at least one key")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val jt = joinType.toLowerCase
    require(jt == "inner" || jt == "left" || jt == "left_outer",
      s"saltedEquiJoin: join type '$joinType' cannot be salted — " +
        "build-side replication corrupts right/full/semi/anti joins; " +
        "use inner or left")
    require(!left.columns.contains("__salt") &&
      !right.columns.contains("__salt"),
      "saltedEquiJoin: reserved column name '__salt' already present")
    val salted = left.withColumn("__salt",
      when(saltExpr.isNull, raise_error(lit(
        "saltedEquiJoin: NULL salt expression — a null salt would " +
          "silently drop the row")).cast("int"))
        .otherwise(pmod(saltExpr, lit(buckets)).cast("int")))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", jt).drop("__salt")
  }
}
