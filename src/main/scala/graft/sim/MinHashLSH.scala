package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Fence
import graft.text.TextHash

/** MinHash + banded LSH near-duplicate detection over a text column
  * (shingle → minhash → band → bucket-join → exact-Jaccard verify).
  *
  * Permutations are `(a*h + b) mod p` over the exact base-31 shingle
  * hashes ([[TextHash]]), with fixed public constants — fully
  * deterministic, so the DuckDB oracle replicates the *entire* pipeline
  * (including banding) and the gate checks candidate generation, not just
  * the verified tail.
  *
  * Scale shape: shingling/signatures are per-row expressions; the only
  * shuffles are the band-key self-join (equi-join on (band, key) — the
  * standard LSH bucket join) and the final pair dedup. No driver
  * collection, no quadratic stage: quadratic work is confined inside a
  * bucket, which banding keeps small.
  */
object MinHashLSH {
  /** 4 bands × 6 rows: collision probability 1-(1-J^6)^4 keeps ~98%
    * recall at J=0.93 (the planted-near-dup scale) while halving
    * mid-similarity (J≈0.5) band collisions vs 5-row bands — the
    * candidate volume that dominates verify cost on correlated
    * corpora. */
  val P: Long = 2147483647L
  val NumPerm = 24
  val Bands = 4
  val Rows = 6

  /** Fixed LCG-derived permutation constants (public, shared with the
    * oracle SQL). */
  val permA: IndexedSeq[Long] =
    (1 to NumPerm).map(j => (1103515245L * j + 1013904223L) % P)
      .map(a => if (a == 0L) 1L else a).toIndexedSeq
  val permB: IndexedSeq[Long] =
    (1 to NumPerm).map(j => (2654435761L * j + 12345L) % P).toIndexedSeq

  /** MinHash value for permutation j over a shingle-hash array column. */
  def minhash(sh: Column, j: Int): Column =
    array_min(transform(sh, h => (lit(permA(j)) * h + lit(permB(j))) % P))

  /** Band key b: '_'-joined minhashes of the band's rows. */
  def bandKey(sh: Column, b: Int): Column =
    concat_ws("_",
      (0 until Rows).map(r => minhash(sh, b * Rows + r).cast("string")): _*)

  /** Near-duplicate pairs (idA < idB) with exact Jaccard >= threshold
    * among LSH band-collision candidates. Output: (doc_a, doc_b, jacc). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   q: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = Fence(docs
      .select(col(idCol).as("id"),
        TextHash.charCodes(col(textCol)).as("__codes"))
      .select(col("id"),
        TextHash.shingleHashesFromCodes(col("__codes"), q).as("sh")))
    // pin parallelism: the band frame is tiny in bytes but fans out into
    // the bucket self-join (graft.core.Par scaladoc)
    val bands = graft.core.Par.fanOut(sh.select(col("id"),
      posexplode(array((0 until Bands).map(b => bandKey(col("sh"), b)): _*))
        .as(Seq("band_idx", "band_key"))))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val sa = sh.select(col("id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    val tNum = math.round(threshold * 10)
    cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      // provably-safe size prune before the O(n) intersect: a size ratio
      // below the threshold already bounds Jaccard below it
      .filter(lit(10) * least(size(col("sh_a")), size(col("sh_b"))) >=
        lit(tNum) * greatest(size(col("sh_a")), size(col("sh_b"))))
      .withColumn("jacc", inter.cast("double") / union)
      .filter(col("jacc") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jacc"))
  }

  /** Oracle SQL for [[nearDupPairs]] over table `tbl`, generated from the
    * same constants. */
  def nearDupPairsSql(tbl: String, idCol: String, textCol: String,
                      q: Int = 3, threshold: Double = 0.8): String = {
    val sigExprs = (0 until NumPerm).map { j =>
      s"list_min(list_transform(sh, h -> (${permA(j)} * h + ${permB(j)}) % $P)) AS s$j"
    }.mkString(",\n            ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(s${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band_idx, $key AS band_key FROM sig"
    }.mkString("\n            UNION ALL ")
    s"""WITH sh AS (SELECT $idCol AS id,
            ${TextHash.shingleHashesSql(textCol, q)} AS sh FROM $tbl),
          sig AS (SELECT id, sh, $sigExprs FROM sh),
          bands AS ($bandSelects),
          cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.id < b.id),
          v AS (SELECT doc_a, doc_b,
              len(list_intersect(x.sh, y.sh)) AS inter,
              len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS un
            FROM cand JOIN sh x ON cand.doc_a = x.id
                      JOIN sh y ON cand.doc_b = y.id)
        SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / un AS jacc FROM v
        WHERE CAST(inter AS DOUBLE) / un >= $threshold
        ORDER BY doc_a, doc_b"""
  }
}
