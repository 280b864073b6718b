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

  /** Signature-agreement floor for the estimated-Jaccard pre-filter:
    * candidates whose signatures agree on fewer than
    * ceil((threshold − 0.05)·NumPerm) of the NumPerm minhashes skip the
    * exact verify. A band collision already fixes Rows=6 agreeing
    * permutations, so the prune bites on the other 18: at t=0.8 the
    * floor is 18/24, a true J=0.8 pair fails with
    * P[6 + Binom(18,.8) < 18] ≈ 4% (on top of LSH's own ~30% miss rate
    * at exactly t — this is an approximate operator), a planted J≈0.93
    * near-dup with ≈0.1%, while ~85% of the J≈0.55 collision tail (the
    * verify cost driver on correlated corpora) is dropped before
    * touching full shingle arrays. The oracle SQL applies the identical
    * integer count, so the gate stays exact. */
  def minAgree(threshold: Double): Int =
    math.ceil((threshold - 0.05) * NumPerm).toInt

  /** Near-duplicate pairs (idA < idB) with exact Jaccard >= threshold
    * among LSH band-collision candidates. Output: (doc_a, doc_b, jacc).
    *
    * Verify is two-staged for scale: candidates first meet over the
    * NumPerm-element signatures (fixed 24 longs/row — cheap to shuffle
    * at any corpus size) and only signature-agreement survivors join the
    * full shingle arrays for the exact intersect. This keeps the wide
    * arrays out of the candidate-volume join entirely. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   q: Int = 3, threshold: Double = 0.8): DataFrame = {
    // Shingles + all NumPerm signatures in one JIT mapPartitions pass
    // (the ts04/ts05 precedent): the Column form runs 24 interpreted HOF
    // transforms over ~n-element shingle arrays per row — the dominant
    // cost of the whole query (~40% at sf0.1). Identical integer math:
    // codepoint mod 257, base-31 q-gram polynomial, first-occurrence
    // distinct, (a*h+b) mod P minima; null text → null row, short text →
    // empty shingles and null signature elements, exactly like
    // [[TextHash.shingleHashesFromCodes]] + [[minhash]] (pinned by
    // TextSimSpec). The oracle SQL is unchanged.
    val all = Fence(signatureFrame(docs, idCol, textCol, q))
    val bands = bandFrame(all)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    verifyCandidates(cand, all, threshold)
  }

  /** Banding stage over a [[signatureFrame]]: (id, band_idx, band_key).
    * Exposed so incremental pipelines can band new docs against STORED
    * band frames instead of recomputing the seen corpus's signatures
    * per batch ([[graft.streaming.CorpusStream]]). Parallelism is
    * pinned: the band frame is tiny in bytes but fans out into the
    * bucket join (graft.core.Par scaladoc). */
  def bandFrame(sigFrame: DataFrame): DataFrame = {
    def bandKey(b: Int): Column = concat_ws("_",
      (0 until Rows).map(r =>
        element_at(col("sig"), b * Rows + r + 1).cast("string")): _*)
    graft.core.Par.fanOut(sigFrame.select(col("id"),
      posexplode(array((0 until Bands).map(bandKey): _*))
        .as(Seq("band_idx", "band_key"))))
  }

  /** Two-staged exact verify over candidate id-pairs and their
    * [[signatureFrame]] rows: the provably-safe size prune and the
    * signature-agreement floor run over the fixed-width (n, sig)
    * columns first (cheap to shuffle at any corpus size), and only
    * survivors touch the full shingle arrays in the shared
    * [[SetVerify]] merge kernel. Scores, threshold semantics and the
    * oracle SQL are identical to the inline form this was factored
    * from. */
  def verifyCandidates(cand: DataFrame, sigFrame: DataFrame,
                       threshold: Double): DataFrame = {
    val sh = sigFrame.select(col("id"), col("sh"))
    val sig = sigFrame.select(col("id"), col("n"), col("sig"))
    val tNum = math.round(threshold * 10)
    val ga = sig.select(col("id").as("doc_a"), col("n").as("n_a"),
      col("sig").as("sig_a"))
    val gb = sig.select(col("id").as("doc_b"), col("n").as("n_b"),
      col("sig").as("sig_b"))
    val agree = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
    val survivors = cand.join(ga, Seq("doc_a")).join(gb, Seq("doc_b"))
      // provably-safe size prune: a size ratio below the threshold
      // already bounds Jaccard below it
      .filter(lit(10) * least(col("n_a"), col("n_b")) >=
        lit(tNum) * greatest(col("n_a"), col("n_b")))
      .filter(agree >= minAgree(threshold))
      .select(col("doc_a"), col("doc_b"))
    SetVerify.jaccard(survivors, sh, threshold)
  }

  /** Kernel twin of shingling + [[minhash]]: one pass per row computing
    * (id, distinct q-gram shingle hashes, their count, the NumPerm
    * minhash signature). Exposed for the TextSimSpec pin against the
    * Column form. */
  def signatureFrame(docs: DataFrame, idCol: String, textCol: String,
                     q: Int): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType,
      StructField, StructType}
    val base = docs.select(col(idCol).as("id"),
      col(textCol).cast("string").as("__t"))
    val schema = StructType(Seq(base.schema.head,
      StructField("sh", ArrayType(LongType, true), true),
      StructField("n", IntegerType, true),
      StructField("sig", ArrayType(LongType, true), true)))
    val pow = TextHash.pow31.toArray
    val cm = TextHash.CodeMod
    val pa = permA.toArray
    val pb = permB.toArray
    base.mapPartitions { rows =>
      rows.map { r =>
        val txt = if (r.isNullAt(1)) null else r.getString(1)
        if (txt == null)
          org.apache.spark.sql.Row(r.get(0), null, null, null)
        else {
          val cps = txt.codePoints().toArray
          val seen = new java.util.LinkedHashSet[java.lang.Long]()
          var i = 0
          while (i + q <= cps.length) {
            var h = 0L; var j = 0
            while (j < q) {
              h += cps(i + j).toLong % cm * pow(q - 1 - j); j += 1
            }
            seen.add(h); i += 1
          }
          val sh = new Array[Long](seen.size)
          val it = seen.iterator(); var k = 0
          while (it.hasNext) { sh(k) = it.next(); k += 1 }
          // minhash of an empty shingle set is null (array_min([]))
          val sig: Array[java.lang.Long] =
            if (sh.isEmpty) Array.fill[java.lang.Long](NumPerm)(null)
            else {
              val out = new Array[java.lang.Long](NumPerm)
              var jj = 0
              while (jj < NumPerm) {
                var m = Long.MaxValue; var x = 0
                while (x < sh.length) {
                  val v = (pa(jj) * sh(x) + pb(jj)) % P
                  if (v < m) m = v
                  x += 1
                }
                out(jj) = m; jj += 1
              }
              out
            }
          org.apache.spark.sql.Row(r.get(0), sh, sh.length, sig)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
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
    val tNum = math.round(threshold * 10)
    val agreeSum = (0 until NumPerm)
      .map(j => s"(CASE WHEN x.s$j = y.s$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH sh AS (SELECT $idCol AS id,
            ${TextHash.shingleHashesSql(textCol, q)} AS sh FROM $tbl),
          sig AS (SELECT id, sh, $sigExprs FROM sh),
          bands AS ($bandSelects),
          cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.id < b.id),
          est AS (SELECT doc_a, doc_b
            FROM cand JOIN sig x ON cand.doc_a = x.id
                      JOIN sig y ON cand.doc_b = y.id
            WHERE 10 * least(len(x.sh), len(y.sh)) >=
                    $tNum * greatest(len(x.sh), len(y.sh))
              AND ($agreeSum) >= ${minAgree(threshold)}),
          v AS (SELECT doc_a, doc_b,
              len(list_intersect(x.sh, y.sh)) AS inter,
              len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS un
            FROM est JOIN sh x ON est.doc_a = x.id
                     JOIN sh y ON est.doc_b = y.id)
        SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / un AS jacc FROM v
        WHERE CAST(inter AS DOUBLE) / un >= $threshold
        ORDER BY doc_a, doc_b"""
  }
}
