package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Fence
import graft.text.TextHash

/** 32-bit SimHash near-duplicate detection over whitespace tokens.
  *
  * Per doc: token hashes (exact base-31 — [[TextHash]]), per-bit weight
  * = Σ tokens (2·bit − 1), simhash bit j set iff weight_j > 0. Candidate
  * pairs come from an exact pigeonhole: the 32 bits split into 4 8-bit
  * chunks, and any pair with Hamming distance <= 3 must agree on at
  * least one whole chunk — so the chunk-equality equi-join loses no
  * qualifying pair. Verification is `bit_count(xor) <= 3`.
  *
  * All-expression per-row compute; shuffles are the chunk bucket join
  * and pair dedup — same scale shape as MinHash-LSH.
  */
object SimHash {
  val Bits = 32
  val Chunks = 4
  val ChunkBits = 8
  val MaxHamming = 3

  /** 32-bit simhash over a *materialized* token-hash array column (the
    * 32 per-bit aggregates re-evaluate their input per reference —
    * interpreted higher-order functions — so the token hashing must be
    * computed once in a prior projection, not inlined 32 times). */
  def simhashFromTokenHashes(th: Column): Column =
    (0 until Bits).map { j =>
      val weight = aggregate(th, lit(0L),
        (acc, h) => acc + shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1)
      when(weight > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One-shot convenience form for short texts / tests. */
  def simhash(text: Column): Column =
    simhashFromTokenHashes(TextHash.tokenHashes32(text))

  /** Oracle SQL rendering of [[simhash]] over SQL expression `e` naming a
    * precomputed token-hash list. */
  def simhashSql(th: String): String =
    (0 until Bits).map { j =>
      s"""(CASE WHEN list_aggregate(list_transform($th,
          h -> ((h >> $j) & 1) * 2 - 1), 'sum') > 0
          THEN ${1L << j} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** Kernel twin of [[simhash]]: one pass over the tokens accumulating
    * all 32 bit-weights at once, vs 32 interpreted `aggregate` HOFs per
    * row in the Column form. Identical math ([[TextHash.charHashStr]] is
    * the pinned plain-Scala mirror of `charHash`); a null text yields 0
    * exactly like the Column form (null weights fall to the `otherwise`
    * branch of every bit term). Pinned to the Column form by
    * TextSimSpec. */
  def simhashFrame(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val base = docs.select(col(idCol).as("id"),
      col(textCol).cast("string").as("__t"))
    val schema = StructType(Seq(base.schema.head,
      StructField("sim", LongType, true)))
    base.mapPartitions { rows =>
      rows.map { r =>
        val txt = if (r.isNullAt(1)) null else r.getString(1)
        val sim: Long =
          if (txt == null) 0L
          else {
            val toks = txt.split(" ", -1)
            val w = new Array[Long](Bits)
            var t = 0
            while (t < toks.length) {
              val h = TextHash.charHashStr(toks(t)) % 4294967296L
              var j = 0
              while (j < Bits) {
                w(j) += ((h >> j) & 1L) * 2 - 1
                j += 1
              }
              t += 1
            }
            var s = 0L; var j = 0
            while (j < Bits) { if (w(j) > 0) s |= 1L << j; j += 1 }
            s
          }
        org.apache.spark.sql.Row(r.get(0), sim)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Near-dup pairs (doc_a < doc_b) with Hamming distance <= maxHamming.
    * Output: (doc_a, doc_b, hamming). */
  def nearDupPairs(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val sh = Fence(simhashFrame(docs, idCol, textCol))
    val chunks = graft.core.Par.fanOut(sh.select(col("id"), col("sim"),
      posexplode(array((0 until Chunks).map { c =>
        shiftright(col("sim"), c * ChunkBits).bitwiseAND(lit(255L))
      }: _*)).as(Seq("chunk_idx", "chunk_val"))))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
              col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= MaxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Naive-quadratic oracle SQL — exact same pairs by the pigeonhole
    * argument. */
  def nearDupPairsSql(tbl: String, idCol: String, textCol: String): String =
    s"""WITH th AS (SELECT $idCol AS id,
            ${TextHash.tokenHashes32Sql(textCol)} AS th FROM $tbl),
          sh AS (SELECT id, ${simhashSql("th")} AS sim FROM th)
        SELECT a.id AS doc_a, b.id AS doc_b,
          CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
        FROM sh a JOIN sh b ON a.id < b.id
        WHERE bit_count(xor(a.sim, b.sim)) <= $MaxHamming
        ORDER BY doc_a, doc_b"""
}
