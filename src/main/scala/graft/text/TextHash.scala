package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text hashing shared by the dedup / similarity operators
  * (MinHash-LSH, SimHash, n-gram Jaccard — SURVEY north-star LLM ops).
  *
  * All hashes are base-31 polynomial arithmetic over character codes in
  * exact Int64 — deliberately *not* an engine hash function, so the DuckDB
  * oracle can evaluate the same formula bit-for-bit. Every builder has a
  * Column form and a SQL-text form generated from the same constants: one
  * source of truth on both sides of the correctness gate.
  *
  * Scale: everything here is a pure expression (whole-stage codegen, no
  * UDF, no shuffle). Character codes are reduced mod the prime 257 before
  * the polynomial accumulation: `ascii` returns the full Unicode codepoint
  * (up to 0x10FFFF) in both engines, and an unreduced codepoint times
  * 31^11 overflows Int64 — Spark would wrap silently while DuckDB errors,
  * so CJK/emoji/accented text would desync the oracle. Mod 257 leaves all
  * single-byte codes (0-255) untouched and bounds the 12-term sum at
  * 256 * (31^12-1)/30 < 2^63, keeping both engines exact on any input.
  */
object TextHash {

  /** 31^k for k <= 11. */
  val pow31: IndexedSeq[Long] =
    Iterator.iterate(1L)(_ * 31).take(12).toIndexedSeq

  val MaxChars = 12

  /** Codepoint-reduction prime: > 255 so Latin-1 codes pass through,
    * small enough that every polynomial sum here stays within Int64. */
  val CodeMod = 257L

  /** Base-31 hash of (the first 12 chars of) a short string. Out-of-range
    * positions contribute 0 — `ascii('') = 0` in both engines — so short
    * strings hash consistently. */
  def charHash(c: Column): Column =
    (0 until MaxChars).map { i =>
      ascii(c.substr(lit(i + 1), lit(1))).cast("bigint") % lit(CodeMod) *
        lit(pow31(MaxChars - 1 - i))
    }.reduce(_ + _)

  /** Plain-Scala mirror of [[charHash]], for connector stubs that run
    * inside `mapPartitions` (no Column in scope) but still need outputs
    * the DuckDB oracle can recompute via [[charHashSql]]. Code points
    * (not UTF-16 chars) match both engines' `ascii(substring(s,i,1))`. */
  def charHashStr(s: String): Long = {
    val cps = s.codePoints().toArray
    (0 until MaxChars).map { i =>
      val code = if (i < cps.length) cps(i).toLong % CodeMod else 0L
      code * pow31(MaxChars - 1 - i)
    }.sum
  }

  /** DuckDB rendering of [[charHash]] over SQL expression `e` (ascii is
    * INT32 there and errors on overflow — hence the BIGINT cast). */
  def charHashSql(e: String): String =
    (0 until MaxChars).map { i =>
      s"ascii(substring($e, ${i + 1}, 1))::BIGINT % $CodeMod * " +
        s"${pow31(MaxChars - 1 - i)}"
    }.mkString("(", " + ", ")")

  /** Character codes of a text column as an int array. Used to
    * materialize codes ONCE per row (`withColumn`) before windowed
    * hashing: higher-order functions are interpreted (CodegenFallback),
    * so any subtree referenced inside a lambda re-evaluates per element —
    * and per-character `substr` on a long string is an O(n) UTF-8 scan,
    * making naive per-gram hashing O(n²·q) per row. Codes + `element_at`
    * is O(1) per access. The `slice` drops the trailing empty token Java
    * regex split appends. */
  def charCodes(text: Column): Column =
    slice(transform(split(text, ""), ch => ascii(ch)), lit(1), length(text))

  /** Distinct character q-gram hashes over a *materialized* codes column
    * (see [[charCodes]]). Empty array when shorter than q. */
  def shingleHashesFromCodes(codes: Column, q: Int): Column = {
    require(q >= 2 && q <= MaxChars)
    val grams = transform(
      sequence(lit(1), size(codes) - (q - 1)),
      i => (0 until q).map { j =>
        element_at(codes, i + lit(j)).cast("bigint") % lit(CodeMod) *
          lit(pow31(q - 1 - j))
      }.reduce(_ + _))
    when(size(codes) < q, array().cast("array<bigint>"))
      .otherwise(array_distinct(grams))
  }

  /** Convenience one-shot form — only for small/one-off expressions;
    * operators over long text should materialize [[charCodes]] first. */
  def shingleHashes(text: Column, q: Int): Column =
    shingleHashesFromCodes(charCodes(text), q)

  /** DuckDB rendering of [[shingleHashes]]. `range` is end-exclusive
    * where Spark's `sequence` is inclusive, hence the q-2 offset. */
  def shingleHashesSql(e: String, q: Int): String = {
    val term = (0 until q).map { j =>
      s"ascii(substring($e, i + $j, 1))::BIGINT % $CodeMod * " +
        s"${pow31(q - 1 - j)}"
    }.mkString(" + ")
    s"""CASE WHEN length($e) < $q THEN []::BIGINT[]
        ELSE list_distinct(list_transform(
          range(1, length($e) - ${q - 2}), i -> $term)) END"""
  }

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-token full base-31 hashes (12-char cap). Materialize before
    * windowed use, like [[charCodes]]. */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => charHash(t))

  def tokenHashesSql(e: String): String =
    s"list_transform(string_split($e, ' '), t -> ${charHashSql("t")})"

  /** Distinct word n-gram hashes over a *materialized* token-hash array:
    * each token hash reduced mod p (fits 31^(n-1) scaling in Int64), then
    * base-31 combined. Word shingles stay selective on vocabularies where
    * character q-grams are ubiquitous — the shape that keeps prefix-
    * filtered similarity joins prunable at scale. */
  def wordShingleHashesFromTokenHashes(th: Column, n: Int): Column = {
    require(n >= 2 && n <= 6)
    val p = 2147483647L
    val grams = transform(
      sequence(lit(1), size(th) - (n - 1)),
      i => (0 until n).map { j =>
        (element_at(th, i + lit(j)) % p) * lit(pow31(n - 1 - j))
      }.reduce(_ + _))
    when(size(th) < n, array().cast("array<bigint>"))
      .otherwise(array_distinct(grams))
  }

  def wordShingleHashesSql(th: String, n: Int): String = {
    val p = 2147483647L
    val term = (0 until n).map { j =>
      s"($th[i + $j] % $p) * ${pow31(n - 1 - j)}"
    }.mkString(" + ")
    s"""CASE WHEN len($th) < $n THEN []::BIGINT[]
        ELSE list_distinct(list_transform(
          range(1, len($th) - ${n - 2}), i -> $term)) END"""
  }

  /** POSITIONED word n-gram hashes (element i = the gram starting at
    * token i) — [[wordShingleHashesSql]] without the distinct, for span
    * accounting where each occurrence and its token offset matter. */
  def positionedWordShinglesSql(th: String, n: Int): String = {
    val p = 2147483647L
    val term = (0 until n).map { j =>
      s"($th[i + $j] % $p) * ${pow31(n - 1 - j)}"
    }.mkString(" + ")
    s"""CASE WHEN len($th) < $n THEN []::BIGINT[]
        ELSE list_transform(
          range(1, len($th) - ${n - 2}), i -> $term) END"""
  }

  /** Per-token 12-char-capped hashes folded into 32 bits (for SimHash). */
  def tokenHashes32(text: Column): Column =
    transform(tokens(text), t => charHash(t) % lit(4294967296L))

  def tokenHashes32Sql(e: String): String =
    s"""list_transform(string_split($e, ' '),
        t -> ${charHashSql("t")} % 4294967296)"""
}
