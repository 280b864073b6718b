package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained subword vocabulary — byte-pair-encoding-style greedy
  * pair merging (Sennrich et al. 2016, the public BPE algorithm), the
  * one text-analysis primitive a training-data pipeline otherwise
  * outsources to an external tokenizer library.
  *
  * Distribution topology (the `kmeansCentroids` pattern): the ONLY
  * corpus-sized pass is one word-count aggregate (explode → map-side
  * combined groupBy); training then runs on the top-`maxWords`
  * frequency-truncated word table — a driver-side structure bounded by
  * a constant, fetched with a TakeOrdered (count DESC, word ASC: a
  * total order, so the truncation is deterministic), never a full
  * sort. The greedy merge loop itself is O(maxWords · wordLen ·
  * numMerges) driver arithmetic — microseconds against any corpus
  * scan. Encoding re-distributes: DISTINCT words encode once under
  * the broadcast merge list (a genuinely imperative per-word greedy
  * scan — the documented UDF-as-last-resort case, over the distinct
  * word set, not the corpus), and documents re-join their words.
  *
  * Numerics are integer-exact end to end (counts, ranks, subword
  * counts), so the DuckDB oracle gates training and encoding
  * bit-for-bit: [[vocabSql]] / [[encodeSql]] emit the identical
  * algorithm as unrolled materialized CTE stages (one pair-count +
  * argmax + re-encode per merge; the re-encode is a sentinel-wrapped
  * string `replace`, which is leftmost-first non-overlapping — the
  * same result as the greedy left-to-right token scan, proven by the
  * shared-prefix argument in [[mergeTokens]]).
  *
  * Tokenization is deliberately minimal and engine-portable: lowercase,
  * split on any non-`[a-z]` run, empties dropped — word-internal
  * merges only (no end-of-word marker), which keeps every symbol a
  * plain `[a-z]+` string on both engines. */
object Bpe {

  val DefaultMerges = 16

  /** Frequency-truncated training vocabulary size — the standard BPE
    * practice (train on the top-V word shapes; the Zipf tail adds
    * count noise, not pair signal), and what bounds the driver
    * collect at any corpus scale. */
  val DefaultMaxWords = 4096

  /** One learned merge: at `rank`, symbols `left`+`right` (pair
    * frequency `count` at the time of the merge) fuse into
    * `left+right`. */
  final case class Merge(rank: Int, left: String, right: String,
                         count: Long)

  /** a-z word stream of a text column: lowercase, split on non-letter
    * runs, empties dropped. NULL text yields no words. */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => w =!= lit(""))

  private val WordsSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), " +
      "x -> x <> '')"

  /** Train `numMerges` greedy merges over the corpus: one distributed
    * word-count aggregate, a TakeOrdered top-`maxWords` driver fetch,
    * then the driver merge loop ([[trainOnCounts]]). Deterministic:
    * the truncation order (count DESC, word ASC) and the merge
    * tiebreak (count DESC, left ASC, right ASC) are total orders. */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int = DefaultMerges,
            maxWords: Int = DefaultMaxWords): Seq[Merge] = {
    val top = docs.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainOnCounts(top, numMerges)
  }

  /** The greedy merge loop over a (word, count) table: each round
    * counts every ADJACENT symbol pair occurrence (weighted by word
    * count), merges the most frequent (ties: smallest left, then
    * right), re-encodes, repeats. Stops early when no pairs remain
    * (every word fused to one symbol). */
  private[graft] def trainOnCounts(wordCounts: Array[(String, Long)],
                                  numMerges: Int): Seq[Merge] =
    trainOnSymbols(
      wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) },
      numMerges)

  /** [[trainOnCounts]] over pre-symbolized words — the shared loop the
    * character-level ([a-z] chars) and byte-level (hex-pair symbols)
    * alphabets both drive. */
  private[graft] def trainOnSymbols(wordSyms: Array[(Array[String], Long)],
                                    numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] = wordSyms
    val out = Seq.newBuilder[Merge]
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (t, c) =>
        var i = 0
        while (i < t.length - 1) {
          val key = (t(i), t(i + 1))
          pc.update(key, pc.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) =
          pc.minBy { case ((pl, pr), c) => (-c, pl, pr) }
        out += Merge(k, l, r, cnt)
        words = words.map { case (t, c) => (mergeTokens(t, l, r), c) }
        k += 1
      }
    }
    out.result()
  }

  /** One merge pass: greedy LEFT-TO-RIGHT non-overlapping — after a
    * fuse the new `l+r` symbol cannot re-fuse with the next token in
    * the same pass (it is strictly longer than `l`), so the scan
    * equals a leftmost-first string `replace`, which is what the SQL
    * twin uses. */
  private[graft] def mergeTokens(t: Array[String], l: String,
                                r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    t.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r)
        out(out.length - 1) = l + r
      else out += x
    }
    out.toArray
  }

  /** Encode one word under an ordered merge list. Lossless:
    * `encodeWord(w, ms).mkString == w` for every input. */
  def encodeWord(w: String, merges: Seq[(String, String)]): Array[String] = {
    var t: Array[String] = w.map(_.toString).toArray
    merges.foreach { case (l, r) => t = mergeTokens(t, l, r) }
    t
  }

  /** Per-document subword statistics under a trained merge list:
    * (id, n_words, n_sub). DISTINCT words encode once (the merge list
    * rides the closure — numMerges pairs, broadcast-trivial); the
    * word→subword-count table then joins back to the exploded corpus
    * (broadcast-sized in practice: the distinct word set, not the
    * corpus). Documents with no `[a-z]` words emit no row — identical
    * on the oracle side, where the join has nothing to unnest. */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val ms = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val nSub = udf((w: String) => encodeWord(w, ms).length)
    val docw = docs.select(col(idCol), explode(words(col(textCol))).as("w"))
    val enc = docw.select(col("w")).distinct()
      .withColumn("n_sub", nSub(col("w")).cast("long"))
    docw.join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("n_sub")).cast("long").as("n_sub"))
  }

  // ---- byte-level alphabet (round 16) ----------------------------------
  //
  // The [a-z] alphabet above destroys every accented or non-Latin
  // character before training — a real multilingual corpus (including
  // the reference's own French domain) needs the standard public
  // answer: BYTE-level BPE (GPT-2-style — merges over the word's UTF-8
  // bytes, so every codepoint survives losslessly). Symbols here are
  // 2-hex-char strings ("C3", "A9", merged "C3A9"): hex keeps every
  // symbol a plain ASCII string, so the ENTIRE merge machinery —
  // trainOnSymbols, mergeTokens, the sentinel-replace SQL twin — is
  // shared verbatim with the character alphabet, and both engines
  // compare/order symbols identically (no unicode collation in play
  // anywhere: word tie-breaks order by hex(utf8-bytes), merge
  // tie-breaks by hex-string order). Pre-tokenization is whitespace
  // only ([ \t\r\n]+ — an explicit class, identical in Java regex and
  // RE2) with NO case folding: byte-level BPE's standard contract, and
  // the only engine-portable choice (lower() on unicode is
  // locale-and-engine-dependent).

  /** Whitespace word stream of a text column: split on space/tab/CR/LF
    * runs, empties dropped, case and every non-ASCII byte preserved.
    * NULL text yields no words. */
  def byteWords(text: Column): Column =
    filter(split(text, "[ \\t\\r\\n]+"), w => w =!= lit(""))

  private def byteWordsSql(textExpr: String) =
    s"list_filter(regexp_split_to_array($textExpr, '[ \\t\\r\\n]+'), " +
      "x -> x <> '')"

  /** A word's UTF-8 bytes as 2-hex-char symbols — the byte-level
    * base tokenization ("é" → ["C3", "A9"]). Uppercase hex, matching
    * both engines' hex() rendering. */
  private[graft] def hexPairs(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bytes.map(b => f"${b & 0xff}%02X")
  }

  /** Train `numMerges` byte-level merges: same topology as [[train]]
    * (ONE corpus-sized word-count aggregate, TakeOrdered top-V driver
    * fetch, driver merge loop), with the truncation tie-break on
    * hex(utf8(word)) — a pure ASCII order both engines share, where a
    * raw unicode-string order would diverge between Java's UTF-16
    * comparison and the oracle's byte collation. */
  def trainBytes(docs: DataFrame, textCol: String,
                 numMerges: Int = DefaultMerges,
                 maxWords: Int = DefaultMaxWords): Seq[Merge] = {
    val top = docs.select(explode(byteWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, hex(encode(col("w"), "UTF-8")).asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainOnSymbols(top.map { case (w, c) => (hexPairs(w), c) },
      numMerges)
  }

  /** Encode one word's bytes under an ordered merge list. Lossless:
    * concatenating the result and hex-decoding recovers the word's
    * exact UTF-8 bytes for every input. */
  def encodeByteWord(w: String,
                     merges: Seq[(String, String)]): Array[String] = {
    var t: Array[String] = hexPairs(w)
    merges.foreach { case (l, r) => t = mergeTokens(t, l, r) }
    t
  }

  /** Per-document byte-level subword statistics under a trained merge
    * list: (id, n_words, n_sub) — [[encodeStats]]'s topology (DISTINCT
    * words encode once, docs re-join) over the byte alphabet. */
  def encodeStatsBytes(docs: DataFrame, idCol: String, textCol: String,
                       merges: Seq[Merge]): DataFrame = {
    val ms = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val nSub = udf((w: String) => encodeByteWord(w, ms).length)
    val docw = docs.select(col(idCol),
      explode(byteWords(col(textCol))).as("w"))
    val enc = docw.select(col("w")).distinct()
      .withColumn("n_sub", nSub(col("w")).cast("long"))
    docw.join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("n_sub")).cast("long").as("n_sub"))
  }

  /** The byte-level training stages — the [[trainStages]] shape with
    * the whitespace word stream, the hex-pair base tokenization
    * (regexp_extract_all(hex(encode(w)), '..')) and the hex-order
    * truncation tie-break. `src` is any table or parenthesized
    * subquery with (doc_id, text). The sentinel-replace merge stage is
    * [[sqlApply]] verbatim: hex symbols are ASCII, chr(31) still
    * impossible. */
  private def byteTrainStages(numMerges: Int, maxWords: Int,
                              src: String,
                              trainWhere: String = ""): String = {
    val head = s"""w0 AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(${byteWordsSql("text")}) AS w
            FROM $src bpe_src $trainWhere)
      GROUP BY w ORDER BY c DESC, hex(encode(w)) LIMIT $maxWords),
    t0 AS MATERIALIZED (SELECT w, c,
      regexp_extract_all(hex(encode(w)), '..') AS toks FROM w0)"""
    val stages = (1 to numMerges).map { k =>
      s"""pc$k AS MATERIALIZED (
        SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(c) AS BIGINT) AS pc
        FROM (SELECT c, unnest(list_transform(range(1, len(toks)),
                i -> [toks[i], toks[i+1]])) AS pr
              FROM t${k - 1} WHERE len(toks) >= 2)
        GROUP BY 1, 2),
      best$k AS MATERIALIZED (
        SELECT l, r, pc FROM pc$k ORDER BY pc DESC, l, r LIMIT 1),
      t$k AS MATERIALIZED (
        SELECT w, c, ${sqlApply("b.l", "b.r")} AS toks
        FROM t${k - 1} LEFT JOIN best$k b ON TRUE)"""
    }
    (head +: stages).mkString(",\n")
  }

  /** Oracle for the byte-level merge table — [[vocabSql]]'s shape over
    * [[byteTrainStages]]. */
  def byteVocabSql(numMerges: Int = DefaultMerges,
                   maxWords: Int = DefaultMaxWords,
                   src: String = "documents"): String = {
    val union = (1 to numMerges).map { k =>
      s"""SELECT $k AS rank, l AS l_sym, r AS r_sym, l||r AS merged,
         pc AS pair_n FROM best$k"""
    }.mkString(" UNION ALL ")
    s"WITH ${byteTrainStages(numMerges, maxWords, src)}\n" +
      s"SELECT * FROM ($union) ORDER BY rank"
  }

  /** Oracle for byte-level per-doc encoding — [[encodeSql]]'s shape
    * over [[byteTrainStages]]: `trainWhere` restricts the TRAINING
    * slice only (the [[BpeIndex]] train-slice/encode-full lifecycle);
    * the encode always runs over the whole `src`. */
  def byteEncodeSql(numMerges: Int = DefaultMerges,
                    maxWords: Int = DefaultMaxWords,
                    src: String = "documents",
                    trainWhere: String = ""): String = {
    val applies = (1 to numMerges).map { k =>
      s"""a$k AS MATERIALIZED (
        SELECT w, ${sqlApply("b.l", "b.r")} AS toks
        FROM a${k - 1} LEFT JOIN best$k b ON TRUE)"""
    }.mkString(",\n")
    s"""WITH ${byteTrainStages(numMerges, maxWords, src, trainWhere)},
    docw AS MATERIALIZED (
      SELECT doc_id, unnest(${byteWordsSql("text")}) AS w
      FROM $src bpe_src),
    a0 AS MATERIALIZED (
      SELECT w, regexp_extract_all(hex(encode(w)), '..') AS toks
      FROM (SELECT DISTINCT w FROM docw)),
    $applies
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      CAST(SUM(len(toks)) AS BIGINT) AS n_sub
    FROM docw JOIN a$numMerges USING (w)
    GROUP BY doc_id ORDER BY doc_id"""
  }

  // ---- DuckDB oracle twins ---------------------------------------------
  //
  // The merge loop unrolls as K materialized CTE stages (MATERIALIZED
  // is load-bearing: each stage is referenced twice — pair counts and
  // re-encode — and DuckDB inlines plain CTEs, which would duplicate
  // the scan 2^K times). Tokens travel as lists; the re-encode wraps
  // each token in a sentinel (chr(31), impossible in [a-z]+ symbols)
  // and uses plain `replace` — leftmost-first non-overlapping, the
  // exact twin of [[mergeTokens]].

  private def sqlApply(l: String, r: String): String = {
    val S = "chr(31)"
    s"""CASE WHEN $l IS NULL THEN toks
       ELSE list_filter(string_split(replace(
         $S||array_to_string(toks, $S||$S)||$S,
         $S||$l||$S||$S||$r||$S,
         $S||$l||$r||$S), $S), x -> x <> '') END"""
  }

  private def trainStages(numMerges: Int, maxWords: Int,
                          trainWhere: String = ""): String = {
    val head = s"""w0 AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest($WordsSql) AS w FROM documents $trainWhere)
      GROUP BY w ORDER BY c DESC, w LIMIT $maxWords),
    t0 AS MATERIALIZED (SELECT w, c, string_split(w, '') AS toks FROM w0)"""
    val stages = (1 to numMerges).map { k =>
      s"""pc$k AS MATERIALIZED (
        SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(c) AS BIGINT) AS pc
        FROM (SELECT c, unnest(list_transform(range(1, len(toks)),
                i -> [toks[i], toks[i+1]])) AS pr
              FROM t${k - 1} WHERE len(toks) >= 2)
        GROUP BY 1, 2),
      best$k AS MATERIALIZED (
        SELECT l, r, pc FROM pc$k ORDER BY pc DESC, l, r LIMIT 1),
      t$k AS MATERIALIZED (
        SELECT w, c, ${sqlApply("b.l", "b.r")} AS toks
        FROM t${k - 1} LEFT JOIN best$k b ON TRUE)"""
    }
    (head +: stages).mkString(",\n")
  }

  /** Oracle for the merge table: (rank, l_sym, r_sym, merged, pair_n),
    * one row per performed merge, ordered by rank. */
  def vocabSql(numMerges: Int = DefaultMerges,
               maxWords: Int = DefaultMaxWords): String = {
    val union = (1 to numMerges).map { k =>
      s"""SELECT $k AS rank, l AS l_sym, r AS r_sym, l||r AS merged,
         pc AS pair_n FROM best$k"""
    }.mkString(" UNION ALL ")
    s"WITH ${trainStages(numMerges, maxWords)}\n" +
      s"SELECT * FROM ($union) ORDER BY rank"
  }

  /** Oracle for per-doc encoding: the trained merges replay over the
    * FULL distinct-word set (out-of-vocabulary words encode under the
    * same merge list, exactly as [[encodeStats]] does), then each doc
    * sums its words' subword counts. `trainWhere` restricts the
    * TRAINING slice only (e.g. `"WHERE doc_id % 2 = 0"` — the
    * [[BpeIndex]] train-slice/encode-full lifecycle); the encode
    * always runs over the whole table. */
  def encodeSql(numMerges: Int = DefaultMerges,
                maxWords: Int = DefaultMaxWords,
                trainWhere: String = ""): String = {
    val applies = (1 to numMerges).map { k =>
      s"""a$k AS MATERIALIZED (
        SELECT w, ${sqlApply("b.l", "b.r")} AS toks
        FROM a${k - 1} LEFT JOIN best$k b ON TRUE)"""
    }.mkString(",\n")
    s"""WITH ${trainStages(numMerges, maxWords, trainWhere)},
    docw AS MATERIALIZED (
      SELECT doc_id, unnest($WordsSql) AS w FROM documents),
    a0 AS MATERIALIZED (
      SELECT w, string_split(w, '') AS toks FROM (SELECT DISTINCT w FROM docw)),
    $applies
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      CAST(SUM(len(toks)) AS BIGINT) AS n_sub
    FROM docw JOIN a$numMerges USING (w)
    GROUP BY doc_id ORDER BY doc_id"""
  }
}
