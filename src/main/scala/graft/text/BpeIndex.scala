package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog
import Bpe.Merge

/** Persisted BPE vocabulary artifact — train ONCE, encode under the
  * loaded merge table from then on (the missing lifecycle half of
  * [[Bpe]], which until round 14 kept the merge list in driver
  * memory only).
  *
  * Layout (the [[graft.ann.AnnIndex]] meta-last pattern verbatim):
  *   `<table>`          1-row meta (num_merges, max_words,
  *                      merges_done) — written LAST, so a crash
  *                      mid-build leaves "no artifact" for readers,
  *                      never a half-written merge table.
  *   `<table>_merges`   (rank, l_sym, r_sym, pair_n), one row per
  *                      performed merge. numMerges rows total — a
  *                      constant-sized artifact whatever the corpus.
  *
  * Everything in the table is integer/string-exact, so encoding under
  * the LOADED merges is bit-identical to encoding under the freshly
  * trained list (gated by ts18 against the replayed-fit oracle). */
object BpeIndex {

  private def mergesTableOf(table: String) = table + "_merges"

  /** Train on `docs` (pass the designated training slice — sampling
    * the train corpus is standard BPE practice) and persist the merge
    * table; returns the merges for immediate use. `numMerges` /
    * `maxWords` are the production sizing knobs; `alphabet` picks the
    * tokenization — "az" (the original lowercase-[a-z] mode) or
    * "bytes" (byte-level — see [[Bpe.trainBytes]]: every accented or
    * non-Latin character survives). All three are recorded in the
    * meta, and every encode served off the artifact runs under the
    * RECORDED alphabet — the AnnIndex geometry contract applied to
    * tokenization. */
  def build(catalog: TableCatalog, docs: DataFrame, textCol: String,
            table: String, numMerges: Int = Bpe.DefaultMerges,
            maxWords: Int = Bpe.DefaultMaxWords,
            alphabet: String = "az"): Seq[Merge] = {
    val merges = alphabet match {
      case "az"    => Bpe.train(docs, textCol, numMerges, maxWords)
      case "bytes" => Bpe.trainBytes(docs, textCol, numMerges, maxWords)
      case other => throw new IllegalArgumentException(
        s"BpeIndex: unknown alphabet '$other' — use 'az' or 'bytes'")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    catalog.withTableLock(mergesTableOf(table)) {
      catalog.writeFull(
        merges.map(m => (m.rank, m.left, m.right, m.count))
          .toDF("rank", "l_sym", "r_sym", "pair_n"),
        mergesTableOf(table))
      catalog.writeFull(
        Seq((numMerges, maxWords, merges.length, alphabet))
          .toDF("num_merges", "max_words", "merges_done", "alphabet"),
        table)
    }
    merges
  }

  /** The recorded tokenization alphabet — "az" for artifacts built
    * before the column existed (the only mode that existed then). */
  def loadAlphabet(catalog: TableCatalog, table: String): String = {
    require(catalog.tableExists(table),
      s"BpeIndex: no vocabulary meta at '$table' — build it first " +
        "(a missing meta also covers a build that crashed mid-write)")
    val meta = catalog.read(table).collect()(0)
    if (meta.schema.fieldNames.contains("alphabet"))
      meta.getString(meta.fieldIndex("alphabet"))
    else "az"
  }

  /** The persisted merge list, rank-ordered — numMerges rows, a
    * bounded driver constant like the ANN codebooks. Fails loudly on
    * a missing meta (covers a build that crashed mid-write) or a
    * merge table that disagrees with it. */
  def loadMerges(catalog: TableCatalog, table: String): Seq[Merge] = {
    require(catalog.tableExists(table),
      s"BpeIndex: no vocabulary meta at '$table' — build it first " +
        "(a missing meta also covers a build that crashed mid-write)")
    val meta = catalog.read(table).collect()(0)
    val done = meta.getInt(meta.fieldIndex("merges_done"))
    val rows = catalog.read(mergesTableOf(table))
      .orderBy(col("rank")).collect()
      .map(r => Merge(r.getInt(r.fieldIndex("rank")),
        r.getString(r.fieldIndex("l_sym")),
        r.getString(r.fieldIndex("r_sym")),
        r.getLong(r.fieldIndex("pair_n"))))
    require(rows.length == done,
      s"BpeIndex: '$table' meta records $done merges but the merge " +
        s"table holds ${rows.length} — rebuild")
    rows.toSeq
  }

  /** [[Bpe.encodeStats]] under the LOADED merge table — the serving
    * path: no training pass, no corpus-sized work beyond the encode
    * itself. Dispatches on the artifact's RECORDED alphabet (a merge
    * list trained over hex-pair byte symbols would silently encode
    * nothing useful under the [a-z] tokenizer, and vice versa). */
  def encodeStatsFromIndex(catalog: TableCatalog, table: String,
                           docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val merges = loadMerges(catalog, table)
    loadAlphabet(catalog, table) match {
      case "bytes" => Bpe.encodeStatsBytes(docs, idCol, textCol, merges)
      case _       => Bpe.encodeStats(docs, idCol, textCol, merges)
    }
  }
}
