package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure expressions
  * with oracle-SQL twins generated from the same marker lists/formulas.
  */
object TextAnalysis {

  /** Stopword marker lists per language (public-knowledge closed lists;
    * the n-gram-free heuristic: argmax of marker-token hits). */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "des"),
    "es" -> Seq("el", "los", "las", "y", "una", "si"),
    "de" -> Seq("der", "die", "das", "und", "ein", "nicht"))

  /** Marker-hit count for one language over a token array. */
  def markerCount(toks: Column, lang: String): Column = {
    val set = markers.toMap.apply(lang)
    size(filter(toks, t => t.isInCollection(set)))
  }

  def markerCountSql(toks: String, lang: String): String = {
    val set = markers.toMap.apply(lang).map(s => s"'$s'").mkString(", ")
    s"CAST(len(list_filter($toks, t -> list_contains([$set], t))) AS INT)"
  }

  /** Detected language: argmax of marker counts, ties resolved in
    * [[markers]] order, zero hits → 'und'. */
  def langId(toks: Column): Column = {
    val counts = markers.map { case (l, _) => l -> markerCount(toks, l) }
    counts.zipWithIndex.foldRight(lit("und"): Column) {
      case (((l, c), i), elseCol) =>
        val rest = counts.drop(i + 1).map(_._2)
        val geAll = rest.foldLeft(c > 0)((acc, o) => acc && c >= o)
        when(geAll, lit(l)).otherwise(elseCol)
    }
  }

  def langIdSql(toks: String): String = {
    val cs = markers.map { case (l, _) => l -> markerCountSql(toks, l) }
    val whens = cs.zipWithIndex.map { case ((l, c), i) =>
      val rest = cs.drop(i + 1).map(_._2)
      val cond = (s"$c > 0" +: rest.map(o => s"$c >= $o")).mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"(CASE $whens ELSE 'und' END)"
  }

  /** Quality score in [0,1]: length prior + stopword ratio + type-token
    * ratio (the reference-free heuristics of training-data filters).
    * Formula association order fixed so the oracle reproduces the exact
    * double. */
  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    val stopRatio = markerCount(toks, "en").cast("double") / n
    val ttr = size(array_distinct(toks)).cast("double") / n
    least(n / 100.0, lit(1.0)) * 0.4 + stopRatio * 0.3 + ttr * 0.3
  }

  def qualityScoreSql(toks: String): String = {
    val n = s"CAST(len($toks) AS DOUBLE)"
    val stop = s"(CAST(${markerCountSql(toks, "en")} AS DOUBLE) / $n)"
    val ttr = s"(CAST(len(list_distinct($toks)) AS DOUBLE) / $n)"
    s"(least($n / 100.0, 1.0) * 0.4 + $stop * 0.3 + $ttr * 0.3)"
  }

  /** Word bigrams of a token array: each adjacent pair joined with one
    * space (the repetition-signal unit of training-data quality filters).
    * Empty for single-token arrays; null for null input. */
  def bigrams(toks: Column): Column =
    zip_with(slice(toks, lit(1), size(toks) - 1),
             slice(toks, lit(2), size(toks) - 1),
             (a, b) => concat(a, lit(" "), b))

  def bigramsSql(toks: String): String =
    s"""list_transform(generate_series(1, len($toks) - 1),
        i -> $toks[i] || ' ' || $toks[i + 1])"""

  /** Highest element frequency in an array (the count of the modal
    * value): null on empty input. O(distinct·n) per row — bounded by
    * document token counts, not corpus size. */
  def modeCount(arr: Column): Column =
    array_max(transform(array_distinct(arr),
      d => size(filter(arr, x => x === d))))

  def modeCountSql(arr: String): String =
    s"""list_max(list_transform(list_distinct($arr),
        d -> len(list_filter($arr, x -> x = d))))"""

  /** PII redaction — the privacy pass of a training-data pipeline:
    * emails, dotted-quad IPs and +-prefixed phone digit runs become
    * typed placeholders. Patterns deliberately stay in the regex
    * subset both engines (Java regex / RE2) interpret identically;
    * replacement order matters (IPs before phones, so an address's
    * digit runs are not half-eaten by the phone rule) and is fixed
    * here and in [[piiRedactSql]]. */
  def piiRedact(c: Column): Column = {
    val email = regexp_replace(c,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "(\\d{1,3}\\.){3}\\d{1,3}", "<IP>")
    regexp_replace(ip, "\\+\\d{7,}", "<PHONE>")
  }

  def piiRedactSql(e: String): String = {
    // raw interpolator: the SQL string carries exactly one backslash
    // per regex escape — identical to the escape-processed Java-regex
    // strings in [[piiRedact]]
    val email = raw"""regexp_replace($e,
      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g')"""
    val ip = raw"""regexp_replace($email,
      '(\d{1,3}\.){3}\d{1,3}', '<IP>', 'g')"""
    raw"""regexp_replace($ip, '\+\d{7,}', '<PHONE>', 'g')"""
  }

  /** Top-`k` TF-IDF-ranked distinctive terms per document — the keyword
    * extraction step of corpus exploration/tagging pipelines. Ranking is
    * deliberately INTEGER-ordered: (tf DESC, df ASC, term ASC) orders
    * pairs exactly as tf·idf does whenever one of tf/df dominates, while
    * a float idf (ln across two engines' libms) could flip a last-ulp
    * tie and desync the oracle. The row carries (tf, df, n_docs), so a
    * consumer that wants the float score computes tf·ln((N+1)/(df+1))
    * downstream.
    *
    * Scale shape: explode to (doc, term) — linear in token count; tf is
    * one (doc, term) hash aggregate with map-side partials; df one
    * (term) aggregate over the distinct pairs tf already produced (no
    * second pass over raw tokens); n_docs a broadcast one-row aggregate
    * (no driver collect); the top-k window partitions by doc over
    * per-doc DISTINCT terms — bounded by doc length, never corpus-wide.
    * A stopword's huge df is a single aggregate row, not a join
    * amplification. Output: (id, rank, term, tf, df, n_docs). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = docs.select(col(idCol).as("id"),
        explode(split(coalesce(col(textCol).cast("string"), lit("")),
          " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(
      countDistinct(col(idCol)).cast("long").as("n_docs"))
    val ranked = tf.join(df, Seq("term"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)))
      .filter(col("rank") <= k)
    ranked.join(broadcast(nDocs))
      .select(col("id"), col("rank"), col("term"), col("tf"),
        col("df"), col("n_docs"))
  }

  /** DuckDB rendering of [[tfidfTopTerms]] over `docsTable`, same six
    * columns ordered by (id, rank). */
  def tfidfTopTermsSql(docsTable: String, idCol: String, textCol: String,
                       k: Int): String =
    s"""WITH terms AS (
          SELECT $idCol AS id, unnest(string_split(
            coalesce($textCol, ''), ' ')) AS term FROM $docsTable),
        tf AS (SELECT id, term, count(*) AS tf FROM terms
          WHERE term <> '' GROUP BY id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        nd AS (SELECT count(DISTINCT $idCol) AS n_docs FROM $docsTable),
        ranked AS (SELECT id, term, tf, df,
            row_number() OVER (PARTITION BY id
              ORDER BY tf DESC, df ASC, term ASC) AS rank
          FROM tf JOIN df USING (term))
        SELECT id, rank, term, tf, df, n_docs
        FROM ranked, nd WHERE rank <= $k
        ORDER BY id, rank"""
}
