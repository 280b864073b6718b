package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repeated-span statistics — the exact-substring complement to the
  * document-level dedup family. Where MinHash/SimHash decide whether two
  * WHOLE documents are near-identical, span accounting finds the
  * boilerplate INSIDE documents: a word n-gram that occurs more than
  * once across the corpus marks each of its occurrences' n token
  * positions as duplicated, and each document reports how much of it is
  * covered by such spans (the signal behind exact-substring training-set
  * dedup, arXiv:2107.06499 "Deduplicating Training Data Makes Language
  * Models Better" — there at suffix-array granularity; here at the
  * n-gram granularity a distributed engine joins on).
  *
  * The reference has no in-document dedup (its dedup surface is
  * wp_export_data.py-style whole-row drop_duplicates); this is part of
  * the LLM-pipeline superset.
  *
  * Scale shape, stage by stage, all linear in corpus token count:
  *   1. one mapPartitions pass hashes each doc's tokens and emits the
  *      POSITIONED gram-hash array (docs × 1 rows, array width = tokens);
  *   2. posexplode to (doc, pos, gram) — docs × tokens rows, no payload
  *      beyond three numeric columns;
  *   3. duplicated grams = groupBy(gram).count > 1 — one shuffle with
  *      map-side partials; a corpus-wide hot gram (the classic template
  *      header) is just a large count, never a pair explosion;
  *   4. occurrences keep their per-doc positions via a semi-join on the
  *      gram hash (shuffle reuses stage 3's key), then per-doc coverage
  *      is a distinct over positions expanded n-wide — bounded by
  *      n × duplicated occurrences — and two per-doc aggregates;
  *   5. one left join back onto the per-doc frame (doc grain).
  * No cartesian, no window over pair volume, no driver state. Gram-hash
  * collisions (base-31 over 12-char-capped token hashes) can only merge
  * two grams into one span id; both engines share the arithmetic, so
  * the oracle gates stay exact.
  */
object SpanDedup {

  /** (id, n_toks, sh) with sh POSITIONED (element i = hash of tokens
    * i..i+n-1, 0-based): [[graft.sim.JaccardJoin.wordShingleFrame]]'s
    * kernel minus the distinct. Null text reads as empty (one empty
    * token, like `split` on both engines). */
  def positionedShingleFrame(docs: DataFrame, idCol: String,
                             textCol: String, n: Int): DataFrame = {
    require(n >= 2 && n <= 6, s"word-gram width $n outside [2,6]")
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType,
      StructField, StructType}
    val base = graft.core.Par.ensure(docs.select(col(idCol).as("id"),
      coalesce(col(textCol).cast("string"), lit("")).as("__t")))
    val schema = StructType(Seq(base.schema.head,
      StructField("n_toks", IntegerType, false),
      StructField("sh", ArrayType(LongType, false), false)))
    val p = 2147483647L
    val pw = TextHash.pow31.toArray
    val out = base.mapPartitions { rows =>
      rows.map { r =>
        val txt = r.getString(1)
        val th = txt.split(" ", -1).map(TextHash.charHashStr)
        val grams =
          if (th.length < n) Array.empty[Long]
          else {
            val g = new Array[Long](th.length - n + 1)
            var i = 0
            while (i + n <= th.length) {
              var h = 0L; var j = 0
              while (j < n) { h += th(i + j) % p * pw(n - 1 - j); j += 1 }
              g(i) = h; i += 1
            }
            g
          }
        org.apache.spark.sql.Row(r.get(0), th.length, grams)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out
  }

  /** Per-document duplicated-span statistics at word n-gram grain:
    * `(id, n_tokens, dup_grams, covered_tokens, dup_frac)` where
    * dup_grams counts this doc's gram occurrences whose hash occurs ≥ 2
    * times corpus-wide (within-doc repeats count), covered_tokens is the
    * size of the union of those occurrences' n-token windows, and
    * dup_frac = covered_tokens / n_tokens (one double division — exact
    * on both engines). Docs shorter than n words report zeros. */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 5): DataFrame = {
    val base = graft.core.Fence.soft(
      positionedShingleFrame(docs, idCol, textCol, n))
    val grams = base.select(col("id"),
      posexplode(col("sh")).as(Seq("pos", "g")))
    val dupG = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      .select(col("g"))
    val occ = grams.join(dupG, Seq("g"), "left_semi")
    val dupPerDoc = occ.groupBy(col("id"))
      .agg(count(lit(1)).as("dup_grams"))
    val covered = occ
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
      .groupBy(col("id")).agg(count(lit(1)).as("covered_tokens"))
    base.select(col("id"), col("n_toks").as("n_tokens"))
      .join(dupPerDoc, Seq("id"), "left")
      .join(covered, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_frac"))
  }

  /** The TRANSFORM twin of [[spanStats]]: rewrite each document with
    * duplicated spans REMOVED, keeping one copy corpus-wide (the
    * exact-substring dedup policy of arXiv:2107.06499, at n-gram
    * grain). Rules, all deterministic:
    *   - a gram hash occurring ≥ 2 times corpus-wide is duplicated;
    *     its CANONICAL occurrence is the globally smallest (doc, pos);
    *   - a token position is covered when any duplicated occurrence's
    *     n-token window contains it, and protected when a canonical
    *     occurrence's window does;
    *   - kept tokens = not covered, or protected. Overlapping spans
    *     resolve token-wise: a token survives if ANY canonical window
    *     claims it.
    * Output: (id, text, n_kept, n_dropped) — text rebuilt from kept
    * tokens in position order (empty when everything was duplicated).
    *
    * Scale shape on top of [[spanStats]]'s stages: the canonical pick
    * is a min-struct aggregate on the gram hash (same shuffle key as
    * the duplicate count), window expansion is bounded by n × dup
    * occurrences, the keep-mask is one anti-join of token positions
    * against (covered minus protected), and the rebuild is a per-doc
    * sort-aggregate (`collect_list` bounded by document length — the
    * same per-doc bound every tokenizing operator here carries). */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String,
                           textCol: String, n: Int = 5): DataFrame = {
    val base = graft.core.Fence.soft(
      positionedShingleFrame(docs, idCol, textCol, n))
    val grams = base.select(col("id"),
      posexplode(col("sh")).as(Seq("pos", "g")))
    // per-gram: occurrence count + globally-first occurrence, one
    // aggregate on the same key
    val gstats = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("id"), col("pos"))).as("__first"))
      .filter(col("__c") > 1)
    val dupOcc = grams.join(gstats.select(col("g")), Seq("g"),
      "left_semi")
    val canonical = gstats.select(col("__first.id").as("id"),
      col("__first.pos").as("pos"))
    def windows(occ: DataFrame): DataFrame = occ
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val covered = windows(dupOcc)
    val protectedPos = windows(canonical)
    val dropPos = covered.join(protectedPos, Seq("id", "p"), "left_anti")
    // token strings with positions, keep-masked; null text reads as
    // empty (one empty token), mirroring the shingle kernel
    val toks = docs.select(col(idCol).as("id"),
        posexplode(split(coalesce(col(textCol).cast("string"), lit("")),
          " ")).as(Seq("p", "tok")))
    val kept = toks.join(dropPos, Seq("id", "p"), "left_anti")
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").as("text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .join(base.select(col("id"), col("n_toks")), Seq("id"))
      .select(col("id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_toks").cast("long") -
          coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** DuckDB rendering of [[stripDuplicatedSpans]] over `docsTable`,
    * same four columns ordered by id. */
  def stripDuplicatedSpansSql(docsTable: String, idCol: String,
                              textCol: String, n: Int): String = {
    val th = TextHash.tokenHashesSql(s"coalesce($textCol, '')")
    val sh = TextHash.positionedWordShinglesSql("th", n)
    s"""WITH tok AS (SELECT $idCol AS id, $th AS th FROM $docsTable),
        pg AS (SELECT id, CAST(len(th) AS INT) AS n_toks, $sh AS sh
          FROM tok),
        g AS (SELECT id, unnest(sh) AS g,
            unnest(generate_series(1, len(sh))) - 1 AS pos FROM pg),
        gs AS (SELECT g, count(*) AS c,
            min(struct_pack(id := id, pos := pos)) AS f
          FROM g GROUP BY g HAVING count(*) > 1),
        occ AS (SELECT id, pos FROM g WHERE g IN (SELECT g FROM gs)),
        canon AS (SELECT f.id AS id, f.pos AS pos FROM gs),
        covered AS (SELECT DISTINCT id,
            unnest(generate_series(pos, pos + ${n - 1})) AS p FROM occ),
        protected AS (SELECT DISTINCT id,
            unnest(generate_series(pos, pos + ${n - 1})) AS p
          FROM canon),
        droppos AS (SELECT id, p FROM covered
          WHERE NOT EXISTS (SELECT 1 FROM protected pr
            WHERE pr.id = covered.id AND pr.p = covered.p)),
        toks AS (SELECT $idCol AS id,
            unnest(string_split(coalesce($textCol, ''), ' ')) AS tok,
            unnest(generate_series(1,
              len(string_split(coalesce($textCol, ''), ' ')))) - 1 AS p
          FROM $docsTable),
        kept AS (SELECT id, tok, p FROM toks
          WHERE NOT EXISTS (SELECT 1 FROM droppos d
            WHERE d.id = toks.id AND d.p = toks.p)),
        rebuilt AS (SELECT id, string_agg(tok, ' ' ORDER BY p) AS text,
            count(*) AS n_kept
          FROM kept GROUP BY id)
        SELECT pg.id, COALESCE(rebuilt.text, '') AS text,
          COALESCE(rebuilt.n_kept, 0) AS n_kept,
          CAST(pg.n_toks AS BIGINT) - COALESCE(rebuilt.n_kept, 0)
            AS n_dropped
        FROM pg LEFT JOIN rebuilt ON pg.id = rebuilt.id
        ORDER BY pg.id"""
  }

  /** DuckDB rendering of the whole [[spanStats]] rule over table
    * `docsTable`, emitting the same five columns ordered by id. */
  def spanStatsSql(docsTable: String, idCol: String, textCol: String,
                   n: Int): String = {
    val th = TextHash.tokenHashesSql(s"coalesce($textCol, '')")
    val sh = TextHash.positionedWordShinglesSql("th", n)
    s"""WITH tok AS (SELECT $idCol AS id, $th AS th FROM $docsTable),
        pg AS (SELECT id, CAST(len(th) AS INT) AS n_tokens, $sh AS sh
          FROM tok),
        g AS (SELECT id, unnest(sh) AS g,
            unnest(generate_series(1, len(sh))) - 1 AS pos FROM pg),
        dupg AS (SELECT g FROM g GROUP BY g HAVING count(*) > 1),
        occ AS (SELECT id, pos FROM g WHERE g IN (SELECT g FROM dupg)),
        dpd AS (SELECT id, count(*) AS dup_grams FROM occ GROUP BY id),
        covp AS (SELECT DISTINCT id, unnest(generate_series(pos,
            pos + ${n - 1})) AS p FROM occ),
        cov AS (SELECT id, count(*) AS covered_tokens FROM covp
          GROUP BY id)
        SELECT pg.id, pg.n_tokens,
          COALESCE(dpd.dup_grams, 0) AS dup_grams,
          COALESCE(cov.covered_tokens, 0) AS covered_tokens,
          CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE) /
            CAST(pg.n_tokens AS DOUBLE) AS dup_frac
        FROM pg LEFT JOIN dpd ON pg.id = dpd.id
        LEFT JOIN cov ON pg.id = cov.id
        ORDER BY pg.id"""
  }
}
