package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string similarity (reference: fuzzywuzzy WRatio scoring at
  * /root/reference/get_similarity.py:148-152; normalized-levenshtein is the
  * documented stand-in per SURVEY §7.4(6)).
  */
object Fuzzy {

  /** Similarity ratio in [0,100]: floor(100 * (1 - lev / max(len))).
    * Integer-exact (floor over exact small-int doubles) so a SQL oracle
    * reproduces it bit-for-bit. Null if either side is null; 100 for two
    * empty strings.
    */
  def levenshteinRatio(a: Column, b: Column): Column = {
    val maxLen = greatest(length(a), length(b))
    when(a.isNull || b.isNull, lit(null))
      .when(maxLen === 0, lit(100))
      .otherwise(floor(lit(100.0) * (maxLen - levenshtein(a, b)) / maxLen)
        .cast("int"))
  }

  /** Fuzzy top-1 join: attach to every left row the single right row whose
    * `rightKey` best matches `leftKey` (reference's per-partition
    * `process.extract(limit=1)` O(n²) loop, get_similarity.py:148-152,
    * which merges the winner back onto the full frame).
    *
    * Plan shape, chosen for scale:
    *  - score distinct left keys against the broadcast distinct right side
    *    (left streams through executors — no shuffle of the big side);
    *  - arg-max via `max(struct(score, rightKey))` — a hash aggregate with
    *    map-side partial aggregation, so the |L|·|R| scored rows collapse
    *    to |distinct L| *before* the shuffle (a window top-1 would shuffle
    *    all |L|·|R| rows);
    *  - left-join the winners back so callers get the full row payload.
    * For a large right side, pre-band with [[fuzzyTop1JoinBanded]].
    *
    * Ties broken by the *greatest* right key at the max score (struct
    * ordering), deterministically.
    */
  import graft.core.Par.fanOut

  /** Token-sort ratio (SURVEY §7.4(6)): the levenshtein ratio over
    * whitespace tokens sorted lexicographically — fuzzywuzzy's
    * token_sort_ratio, the component of WRatio that makes word-order
    * permutations score 100. Pure builtins, fully codegen-compatible. */
  def tokenSortRatio(a: Column, b: Column): Column = {
    def normalize(c: Column): Column =
      array_join(sort_array(split(c, " +")), " ")
    levenshteinRatio(normalize(a), normalize(b))
  }

  /** Distinct sorted whitespace tokens (empty tokens dropped). */
  private def tokenSet(c: Column): Column =
    array_sort(array_distinct(filter(split(c, " +"), x => x =!= lit(""))))

  /** The three token-set comparison strings of fuzzywuzzy's _token_set
    * (get_similarity.py:148-152 uses WRatio, which blends this measure):
    * t0 = sorted intersection, t1 = t0 + sorted(a-only), t2 = t0 +
    * sorted(b-only). Sorting is applied after each set op so both
    * engines emit identical strings regardless of set-op order. */
  private def tokenSetParts(a: Column, b: Column): (Column, Column, Column) = {
    val ta = tokenSet(a); val tb = tokenSet(b)
    val t0 = array_join(array_sort(array_intersect(ta, tb)), " ")
    val t1 = trim(concat_ws(" ", t0,
      array_join(array_sort(array_except(ta, tb)), " ")))
    val t2 = trim(concat_ws(" ", t0,
      array_join(array_sort(array_except(tb, ta)), " ")))
    (t0, t1, t2)
  }

  /** Token-set ratio — fuzzywuzzy's token_set_ratio: the max ratio among
    * (intersection, intersection+a-rest, intersection+b-rest), which
    * scores 100 whenever one side's word set contains the other's. Pure
    * builtins; null if either side is null.
    *
    * Bulk-scoring note: the three comparison strings share the token
    * arrays, and Catalyst clones (not shares) subtrees while the HOF
    * set ops run interpreted — one inline call expands to ~20
    * evaluations of each token pipeline per row. For scoring whole
    * columns, project [[tokenSetTriple]] first, fence it, and compare
    * the materialized fields (as the u07 gate does). */
  def tokenSetRatio(a: Column, b: Column): Column = {
    val (t0, t1, t2) = tokenSetParts(a, b)
    when(a.isNull || b.isNull, lit(null))
      .otherwise(greatest(levenshteinRatio(t0, t1),
        levenshteinRatio(t0, t2), levenshteinRatio(t1, t2)))
  }

  /** The three token-set comparison strings as one struct column
    * (`t0`/`t1`/`t2`), so bulk pipelines can compute the token set ops
    * once per row, fence the result, and run the cheap levenshtein
    * comparisons on materialized strings. [[tokenSetScore]] is the
    * matching comparison step. */
  def tokenSetTriple(a: Column, b: Column): Column = {
    val (t0, t1, t2) = tokenSetParts(a, b)
    struct(t0.as("t0"), t1.as("t1"), t2.as("t2"))
  }

  /** Max pairwise ratio over a materialized [[tokenSetTriple]]. */
  def tokenSetScore(triple: Column): Column = {
    val (t0, t1, t2) = (triple.getField("t0"), triple.getField("t1"),
      triple.getField("t2"))
    greatest(levenshteinRatio(t0, t1), levenshteinRatio(t0, t2),
      levenshteinRatio(t1, t2))
  }

  /** Partial ratio — fuzzywuzzy's partial_ratio as the exact
    * best-window form: the shorter string slides over every same-length
    * window of the longer and keeps the best ratio, so a substring pair
    * scores 100. O(|l|·|s|²) per pair via an interpreted HOF — meant for
    * per-row scoring/banding, not pair-quadratic joins (pre-band there,
    * as [[fuzzyTop1JoinBanded]] does). */
  def partialRatio(a: Column, b: Column): Column = {
    // n/m from least/greatest of lengths (not length(s)/length(l)):
    // Catalyst clones subtrees per reference, so every reference to the
    // conditional s/l would copy the full argument trees — with
    // composite arguments (wRatio's token-set strings) that turned plan
    // compilation itself into the dominant cost
    val n = least(length(a), length(b))
    val m = greatest(length(a), length(b))
    val s = when(length(a) <= length(b), a).otherwise(b)
    val l = when(length(a) <= length(b), b).otherwise(a)
    val minDist = array_min(transform(
      sequence(lit(1), m - n + lit(1)),
      i => levenshtein(s, l.substr(i, n))))
    when(a.isNull || b.isNull, lit(null))
      .when(n === 0, lit(100))
      .otherwise(floor(lit(100.0) * (n - minDist) / n).cast("int"))
  }

  /** WRatio — fuzzywuzzy's blended scorer (get_similarity.py:148-152),
    * reproduced with its published decision tree: the plain ratio,
    * token_sort and token_set scaled by 0.95, and — when the lengths
    * diverge by >1.5× — the partial family scaled by 0.9 (0.6 beyond
    * 8×). Ties to fuzzywuzzy up to rounding mode (HALF_UP here vs
    * Python's banker's rounding on exact .5 — unreachable for most
    * scale products). Null if either side is null. */
  def wRatio(a: Column, b: Column): Column = {
    def sortedTok(c: Column): Column =
      array_join(sort_array(split(c, " +")), " ")
    val base = levenshteinRatio(a, b).cast("double")
    val la = length(a).cast("double"); val lb = length(b).cast("double")
    val lensRatio = greatest(la, lb) / least(la, lb)
    val unbase = lit(0.95)
    val partialScale = when(lensRatio > 8.0, lit(0.6)).otherwise(lit(0.9))
    val (t0, t1, t2) = tokenSetParts(a, b)
    val partial = partialRatio(a, b).cast("double") * partialScale
    val ptsor = partialRatio(sortedTok(a), sortedTok(b)).cast("double") *
      unbase * partialScale
    val ptser = greatest(partialRatio(t0, t1), partialRatio(t0, t2),
      partialRatio(t1, t2)).cast("double") * unbase * partialScale
    val tsor = tokenSortRatio(a, b).cast("double") * unbase
    val tser = tokenSetRatio(a, b).cast("double") * unbase
    val blended = when(lensRatio > 1.5,
        greatest(base, partial, ptsor, ptser))
      .otherwise(greatest(base, tsor, tser))
    when(a.isNull || b.isNull, lit(null))
      .otherwise(round(blended).cast("int"))
  }

  /** [[wRatio]] over pre-staged components — the bulk-scoring path.
    * Callers project the sorted-token strings and [[tokenSetTriple]]
    * once, fence them, and assemble the blended score from the
    * materialized fields: the inline [[wRatio]] clones its interpreted
    * token pipelines ~20× per row (Catalyst copies subtrees, HOFs get
    * no CSE) and its expression tree is large enough that plan
    * compilation alone costs seconds. Formula-identical to [[wRatio]]
    * (asserted by DedupFuzzySpec). */
  def wRatioStaged(a: Column, b: Column, sortedA: Column, sortedB: Column,
                   triple: Column): Column = {
    val base = levenshteinRatio(a, b).cast("double")
    val la = length(a).cast("double"); val lb = length(b).cast("double")
    val lensRatio = greatest(la, lb) / least(la, lb)
    val unbase = lit(0.95)
    val partialScale = when(lensRatio > 8.0, lit(0.6)).otherwise(lit(0.9))
    val (t0, t1, t2) = (triple.getField("t0"), triple.getField("t1"),
      triple.getField("t2"))
    val partial = partialRatio(a, b).cast("double") * partialScale
    val ptsor = partialRatio(sortedA, sortedB).cast("double") *
      unbase * partialScale
    val ptser = greatest(partialRatio(t0, t1), partialRatio(t0, t2),
      partialRatio(t1, t2)).cast("double") * unbase * partialScale
    val tsor = levenshteinRatio(sortedA, sortedB).cast("double") * unbase
    val tser = greatest(levenshteinRatio(t0, t1), levenshteinRatio(t0, t2),
      levenshteinRatio(t1, t2)).cast("double") * unbase
    val blended = when(lensRatio > 1.5,
        greatest(base, partial, ptsor, ptser))
      .otherwise(greatest(base, tsor, tser))
    when(a.isNull || b.isNull, lit(null))
      .otherwise(round(blended).cast("int"))
  }

  /** Reference-fidelity top-1 fuzzy join: the declarative
    * crossJoin + arg-max form of the reference's O(|L|·|R|) lookup
    * loop (get_similarity.py). Like the other broadcast-contract joins
    * it is bounded by `maxRightKeys` and fails fast past it — a right
    * side beyond the lookup-table contract belongs in
    * [[fuzzyTop1JoinBanded]], whose length-banded equi-join scales
    * past broadcast (and is what the gated j05 path uses). */
  def fuzzyTop1Join(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    scoreCol: String = "similarity",
                    maxRightKeys: Int = DefaultMaxRightKeys): DataFrame = {
    require(maxRightKeys >= 1, "fuzzyTop1Join: maxRightKeys must be positive")
    val rKeys = right.select(col(rightKey)).distinct()
    // the bound probe stops counting at maxRightKeys + 1 — it never
    // materializes the right side anywhere but the broadcast itself
    if (rKeys.where(col(rightKey).isNotNull)
        .limit(maxRightKeys + 1).count() > maxRightKeys)
      throw new IllegalArgumentException(
        s"fuzzyTop1Join: right side exceeds the lookup-table contract " +
        s"(> $maxRightKeys distinct keys); use fuzzyTop1JoinBanded, " +
        "whose length-banded equi-join scales past broadcast")
    val l = fanOut(left.select(col(leftKey)).distinct())
    val r = broadcast(rKeys)
    val scored = l.crossJoin(r)
      .withColumn(scoreCol, levenshteinRatio(col(leftKey), col(rightKey)))
    val best = scored.groupBy(col(leftKey))
      .agg(max(struct(col(scoreCol), col(rightKey))).as("__best"))
      .select(col(leftKey),
              col("__best").getField(rightKey).as(rightKey),
              col("__best").getField(scoreCol).as(scoreCol))
    left.join(best, Seq(leftKey), "left")
  }

  /** Generalized top-k: the k best right matches per left key (the
    * reference's `process.extract(limit=k)` for k > 1), ranked by
    * (score desc, right key desc). Output keeps the full left payload,
    * one row per (left row, rank); null right keys are not candidates.
    *
    * Scored in the same per-partition kernel as [[fuzzyTop1JoinBanded]]
    * rather than a window: a window top-k shuffles every scored
    * |L|·|R| pair, while the kernel emits only k rows per left key —
    * the only shuffle left is the payload join. A property test pins
    * the output to the declarative window form. */
  def fuzzyTopKJoin(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String, k: Int,
                    scoreCol: String = "similarity",
                    maxRightKeys: Int = DefaultMaxRightKeys): DataFrame = {
    require(k >= 1)
    val spark = left.sparkSession
    import spark.implicits._
    val rKeys = collectRightKeys(right, rightKey, maxRightKeys,
      "fuzzyTopKJoin")
    val bc = spark.sparkContext.broadcast(rKeys)
    val l = fanOut(left.select(col(leftKey).cast("string")).distinct())
    val ranked = l.as[String].mapPartitions { it =>
      // right-side codepoint arrays decoded once per partition, the
      // left key's once per key, DP rows reused — per-pair work is the
      // banded DP alone
      val rs = bc.value.map(rk => (rk, cps(rk)))
      val scratch = new LevScratch
      it.flatMap { lk =>
        if (lk == null) Iterator.empty
        else {
          val lcp = cps(lk)
          val top = rs.map { case (rk, rcp) =>
              (ratioAtLeastCp(lcp, rcp, 0, scratch), rk)
            }
            .sortWith { case ((s1, r1), (s2, r2)) =>
              s1 > s2 || (s1 == s2 && utf8Gt(r1, r2))
            }.take(k)
          top.iterator.zipWithIndex.map { case ((sc, rk), i) =>
            (lk, rk, sc, i + 1) }
        }
      }
    }.toDF(leftKey, rightKey, scoreCol, "rank")
    left.join(ranked, Seq(leftKey), "left")
  }

  /** Bound on the distinct right keys the broadcast-contract joins
    * ([[fuzzyTopKJoin]], [[fuzzyTop1JoinWRatio]]) will collect: these
    * operators are O(|L|·|R|) by the reference's own lookup-table
    * contract, so a right side past ~1M keys is a misuse, not a scale
    * problem — fail fast instead of a silent driver OOM. */
  val DefaultMaxRightKeys: Int = 1000000

  /** Distinct right keys under the broadcast contract: takes at most
    * `maxKeys + 1` rows and fails with the scale alternative named when
    * the bound is exceeded. */
  private def collectRightKeys(right: DataFrame, rightKey: String,
                               maxKeys: Int, op: String): Array[String] = {
    require(maxKeys >= 1, s"$op: maxRightKeys must be positive")
    import right.sparkSession.implicits._
    // nulls are dropped BEFORE the bound is counted — a null key is not
    // a candidate and must not push a right side at exactly the bound
    // over it
    val keys = right.select(col(rightKey).cast("string"))
      .where(col(rightKey).isNotNull).distinct()
      .as[String].take(maxKeys + 1)
    if (keys.length > maxKeys)
      throw new IllegalArgumentException(
        s"$op: right side exceeds the lookup-table contract " +
        s"(> $maxKeys distinct keys); use fuzzyTop1JoinBanded, whose " +
        "length-banded equi-join scales past broadcast")
    keys
  }

  /** Thresholded ratio: the similarity when it is >= minScore, else null.
    * The bound is exact: `ratio >= s ⇔ dist <= floor(len·(100−s)/100)`,
    * so the 3-arg bounded levenshtein (banded DP with early exit,
    * O(cap·n) instead of O(n²)) is the fast path whenever the pair's
    * distance budget fits under `distCap`; longer strings take the rare
    * full-DP branch, keeping the result exact for any input. */
  def levenshteinRatioBounded(a: Column, b: Column, minScore: Int,
                              distCap: Int = 8): Column = {
    val maxLen = greatest(length(a), length(b))
    val maxDist = floor((maxLen * (100 - minScore)) / 100).cast("int")
    val fast = levenshtein(a, b, distCap)
    val dist = when(maxDist <= distCap,
        when(fast >= 0 && fast <= maxDist, fast))
      .otherwise(when(levenshtein(a, b) <= maxDist, levenshtein(a, b)))
    when(a.isNull || b.isNull, lit(null))
      .when(maxLen === 0, lit(100))
      .otherwise(floor(lit(100.0) * (maxLen - dist) / maxLen).cast("int"))
  }

  /** Scale path for a right side too large to broadcast: candidate pairs
    * are restricted to length-compatible bands before scoring, and
    * scoring itself is the bounded-DP ratio.
    *
    * Exactness: `ratio(a,b) >= minScore` implies
    * `|len(a)-len(b)| <= (1-minScore/100)*max(len)`, so replicating each
    * right key across its compatible integer lengths and equi-joining on
    * the left length loses no pair at or above the threshold. Rows whose
    * best match scores below `minScore` come back with a null match (the
    * reference itself bands such rows as no-match downstream,
    * get_similarity.py:185-188).
    *
    * Shuffles: one hash shuffle of each side on the band key (an
    * equi-join Catalyst can plan as sort-merge at any scale), then the
    * same partial-agg arg-max as [[fuzzyTop1Join]].
    *
    * `saltBuckets` picks the physical strategy for the band probe:
    *  - 0 (default): the banded right side rides an executor broadcast
    *    as a band → candidates hash map and the probe loop is FUSED
    *    into the scoring kernel: one `mapPartitions` over the distinct
    *    LEFT keys looks its band up and scores the candidates in place.
    *    No |L|·|R| rows ever materialize (the prior shape — a broadcast
    *    band equi-join feeding a pair kernel — decoded 15M two-string
    *    tuples per run at sf0.1; that allocation storm, not the DP, was
    *    the r3–r5 j05 bench variance), each distinct left key is scored
    *    exactly once, so no arg-max shuffle is needed either, and hot
    *    bands cost nothing: left keys spread uniformly over partitions
    *    regardless of band. Memory bound = the banded right side fits
    *    an executor — the identical bound the broadcast join had.
    *  - N > 0: the fallback when the banded right side exceeds broadcast
    *    scale — salt the band key N ways: each left row takes a
    *    deterministic salt `hash(leftKey) mod N`, each banded right row
    *    is replicated across all N salts, and the join runs as a plain
    *    shuffle equi-join on (band, salt), feeding a per-pair scoring
    *    kernel whose partial winners collapse in a final arg-max
    *    aggregate. A hot band now spreads over N tasks at the cost of
    *    an N× right-side replication (right is the smaller side by
    *    contract). Output is identical to the fused path: every
    *    (left, compatible-right) pair still meets exactly once.
    */
  def fuzzyTop1JoinBanded(left: DataFrame, leftKey: String,
                          right: DataFrame, rightKey: String,
                          minScore: Int = 60,
                          scoreCol: String = "similarity",
                          saltBuckets: Int = 0,
                          maxRightKeys: Int = DefaultMaxRightKeys)
      : DataFrame = {
    require(minScore > 0 && minScore <= 100)
    val tol = 1.0 - minScore / 100.0
    val spark = left.sparkSession
    import spark.implicits._
    val l = fanOut(left.select(col(leftKey)).distinct())
      .withColumn("__llen", length(col(leftKey)))
    if (saltBuckets <= 0) {
      // Fused broadcast path. The band map replicates each right key
      // across its compatible integer lengths with the same ceil/floor
      // math as the salted explode below (lossless at the threshold:
      // ratio >= s ⇒ |la-lb| <= (1-s/100)·max(la,lb)); lengths count
      // codepoints, like `length()` and the oracle.
      val rKeys = collectRightKeys(right, rightKey, maxRightKeys,
        "fuzzyTop1JoinBanded(saltBuckets=0) [pass saltBuckets > 0 for a " +
          "shuffle-scale right side]")
      val byBand = {
        val m = new java.util.HashMap[Int,
          scala.collection.mutable.ArrayBuffer[(String, Array[Int])]]()
        rKeys.foreach { rk =>
          val rcp = cps(rk)
          val lo = math.ceil(rcp.length * (1.0 - tol)).toInt
          val hi = math.floor(rcp.length / (1.0 - tol)).toInt
          var b = lo
          while (b <= hi) {
            var buf = m.get(b)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[
                (String, Array[Int])]()
              m.put(b, buf)
            }
            buf += ((rk, rcp))
            b += 1
          }
        }
        val out = new java.util.HashMap[Int, Array[(String, Array[Int])]]()
        m.forEach((k, v) => out.put(k, v.toArray))
        out
      }
      val bc = spark.sparkContext.broadcast(byBand)
      // Integer math identical to the SQL oracle: ratio >= s ⇔
      // dist <= floor(maxLen·(100−s)/100), banded DP with early exit;
      // the UTF-8-byte tie-break matches Spark/DuckDB string max
      // ordering. Left keys are distinct, so each kernel row emits its
      // final winner directly — no downstream aggregate.
      val best = l.select(col(leftKey).cast("string")).as[String]
        .mapPartitions { it =>
          val bands = bc.value
          val scratch = new LevScratch
          it.flatMap { lk =>
            if (lk == null) Iterator.empty
            else {
              val lcp = cps(lk)
              val cands = bands.get(lcp.length)
              if (cands == null) Iterator.empty
              else {
                var bestScore = -1; var bestR: String = null
                var i = 0
                while (i < cands.length) {
                  val (rk, rcp) = cands(i)
                  val sc = ratioAtLeastCp(lcp, rcp, minScore, scratch)
                  if (sc >= 0 && (sc > bestScore ||
                      (sc == bestScore && utf8Gt(rk, bestR))))
                    { bestScore = sc; bestR = rk }
                  i += 1
                }
                if (bestScore >= 0) Iterator.single((lk, bestR, bestScore))
                else Iterator.empty
              }
            }
          }
        }.toDF(leftKey, rightKey, scoreCol)
      left.join(best, Seq(leftKey), "left")
    } else {
      // Salted shuffle path: pairs meet in a plain equi-join on
      // (band, salt); the kernel keeps one running best per left key
      // per partition (memory ≤ |distinct L per partition|, a partial
      // aggregate), and only those partial winners reach the final
      // arg-max shuffle. Declarative alternatives all measured 4-10×
      // slower at sf0.1: a threshold filter folds into the join
      // condition (the DP runs twice per pair — BENCH r3: 21 s), the
      // score expression inside the aggregate re-evaluates on its
      // non-codegen input path, and fencing the scored pairs
      // materializes |L|·|R| rows.
      val r = right.select(col(rightKey)).distinct()
        .withColumn("__rlen", length(col(rightKey)))
        .withColumn("__band",
          explode(sequence(ceil(col("__rlen") * (1.0 - tol)).cast("int"),
                           floor(col("__rlen") / (1.0 - tol)).cast("int"))))
      val ls = l.withColumn("__lsalt",
        pmod(hash(col(leftKey)), lit(saltBuckets)))
      val rs = r.withColumn("__rsalt",
        explode(array((0 until saltBuckets).map(lit): _*)))
      val joined = ls.join(rs, col("__llen") === col("__band") &&
                               col("__lsalt") === col("__rsalt"))
      val partialBest = joined
        .select(col(leftKey).cast("string"), col(rightKey).cast("string"))
        .as[(String, String)]
        .mapPartitions { it =>
          val best = new java.util.HashMap[String, (Int, String)]()
          // codepoint arrays memoized per key, DP rows reused across
          // pairs — per-pair work is the DP loop alone; the map is
          // bounded by distinct keys per partition
          val cpCache = new java.util.HashMap[String, Array[Int]]()
          def cpOf(s: String): Array[Int] = {
            var a = cpCache.get(s)
            if (a == null) { a = cps(s); cpCache.put(s, a) }
            a
          }
          val scratch = new LevScratch
          it.foreach { case (lk, rk) =>
            if (lk != null && rk != null) {
              val sc = ratioAtLeastCp(cpOf(lk), cpOf(rk), minScore, scratch)
              if (sc >= 0) {
                val cur = best.get(lk)
                if (cur == null || sc > cur._1 ||
                    (sc == cur._1 && utf8Gt(rk, cur._2)))
                  best.put(lk, (sc, rk))
              }
            }
          }
          import scala.jdk.CollectionConverters._
          best.entrySet().iterator().asScala
            .map(e => (e.getKey, e.getValue._2, e.getValue._1))
        }.toDF(leftKey, rightKey, scoreCol)
      val best = partialBest.groupBy(col(leftKey))
        .agg(max(struct(col(scoreCol), col(rightKey))).as("__best"))
        .select(col(leftKey),
                col("__best").getField(rightKey).as(rightKey),
                col("__best").getField(scoreCol).as(scoreCol))
      left.join(best, Seq(leftKey), "left")
    }
  }

  /** Codepoint array for kernel DP work. The Column forms (`length`,
    * `levenshtein`) and the DuckDB oracle both count Unicode codepoints,
    * so the kernels must too — measuring in UTF-16 units (String.length /
    * charAt) would silently diverge on non-BMP input (emoji,
    * supplementary CJK). Fast path skips the surrogate decode when the
    * string is pure BMP (the overwhelmingly common case). */
  private def cps(s: String): Array[Int] = {
    val n = s.length
    var i = 0
    while (i < n && !Character.isHighSurrogate(s.charAt(i))) i += 1
    if (i == n) {
      val a = new Array[Int](n)
      var j = 0
      while (j < n) { a(j) = s.charAt(j); j += 1 }
      a
    } else s.codePoints().toArray
  }

  /** Kernel twin of [[levenshteinRatioBounded]]: the ratio when it is
    * >= minScore, else -1. `ratio >= s ⇔ dist <= floor(len·(100−s)/100)`
    * (integers, so the equivalence is exact), and
    * `floor(100·(len−d)/len)` equals integer division for non-negative
    * ints — bit-identical to the Column form and the SQL oracle on any
    * input (lengths and DP both run over codepoints, like both
    * engines). */
  private def ratioAtLeast(a: String, b: String, minScore: Int): Int =
    ratioAtLeastCp(cps(a), cps(b), minScore, new LevScratch)

  /** Codepoint-array form of [[ratioAtLeast]] for the pair-quadratic
    * kernels: the caller memoizes the arrays per key and reuses one
    * [[LevScratch]] per partition, so scoring a pair allocates
    * nothing. */
  private def ratioAtLeastCp(ca: Array[Int], cb: Array[Int],
                             minScore: Int, scratch: LevScratch): Int = {
    val maxLen = math.max(ca.length, cb.length)
    if (maxLen == 0) return 100
    val maxDist = maxLen * (100 - minScore) / 100
    if (math.abs(ca.length - cb.length) > maxDist) return -1
    val d = boundedLev(ca, 0, ca.length, cb, 0, cb.length, maxDist, scratch)
    if (d > maxDist) -1 else 100 * (maxLen - d) / maxLen
  }

  /** Reusable DP rows for [[boundedLev]], grown on demand — one per
    * partition/kernel instance, never shared across threads. */
  private final class LevScratch {
    var prev: Array[Int] = new Array[Int](64)
    var cur: Array[Int] = new Array[Int](64)
    def ensure(m: Int): Unit =
      if (prev.length < m + 1) {
        val n = math.max(m + 1, prev.length * 2)
        prev = new Array[Int](n)
        cur = new Array[Int](n)
      }
  }

  /** Two-row Levenshtein DP with row-min early exit over codepoint
    * slices: returns the exact distance when it is <= cap, else any
    * value > cap. Offset/length form so [[wRatioKernel]]'s partial-ratio
    * windows slide without copying; rows live in `scratch`. */
  private def boundedLev(a: Array[Int], aOff: Int, n: Int,
                         b: Array[Int], bOff: Int, m: Int, cap: Int,
                         scratch: LevScratch): Int = {
    scratch.ensure(m)
    var prev = scratch.prev
    var cur = scratch.cur
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      var rowMin = i
      var j = 1
      while (j <= m) {
        val cost = if (a(aOff + i - 1) == b(bOff + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > cap) return cap + 1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Unsigned UTF-8 byte comparison — the order Spark's string max (and
    * the oracle's) uses, so partial winners tie-break identically to the
    * final `max(struct(...))` merge. */
  private def utf8Gt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c > 0
      i += 1
    }
    a.length > b.length
  }

  private val utf8Ordering: Ordering[String] =
    (x: String, y: String) =>
      if (x == y) 0 else if (utf8Gt(x, y)) 1 else -1

  /** Spark's `trim()` removes 0x20 spaces only — Java's `String.trim`
    * also strips control chars, which would diverge on tokens like
    * "\t". */
  private def trimSpaces(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  /** Per-key precomputation for the kernel WRatio: the raw and
    * token-sorted forms as codepoint arrays, and the sorted distinct
    * token set — everything per-SIDE so the per-pair work is only set
    * merge + levenshteins, and all length/DP math counts codepoints
    * like the Column forms and the oracle. */
  /** Plain final class, not a case class: the fields are arrays, so
    * generated equals/hashCode would silently compare by reference —
    * this type is a value holder only and must never be used as a key. */
  private[graft] final class FuzzKey(val rawCp: Array[Int],
                                     val sortedCp: Array[Int],
                                     val set: Array[String])
    extends Serializable

  private[graft] def prepKey(s: String): FuzzKey = {
    val toks = s.split(" +", -1) // -1: Spark's split keeps trailing ""
    new FuzzKey(cps(s), cps(toks.sorted(utf8Ordering).mkString(" ")),
      toks.filter(_.nonEmpty).distinct.sorted(utf8Ordering))
  }

  /** Kernel twin of [[wRatio]] — semantics pinned identical by
    * DedupFuzzySpec on random pairs: same integer ratio/partial math
    * (over codepoints, like `length`/`levenshtein`), same UTF-8 token
    * ordering, same 0.95/0.9/0.6 scale tree, same HALF_UP rounding (via
    * the toString-based BigDecimal Spark's `round` uses). Built for
    * pair-quadratic positions where the Column form's interpreted
    * pipelines are ruinous. */
  private[graft] def wRatioKernel(lp: FuzzKey, rp: FuzzKey): Int =
    wRatioKernel(lp, rp, new LevScratch)

  private[graft] def wRatioKernel(lp: FuzzKey, rp: FuzzKey,
                                  scratch: LevScratch): Int = {
    def ratio(x: Array[Int], y: Array[Int]): Int = {
      val m = math.max(x.length, y.length)
      if (m == 0) 100
      else 100 * (m - boundedLev(x, 0, x.length, y, 0, y.length, m,
        scratch)) / m
    }
    def partialR(x: Array[Int], y: Array[Int]): Int = {
      val (s, l) = if (x.length <= y.length) (x, y) else (y, x)
      val n = s.length
      if (n == 0) return 100
      var best = Int.MaxValue; var i = 0
      while (i + n <= l.length) {
        val d = boundedLev(s, 0, n, l, i, n, n, scratch)
        if (d < best) best = d
        i += 1
      }
      100 * (n - best) / n
    }
    val a = lp.rawCp; val b = rp.rawCp
    val inter = lp.set.filter(t => rp.set.contains(t))
    val dA = lp.set.filterNot(t => rp.set.contains(t))
    val dB = rp.set.filterNot(t => lp.set.contains(t))
    val t0s = inter.mkString(" ")
    val t0 = cps(t0s)
    val t1 = cps(trimSpaces(t0s + " " + dA.mkString(" ")))
    val t2 = cps(trimSpaces(t0s + " " + dB.mkString(" ")))
    val lensRatio = math.max(a.length, b.length).toDouble /
      math.min(a.length, b.length).toDouble
    val ps = if (lensRatio > 8.0) 0.6 else 0.9
    val base = ratio(a, b).toDouble
    val blended =
      if (lensRatio > 1.5) {
        val partial = partialR(a, b).toDouble * ps
        val ptsor = partialR(lp.sortedCp, rp.sortedCp).toDouble * 0.95 * ps
        val ptser = math.max(partialR(t0, t1),
          math.max(partialR(t0, t2), partialR(t1, t2))).toDouble *
          0.95 * ps
        math.max(math.max(base, partial), math.max(ptsor, ptser))
      } else {
        val tsor = ratio(lp.sortedCp, rp.sortedCp).toDouble * 0.95
        val tser = math.max(ratio(t0, t1),
          math.max(ratio(t0, t2), ratio(t1, t2))).toDouble * 0.95
        math.max(base, math.max(tsor, tser))
      }
    java.math.BigDecimal.valueOf(blended)
      .setScale(0, java.math.RoundingMode.HALF_UP).intValue
  }

  /** Fuzzy top-1 join under full WRatio — the reference's actual scorer
    * (`process.extract` defaults to WRatio, get_similarity.py:148-152).
    * WRatio admits no lossless length band (token_set scores 100 across
    * any length gap), so candidates are the full distinct-left ×
    * broadcast-right product — the reference's own O(|L|·|R|) contract,
    * distributed: the right side is a broadcast-scale constant (same
    * bound as any broadcast build side), left keys stream through
    * executors, and the kernel keeps one best per left key per
    * partition. Per-side token prep runs once per key, not per pair.
    * Rows whose best is below `minScore` keep a null match. */
  def fuzzyTop1JoinWRatio(left: DataFrame, leftKey: String,
                          right: DataFrame, rightKey: String,
                          minScore: Int = 60,
                          scoreCol: String = "similarity",
                          maxRightKeys: Int = DefaultMaxRightKeys)
      : DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val rKeys = collectRightKeys(right, rightKey, maxRightKeys,
      "fuzzyTop1JoinWRatio")
    val bc = spark.sparkContext.broadcast(rKeys)
    val l = fanOut(left.select(col(leftKey).cast("string")).distinct())
    val best = l.as[String].mapPartitions { it =>
      val rs = bc.value.map(r => (r, prepKey(r)))
      val scratch = new LevScratch
      it.flatMap { lk =>
        if (lk == null) Iterator.empty
        else {
          val lp = prepKey(lk)
          var bestScore = -1; var bestR: String = null
          rs.foreach { case (rk, rp) =>
            val sc = wRatioKernel(lp, rp, scratch)
            if (sc > bestScore ||
                (sc == bestScore && (bestR == null || utf8Gt(rk, bestR)))) {
              bestScore = sc; bestR = rk
            }
          }
          if (bestScore >= minScore) Iterator.single((lk, bestR, bestScore))
          else Iterator.empty
        }
      }
    }.toDF(leftKey, rightKey, scoreCol)
    left.join(best, Seq(leftKey), "left")
  }
}
