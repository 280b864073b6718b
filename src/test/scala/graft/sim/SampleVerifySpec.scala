package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The threshold-adaptive band geometry and the bottom-k sampled-Jaccard
  * cascade stage (round-7 additions to [[MinHashLSH]]/[[SetVerify]]). */
class SampleVerifySpec extends SparkSpec {
  import spark.implicits._

  test("geometryFor fits bands from the threshold S-curve and keeps " +
       "the frozen default at t=0.8") {
    assert(MinHashLSH.geometryFor(0.8) == MinHashLSH.DefaultGeometry)
    assert(MinHashLSH.geometryFor(0.7) == LshGeometry(8, 6))
    assert(MinHashLSH.geometryFor(0.9) == LshGeometry(2, 6))
    // clamps: very low thresholds saturate at 32 bands, very high at 2
    assert(MinHashLSH.geometryFor(0.5).bands == 32)
    assert(MinHashLSH.geometryFor(1.0).bands == 2)
    intercept[IllegalArgumentException](MinHashLSH.geometryFor(0.0))
    intercept[IllegalArgumentException](MinHashLSH.geometryFor(1.5))
  }

  test("the size prune stays provably safe off the 0.1 threshold grid: " +
       "floor, not round") {
    // round(t*10) made the prune require a size ratio ABOVE the
    // threshold whenever rounding went up: at t=0.75 it demanded
    // min/max >= 0.8 and silently dropped pairs with true J in
    // [0.75, 0.8) — beyond the documented LSH approximation. The floor
    // keeps tNum/10 <= t for every threshold (with only binary-
    // representation error cancelled), so the prune can never exclude
    // a pair at or above the threshold.
    assert(MinHashLSH.tNumOf(0.6) == 6L && MinHashLSH.tNumOf(0.7) == 7L)
    assert(MinHashLSH.tNumOf(0.8) == 8L && MinHashLSH.tNumOf(0.9) == 9L)
    assert(MinHashLSH.tNumOf(0.75) == 7L, "off-grid must floor, not round")
    assert(MinHashLSH.tNumOf(0.76) == 7L)
    // end to end: J = 0.75 at size ratio 0.75 (a subset pair) must
    // survive verifyCandidates at t = 0.75; the rounded prune dropped
    // it (10*12 < 8*16). Elements are spread hash-like values — NOT
    // consecutive ints, whose arithmetic-progression minima under the
    // affine permutations are correlated and would sink the (separate,
    // honestly approximate) agreement floor; this fixture's agreement
    // is a fixed 28 >= ceil(0.70*36) = 26 under the frozen constants.
    val t = 0.75
    val geom = MinHashLSH.geometryFor(t)
    val elems = Seq(3626764237L, 1654615998L, 3255389356L, 3823568514L,
      1806341205L, 173879092L, 1112038970L, 4146640122L, 2195908194L,
      2087043557L, 1739178872L, 3943786419L, 3366389305L, 3564191072L,
      1302718217L, 4156669319L)
    val base = Seq((1L, elems), (2L, elems.take(12)))
      .toDF("id", "sh")
    val sigF = base.select($"id", $"sh", size($"sh").as("n"),
      array((0 until geom.numPerm)
        .map(j => MinHashLSH.minhash($"sh", j)): _*).as("sig"))
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = MinHashLSH.verifyCandidates(cand, sigF, t, geom)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.75)))
  }

  test("geometryFor band recall tracks the S-curve design point for " +
       "t in {0.6, 0.7, 0.8, 0.9} on planted pairs (property)") {
    // pins the recall side of the fitted geometry: a future edit to
    // geometryFor/minAgree cannot silently trade band recall away.
    // Pure-JVM minhash over independent random sets (the regime the
    // S-curve models); deterministic seed, so the observed fractions
    // are fixed numbers compared against the analytic curve at the
    // pairs' ACTUAL planted Jaccard.
    val rnd = new scala.util.Random(101)
    val m = 200
    val pairs = 150
    for (t <- Seq(0.6, 0.7, 0.8, 0.9)) {
      val geom = MinHashLSH.geometryFor(t)
      val jTarget = t + 0.03
      val s = math.round(2 * m * jTarget / (1 + jTarget)).toInt
      val jTrue = s.toDouble / (2 * m - s)
      var hits = 0
      for (_ <- 0 until pairs) {
        val shared = Array.fill(s)(rnd.nextLong() >>> 12)
        val onlyA = Array.fill(m - s)(rnd.nextLong() >>> 12)
        val onlyB = Array.fill(m - s)(rnd.nextLong() >>> 12)
        def sig(set: Array[Long]): Array[Long] =
          Array.tabulate(geom.numPerm) { j =>
            val a = MinHashLSH.permA(j); val b = MinHashLSH.permB(j)
            var mn = Long.MaxValue
            set.foreach { h =>
              val v = (a * h + b) % MinHashLSH.P
              if (v < mn) mn = v
            }
            mn
          }
        val sa = sig(shared ++ onlyA)
        val sb = sig(shared ++ onlyB)
        val collide = (0 until geom.bands).exists { b =>
          (0 until geom.rows).forall(r =>
            sa(b * geom.rows + r) == sb(b * geom.rows + r))
        }
        if (collide) hits += 1
      }
      val obs = hits.toDouble / pairs
      val pred = 1 - math.pow(1 - math.pow(jTrue, geom.rows), geom.bands)
      // 0.12 ≈ 3σ of the 150-pair sample at p ≈ 0.5
      assert(math.abs(obs - pred) <= 0.12,
        s"t=$t: observed band recall $obs vs S-curve $pred ($geom)")
    }
  }

  test("bottom-k sample prune kernel equals the Column-form estimator " +
       "on random sets spanning the sketch width (property)") {
    val rnd = new scala.util.Random(7)
    val k = MinHashLSH.BottomK
    // element universe of 500 over set sizes 20..320 → pair unions land
    // both under and over the k=128 sketch width, and estimates span
    // the whole [0,1] range including exact-threshold hits
    val sets = (0L until 40L).map { i =>
      val m = 20 + rnd.nextInt(300)
      (i, Seq.fill(m)(rnd.nextInt(500).toLong).distinct.sorted)
    }
    val sb = sets.toDF("id", "sh")
      .select($"id", slice(array_sort($"sh"), 1, k).as("sb"))
    val ids = sb.select($"id")
    val cand = ids.select($"id".as("doc_a"))
      .crossJoin(ids.select($"id".as("doc_b")))
      .filter($"doc_a" < $"doc_b")
    val floor = 0.35
    val viaKernel = SetVerify.samplePrune(cand, sb, floor, k)
      .as[(Long, Long)].collect().toSet
    val a = sb.select($"id".as("doc_a"), $"sb".as("sb_a"))
    val b = sb.select($"id".as("doc_b"), $"sb".as("sb_b"))
    val merged = slice(array_sort(array_union($"sb_a", $"sb_b")), 1, k)
    val est = size(array_intersect(array_intersect(merged, $"sb_a"),
        $"sb_b")).cast("double") / size(merged).cast("double")
    val viaColumns = a.join(b, $"doc_a" < $"doc_b")
      .filter(est >= floor).select($"doc_a", $"doc_b")
      .as[(Long, Long)].collect().toSet
    assert(viaKernel == viaColumns)
    assert(viaColumns.nonEmpty, "degenerate fixture: nothing survived")
    assert(viaKernel.size < 40 * 39 / 2, "degenerate: nothing pruned")
  }

  test("sample prune is exact when the union fits the sketch: survivors" +
       " are exactly the pairs with sampled-floor-passing true jaccard") {
    // small sets (union <= k): the sketch IS the set, the estimate IS
    // the exact jaccard, so the prune equals a plain threshold filter
    val sets = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
      (2L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L)),  // J(1,2)=7/9≈0.78
      (3L, Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 14L)), // J(1,3)=3/13≈0.23
      (4L, Seq(20L, 21L, 22L)))                    // J(·,4)=0
    val sb = sets.toDF("id", "sb")
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
      .toDF("doc_a", "doc_b")
    val kept = SetVerify
      .samplePrune(cand, sb, 0.5, MinHashLSH.BottomK)
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L)))
  }

  test("the compositional verifyCandidates API equals the fused " +
       "nearDupPairs path on the same candidates (property)") {
    // since the band-join fusion no gate exercises verifyCandidates —
    // this pins the still-public compositional form (floor via
    // signature re-join) to the fused operator so they cannot drift
    val rnd = new scala.util.Random(29)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val base = (0L until 20L).map { i =>
      (i, Seq.fill(8 + rnd.nextInt(10))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val clones = (0L until 10L).map { i =>
      (100L + i, base(i.toInt)._2 + " " + vocab(rnd.nextInt(vocab.size)))
    }
    val docs = (base ++ clones).toDF("doc_id", "text")
    val t = 0.7
    val geom = MinHashLSH.geometryFor(t)
    val all = graft.core.Fence(
      MinHashLSH.signatureFrame(docs, "doc_id", "text", 3, geom))
    val bands = MinHashLSH.bandFrame(all, geom)
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band_idx" === $"b.band_idx" &&
          $"a.band_key" === $"b.band_key" && $"a.id" < $"b.id")
      .select($"a.id".as("doc_a"), $"b.id".as("doc_b")).distinct()
    val viaCompositional = MinHashLSH.verifyCandidates(cand, all, t, geom)
      .as[(Long, Long, Double)].collect().toSet
    val viaFused = MinHashLSH.nearDupPairs(docs, "doc_id", "text", 3, t)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaCompositional == viaFused)
    assert(viaFused.nonEmpty, "degenerate fixture: no pairs found")
  }

  test("the fitted 2x6 geometry at t=0.9 still finds planted " +
       "near-identical docs end to end") {
    // gates exercise t=0.7 (8x6) and t=0.8 (4x6); this pins the third
    // geometry regime's wiring (numPerm=12, floor=ceil(0.85*12)=11)
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cat sleeps near the warm fire in deep winter evenings again"
    val docs = Seq((1L, base), (2L, base.replace("deep", "dark")),
        (3L, "completely unrelated content about catalyst optimizer " +
          "rules and whole stage code generation internals"))
      .toDF("doc_id", "text")
    val out = MinHashLSH.nearDupPairs(docs, "doc_id", "text",
        threshold = 0.9)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("non-integral id columns fail fast with the remedy named " +
       "instead of silently returning empty results") {
    val docs = Seq(("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      MinHashLSH.nearDupPairs(docs, "doc_id", "text", 3, 0.8)
    }
    assert(e.getMessage.contains("integral"))
    assert(e.getMessage.contains("monotonically_increasing_id"))
    val e2 = intercept[IllegalArgumentException] {
      JaccardJoin.selfJoinWords(docs, "doc_id", "text", 2, 0.5)
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("the t=0.7 cascade operator equals its full Column-form twin " +
       "end to end (property)") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val base = (0L until 25L).map { i =>
      (i, Seq.fill(8 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // clones with small edits land across the mid-to-high J range
    val clones = (0L until 12L).map { i =>
      (100L + i, base(i.toInt)._2 + " " + vocab(rnd.nextInt(vocab.size)))
    }
    val docs = (base ++ clones).toDF("doc_id", "text")
    val t = 0.7
    val geom = MinHashLSH.geometryFor(t)
    val viaOperator = MinHashLSH
      .nearDupPairs(docs, "doc_id", "text", 3, t)
      .as[(Long, Long, Double)].collect().toSet

    // Column-form twin of every cascade stage, built from the
    // already-pinned Column primitives (minhash / shingleHashes)
    import graft.text.TextHash
    val shf = graft.core.Fence(docs.select($"doc_id".as("id"),
      TextHash.shingleHashesFromCodes(
        TextHash.charCodes($"text"), 3).as("sh")))
    val sig = shf.select($"id", $"sh", size($"sh").as("n"),
      array((0 until geom.numPerm)
        .map(j => MinHashLSH.minhash($"sh", j)): _*).as("sig"))
    val bands = MinHashLSH.bandFrame(
      sig.select($"id", $"sh", $"n", $"sig"), geom)
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band_idx" === $"b.band_idx" &&
          $"a.band_key" === $"b.band_key" && $"a.id" < $"b.id")
      .select($"a.id".as("doc_a"), $"b.id".as("doc_b")).distinct()
    val ga = sig.select($"id".as("doc_a"), $"n".as("n_a"),
      $"sig".as("sig_a"), $"sh".as("sh_a"),
      slice(array_sort($"sh"), 1, MinHashLSH.BottomK).as("sb_a"))
    val gb = sig.select($"id".as("doc_b"), $"n".as("n_b"),
      $"sig".as("sig_b"), $"sh".as("sh_b"),
      slice(array_sort($"sh"), 1, MinHashLSH.BottomK).as("sb_b"))
    val agree = size(filter(
      zip_with($"sig_a", $"sig_b", (x, y) => x === y), v => v))
    val merged = slice(array_sort(array_union($"sb_a", $"sb_b")), 1,
      MinHashLSH.BottomK)
    val sampEst = size(array_intersect(array_intersect(merged, $"sb_a"),
      $"sb_b")).cast("double") / size(merged).cast("double")
    val inter = size(array_intersect($"sh_a", $"sh_b"))
    val union = size($"sh_a") + size($"sh_b") - inter
    val viaColumns = cand.join(ga, Seq("doc_a")).join(gb, Seq("doc_b"))
      .filter(lit(10) * least($"n_a", $"n_b") >=
        lit(math.round(t * 10)) * greatest($"n_a", $"n_b"))
      .filter(agree >= MinHashLSH.minAgree(t, geom.numPerm))
      .filter(sampEst >= t - 0.05)
      .select($"doc_a", $"doc_b",
        (inter.cast("double") / union).as("jacc"))
      .filter($"jacc" >= t)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaOperator == viaColumns)
    assert(viaOperator.nonEmpty, "degenerate fixture: no pairs found")
  }
}
