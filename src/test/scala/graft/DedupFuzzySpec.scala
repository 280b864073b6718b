package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ops.Dedup
import graft.sim.Fuzzy

class DedupFuzzySpec extends SparkSpec {
  import spark.implicits._

  def forAllSamples[T](gen: Gen[T], n: Int = 100)(f: T => Unit): Unit =
    (1 to n).foreach(_ => gen.sample.foreach(f))

  test("dedupKeepLast keeps the max-order row per key, ties by tieBreak") {
    val df = Seq(
      ("a", 1, 10), ("a", 3, 11), ("a", 3, 9),
      ("b", 2, 20)).toDF("k", "prio", "id")
    val out = Dedup.dedupKeepLast(df, Seq("k"), $"prio", $"id")
      .orderBy($"k").as[(String, Int, Int)].collect()
    assert(out.toSeq == Seq(("a", 3, 9), ("b", 2, 20)))
  }

  test("exactDedup keeps one representative per content, min id") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other"))
      .toDF("id", "text")
    val out = Dedup.exactDedup(df, $"text", $"id")
      .orderBy($"id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "same"), (3L, "other")))
  }

  test("connectedComponents: chains resolve transitively, components " +
       "stay separate") {
    // component {1,2,3,4} via a chain (A~B, B~C, C~D — no direct A~D),
    // component {10,11}, and 7 appears in no pair
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(cc == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("clusterDedup keeps the smallest id per cluster and all " +
       "unpaired rows") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (7L, "solo"), (10L, "x"), (11L, "y")).toDF("doc_id", "text")
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.clusterDedup(docs, "doc_id", pairs)
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (7L, "solo"), (10L, "x")))
  }

  test("connectedComponents equals a local union-find on random " +
       "graphs (property)") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = Seq.fill(50)(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find merging the larger root under the smaller, so each
      // root is its component's minimum id
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a.toInt); val rb = find(b.toInt)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.map(id => id -> find(id.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == want)
    }
  }

  test("connectedComponents resolves a 1,000-node chain (diameter 999)" +
       " in logarithmically many rounds") {
    // plain min-label propagation needs ~999 rounds here and would trip
    // any sane maxRounds; the pointer-jumping step doubles label reach
    // per round (2^k − 1 after k rounds), so 15 rounds must suffice
    val pairs = spark.range(0, 999)
      .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    val labels = Dedup.connectedComponents(pairs, maxRounds = 15)
      .as[(Long, Long)].collect()
    assert(labels.length == 1000)
    assert(labels.forall(_._2 == 0L))
  }

  test("connectedComponents fails loudly past maxRounds instead of " +
       "looping") {
    // a 5-chain needs ~4 rounds; cap at 1 to hit the guard
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException](
      Dedup.connectedComponents(pairs, maxRounds = 1).count())
    assert(e.getMessage.contains("maxRounds"))
  }

  test("levenshteinRatio bounds and symmetry (property)") {
    val gs = Gen.alphaNumStr.map(_.take(20))
    forAllSamples(Gen.zip(gs, gs)) { case (a, b) =>
      val Array(r1, r2) = Seq((a, b), (b, a)).toDF("a", "b")
        .select(Fuzzy.levenshteinRatio($"a", $"b")).as[Int].collect()
      assert(r1 == r2, s"symmetry for ($a,$b)")
      assert(r1 >= 0 && r1 <= 100)
      if (a == b) assert(r1 == 100)
    }
  }

  test("bounded ratio equals plain ratio at-or-above threshold") {
    val pairs = Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
      ("abcdefghij", "zzzzzzzzzz"), ("short", "a-much-longer-string"))
    val df = pairs.toDF("a", "b")
    val both = df.select(
      Fuzzy.levenshteinRatio($"a", $"b").as("plain"),
      Fuzzy.levenshteinRatioBounded($"a", $"b", 60).as("bounded"))
      .as[(Int, Option[Int])].collect()
    both.foreach { case (plain, bounded) =>
      if (plain >= 60) assert(bounded.contains(plain))
      else assert(bounded.isEmpty)
    }
  }

  test("tokenSortRatio is word-order invariant") {
    val out = Seq(("hello big world", "world big hello"))
      .toDF("a", "b")
      .select(Fuzzy.tokenSortRatio($"a", $"b").as("tsr"),
        Fuzzy.levenshteinRatio($"a", $"b").as("plain"))
      .as[(Int, Int)].collect()(0)
    assert(out._1 == 100 && out._2 < 100)
  }

  test("tokenSetRatio: word-subset pairs score 100 (property)") {
    // any pair where one side's word set contains the other's must be 100
    val word = Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty)
    val words = Gen.nonEmptyListOf(word).map(_.take(5).distinct)
    forAllSamples(words, 40) { ws =>
      val full = ws.mkString(" ")
      val sub = ws.take(1 + ws.size / 2).mkString(" ")
      val (tsr, plain) = Seq((full, sub)).toDF("a", "b")
        .select(Fuzzy.tokenSetRatio($"a", $"b"),
          Fuzzy.levenshteinRatio($"a", $"b"))
        .as[(Int, Int)].collect()(0)
      assert(tsr == 100, s"token_set($full, $sub) = $tsr")
      if (ws.size > 1 && sub != full) assert(plain < 100)
    }
  }

  test("tokenSetRatio bounds and symmetry (property)") {
    val gs = Gen.listOfN(3, Gen.alphaLowerStr.map(_.take(5)))
      .map(_.mkString(" ").trim)
    forAllSamples(Gen.zip(gs, gs), 40) { case (a, b) =>
      val Array(r1, r2) = Seq((a, b), (b, a)).toDF("a", "b")
        .select(Fuzzy.tokenSetRatio($"a", $"b")).as[Int].collect()
      assert(r1 == r2, s"symmetry for ($a,$b)")
      assert(r1 >= 0 && r1 <= 100)
    }
  }

  test("partialRatio: substring pairs score 100 (property)") {
    val gs = Gen.alphaNumStr.suchThat(_.length >= 4).map(_.take(20))
    forAllSamples(gs, 40) { s =>
      val sub = s.substring(1, 1 + s.length / 2)
      val (pr, plain) = Seq((s, sub)).toDF("a", "b")
        .select(Fuzzy.partialRatio($"a", $"b"),
          Fuzzy.levenshteinRatio($"a", $"b"))
        .as[(Int, Int)].collect()(0)
      assert(pr == 100, s"partial($s, $sub) = $pr")
      if (sub != s) assert(plain < 100)
    }
  }

  test("partialRatio equals plain ratio on equal-length strings") {
    val gs = Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
    forAllSamples(Gen.zip(gs, gs), 30) { case (a, b) =>
      val (pr, plain) = Seq((a, b)).toDF("a", "b")
        .select(Fuzzy.partialRatio($"a", $"b"),
          Fuzzy.levenshteinRatio($"a", $"b"))
        .as[(Int, Int)].collect()(0)
      assert(pr == plain, s"($a,$b): partial=$pr plain=$plain")
    }
  }

  test("wRatio dominates its components' floors and spots subsets " +
       "plain ratio misses") {
    val rows = Seq(
      ("alpha beta gamma", "gamma alpha beta"),   // permutation → ~95
      ("alpha corp holdings intl", "corp"),       // word subset, len>1.5×
      ("identical string", "identical string"),   // exact → 100
      ("abcdef", "xyzuvw"))                       // unrelated → low
      .toDF("a", "b")
      .select(Fuzzy.wRatio($"a", $"b"), Fuzzy.levenshteinRatio($"a", $"b"))
      .as[(Int, Int)].collect()
    val (w0, p0) = rows(0); assert(w0 >= 95 && p0 < w0)
    val (w1, p1) = rows(1); assert(w1 >= 85 && p1 < w1)
    assert(rows(2)._1 == 100)
    assert(rows(3)._1 < 50)
    // blended score stays within [0, 100]
    rows.foreach { case (w, _) => assert(w >= 0 && w <= 100) }
  }

  test("wRatioStaged is formula-identical to wRatio") {
    val pairs = Seq(
      ("alpha beta gamma", "gamma alpha beta"),
      ("alpha corp holdings intl", "corp"),
      ("identical string", "identical string"),
      ("abcdef", "xyzuvw"),
      ("blue bolt", "SMALL"),              // disjoint tokens, >1.5× gap
      ("a much longer sentence here", "x") // >8× gap → 0.6 scale
    )
    def srt(c: org.apache.spark.sql.Column) =
      array_join(sort_array(split(c, " +")), " ")
    val out = pairs.toDF("a", "b")
      .select(Fuzzy.wRatio($"a", $"b"),
        Fuzzy.wRatioStaged($"a", $"b", srt($"a"), srt($"b"),
          Fuzzy.tokenSetTriple($"a", $"b")))
      .as[(Int, Int)].collect()
    out.zip(pairs).foreach { case ((w, ws), p) =>
      assert(w == ws, s"divergence on $p: inline=$w staged=$ws")
    }
  }

  test("wRatioKernel equals the Column wRatio (property)") {
    // ~10% supplementary-plane codepoints: the kernel DP must count
    // codepoints like length()/levenshtein() do, not UTF-16 units
    val cp = Gen.frequency(
      9 -> Gen.alphaLowerChar.map(_.toString),
      1 -> Gen.oneOf("😀", "🤖", "𣎴"))
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, cp).map(_.mkString))
    val phrase = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    forAllSamples(Gen.zip(phrase, phrase), 60) { case (a, b) =>
      val viaColumn = Seq((a, b)).toDF("a", "b")
        .select(Fuzzy.wRatio($"a", $"b")).as[Int].collect()(0)
      val viaKernel = Fuzzy.wRatioKernel(Fuzzy.prepKey(a), Fuzzy.prepKey(b))
      assert(viaColumn == viaKernel, s"($a, $b)")
    }
  }

  test("fuzzyTop1JoinWRatio: word-subset matches win where plain " +
       "levenshtein would miss them") {
    val left = Seq((1, "alpha corp holdings intl"), (2, "zzz qqq vvv"))
      .toDF("id", "name")
    val right = Seq("corp", "unrelated words").toDF("r")
    val out = Fuzzy.fuzzyTop1JoinWRatio(left, "name", right, "r", 60)
      .orderBy($"id").select($"id", $"r", $"similarity")
      .as[(Int, Option[String], Option[Int])].collect()
    // "corp" ⊂ tokens of row 1 → partial-token-set drives a high score
    assert(out(0)._2.contains("corp") && out(0)._3.exists(_ >= 60))
    // fuzzywuzzy quirk faithfully reproduced: with a >1.5× length gap
    // and disjoint token sets, partial_token_set is 100 (empty
    // intersection slides anywhere), so WRatio = round(100·0.95·0.9)=86
    assert(out(1)._2.contains("corp") && out(1)._3.contains(86))
    // a stricter threshold turns the quirk-band into a null match
    val strict = Fuzzy.fuzzyTop1JoinWRatio(left, "name", right, "r", 90)
      .orderBy($"id").select($"id", $"r", $"similarity")
      .as[(Int, Option[String], Option[Int])].collect()
    assert(strict(1)._2.isEmpty && strict(1)._3.isEmpty)
  }

  test("broadcast-contract joins fail fast past the right-key bound, " +
       "naming the banded alternative") {
    val left = Seq((1, "alpha")).toDF("id", "name")
    val right = Seq("alpha", "alphb", "alphc").toDF("r_name")
    Seq(
      () => Fuzzy.fuzzyTopKJoin(left, "name", right, "r_name", 1,
        maxRightKeys = 2).count(),
      () => Fuzzy.fuzzyTop1JoinWRatio(left, "name", right, "r_name",
        maxRightKeys = 2).count(),
      () => Fuzzy.fuzzyTop1Join(left, "name", right, "r_name",
        maxRightKeys = 2).count()
    ).foreach { run =>
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains("fuzzyTop1JoinBanded"))
    }
    // at the bound (3 keys <= 3) all still run
    assert(Fuzzy.fuzzyTopKJoin(left, "name", right, "r_name", 1,
      maxRightKeys = 3).count() == 1)
    assert(Fuzzy.fuzzyTop1Join(left, "name", right, "r_name",
      maxRightKeys = 3).count() == 1)
    assert(Fuzzy.fuzzyTop1JoinWRatio(left, "name", right, "r_name",
      maxRightKeys = 3).count() == 1)
  }

  test("fuzzyTopKJoin returns k ranked matches with payload") {
    val left = Seq((1, "alpha")).toDF("id", "name")
    val right = Seq("alphax", "alphayy", "zzzzz").toDF("r")
    val out = Fuzzy.fuzzyTopKJoin(left, "name", right, "r", 2)
      .orderBy($"rank")
      .select($"id", $"rank", $"r").as[(Int, Int, String)].collect()
    assert(out.toSeq == Seq((1, 1, "alphax"), (1, 2, "alphayy")))
  }

  test("fuzzyTopKJoin kernel matches the declarative window form " +
       "(property)") {
    val word = Gen.choose(3, 10).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    forAllSamples(Gen.zip(Gen.listOfN(12, word), Gen.listOfN(6, word)), 5) {
      case (ls, rs) =>
        val left = ls.distinct.zipWithIndex
          .map { case (n, i) => (i, n) }.toDF("id", "name")
        val right = rs.distinct.toDF("r")
        val viaKernel = Fuzzy.fuzzyTopKJoin(left, "name", right, "r", 3)
          .select($"name", $"r", $"similarity", $"rank")
          .as[(String, String, Int, Int)].collect().toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"name").orderBy($"similarity".desc, $"r".desc)
        val viaWindow = left.select($"name").distinct()
          .crossJoin(broadcast(right))
          .withColumn("similarity", Fuzzy.levenshteinRatio($"name", $"r"))
          .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
          .select($"name", $"r", $"similarity", $"rank")
          .as[(String, String, Int, Int)].collect().toSet
        assert(viaKernel == viaWindow)
    }
  }

  test("banded kernel counts codepoints, not UTF-16 units (non-BMP)") {
    // "😀😀😀😀a" is 5 codepoints / 9 UTF-16 units; a UTF-16 kernel
    // would compute a different ratio and band than the Column form
    val left = Seq((1, "😀😀😀😀a")).toDF("id", "name")
    val right = Seq("😀😀😀😀b", "zzzzz").toDF("r")
    val out = Fuzzy.fuzzyTop1JoinBanded(left, "name", right, "r", 60)
      .select($"r", $"similarity")
      .as[(Option[String], Option[Int])].collect()(0)
    val expected = Seq(("😀😀😀😀a", "😀😀😀😀b")).toDF("a", "b")
      .select(Fuzzy.levenshteinRatio($"a", $"b")).as[Int].collect()(0)
    assert(expected == 80) // 1 edit over 5 codepoints
    assert(out == (Some("😀😀😀😀b"), Some(expected)))
  }

  test("fuzzyTop1Join attaches best match to full left payload") {
    val left = Seq((1, "alpha corp"), (2, "beta inc"), (3, "gamma llc"))
      .toDF("id", "name")
    val right = Seq("alpha corporation", "betta inc", "delta co").toDF("r")
    val out = Fuzzy.fuzzyTop1Join(left, "name", right, "r")
      .orderBy($"id")
      .select($"id", $"name", $"r", $"similarity")
      .as[(Int, String, String, Int)].collect()
    assert(out.length == 3) // full left payload preserved
    assert(out(0)._3 == "alpha corporation")
    assert(out(1)._3 == "betta inc")
  }

  test("banded join: salted fallback matches broadcast output on a " +
       "skewed-length corpus and needs no broadcast") {
    // every name length 10 → one hot band key; salting must spread it
    // without changing the result
    val left = (1 to 60).map(i => (i, f"leftname$i%02d")).toDF("id", "name")
    val right = (1 to 30).map(i => f"leftnam${i}%03d").toDF("r")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"r", $"similarity")
        .as[(Int, Option[String], Option[Int])].collect().sortBy(_._1).toSeq
    val plain = Fuzzy.fuzzyTop1JoinBanded(left, "name", right, "r", 60)
    val salted = Fuzzy.fuzzyTop1JoinBanded(left, "name", right, "r", 60,
      saltBuckets = 4)
    assert(rows(plain) == rows(salted))
    // the salted band join itself must not require a broadcast: with
    // broadcast planning disabled the query still runs (and matches)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val saltedNoBc = Fuzzy.fuzzyTop1JoinBanded(left, "name", right, "r",
        60, saltBuckets = 4)
      assert(rows(saltedNoBc) == rows(plain))
      assert(!saltedNoBc.queryExecution.sparkPlan.toString
        .contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("banded kernel equals the expression-based broadcast join " +
       "(property)") {
    // the banded form scores pairs in a mapPartitions kernel; it must
    // agree with the pure-expression crossJoin arg-max (thresholded)
    // on winner, score, and tie-break
    val word = Gen.choose(4, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    forAllSamples(Gen.zip(Gen.listOfN(30, word), Gen.listOfN(10, word)), 5) {
      case (ls, rs) =>
        val left = ls.distinct.zipWithIndex
          .map { case (n, i) => (i, n) }.toDF("id", "name")
        val right = rs.distinct.toDF("r")
        val banded = Fuzzy.fuzzyTop1JoinBanded(left, "name", right, "r", 60)
          .select($"name", $"r", $"similarity")
          .as[(String, Option[String], Option[Int])].collect().toSet
        val expr = Fuzzy.fuzzyTop1Join(left, "name", right, "r")
          .select($"name", $"r", $"similarity")
          .as[(String, Option[String], Option[Int])].collect()
          .map { case (n, r, s) =>
            if (s.exists(_ >= 60)) (n, r, s) else (n, None, None) }.toSet
        assert(banded == expr)
    }
  }

  test("leakageSafeSplit: no pair straddles the boundary, members " +
       "share their component's cluster, unpaired docs split on " +
       "their own id") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id",
      "text")
    // a 4-chain, a 2-cycle and a star — plus 33 unpaired docs
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L), (20L, 23L)).toDF("id_a", "id_b")
    val out = Dedup.leakageSafeSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, String)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.size == 40)
    // every component member carries the component MIN as cluster and
    // therefore the same side
    Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 11L), Seq(20L, 21L, 22L, 23L))
      .foreach { comp =>
        val rows = comp.map(byId)
        assert(rows.forall(_._2 == comp.min), rows.toString)
        assert(rows.map(_._3).distinct.size == 1, rows.toString)
      }
    // unpaired docs cluster on themselves
    val unpaired = (1L to 40L).toSet --
      Set(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L, 22L, 23L)
    assert(unpaired.forall(i => byId(i)._2 == i))
    // the side is the documented hash rule — and both sides occur
    out.foreach { case (_, cl, sp) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(cl.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(2)
      assert(sp == (if (h < "29") "eval" else "train"))
    }
    assert(out.map(_._3).distinct.sorted == Seq("eval", "train"))
  }

  test("banded join: below-threshold rows get null match") {
    // ratio("alpha corp","alpha corporation") = floor(100*(17-7)/17) = 58
    val left = Seq((1, "alpha corp"), (2, "zzzzzz")).toDF("id", "name")
    val right = Seq("alpha corporation").toDF("r")
    val out = Fuzzy.fuzzyTop1JoinBanded(left, "name", right, "r", 50)
      .orderBy($"id")
      .select($"id", $"r", $"similarity")
      .as[(Int, Option[String], Option[Int])].collect()
    assert(out(0)._2.contains("alpha corporation"))
    assert(out(0)._3.contains(58))
    assert(out(1)._2.isEmpty && out(1)._3.isEmpty)
  }
}
