package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("asOf attaches the latest right row at or before each left time") {
    // user 1: click strictly before, click at the exact purchase ts
    // (inclusive match wins), later click ignored; user 2: no clicks
    val left = Seq((100L, 1L, ts(10)), (101L, 1L, ts(20)),
                   (102L, 2L, ts(10)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(5), 900L, 1.0), (1L, ts(10), 901L, 2.0),
                    (1L, ts(15), 902L, 3.0), (1L, ts(25), 903L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
        Seq("ts", "value"))
      .select($"event_id", $"asof_ts", $"asof_value")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    assert(out == Set(
      (100L, Some(ts(10)), Some(2.0)),   // equal-ts click matches
      (101L, Some(ts(15)), Some(3.0)),   // latest preceding, not ts(25)
      (102L, None, None)))               // no right rows for user 2
  }

  test("right-side timestamp collisions resolve to the highest seq") {
    val left = Seq((1L, 7L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts(5), 900L, 1.0), (7L, ts(5), 950L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
        Seq("value"))
      .select($"asof_value").as[Double].collect().toSeq
    assert(out == Seq(2.0))
  }

  test("asOf matches a naive range-join arg-max (property)") {
    val row = for {
      u <- Gen.choose(1L, 4L); m <- Gen.choose(0, 30)
      v <- Gen.choose(0, 99)
    } yield (u, m, v.toDouble)
    forAllSamples(Gen.zip(Gen.listOfN(25, row), Gen.listOfN(25, row)), 5) {
      case (ls, rs) =>
        val left = ls.zipWithIndex.map { case ((u, m, _), i) =>
          (i.toLong, u, ts(m)) }.toDF("event_id", "user_id", "ts")
        val right = rs.zipWithIndex.map { case ((u, m, v), i) =>
          (u, ts(m), 1000L + i, v) }.toDF("user_id", "ts", "event_id",
          "value")
        val got = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
            Seq("value"))
          .select($"event_id", $"asof_value")
          .as[(Long, Option[Double])].collect().toSet
        // naive: range join + arg-max by (ts, seq) — the O(|L|·|R|)
        // form the window encoding must agree with
        val naive = ls.zipWithIndex.map { case ((u, m, _), i) =>
          val best = rs.zipWithIndex
            .filter { case ((ru, rm, _), _) => ru == u && rm <= m }
            .sortBy { case ((_, rm, _), j) => (rm, j) }.lastOption
          (i.toLong, best.map(_._1._3))
        }.toSet
        assert(got == naive)
    }
  }

  test("forward picks the earliest right at-or-after (inclusive), " +
       "nearest picks the closer side with exact ties to backward, " +
       "unknown directions are refused") {
    val left = Seq((100L, 1L, ts(10)), (101L, 1L, ts(20)),
                   (102L, 1L, ts(40)), (103L, 2L, ts(10)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(4), 900L, 1.0), (1L, ts(10), 901L, 2.0),
                    (1L, ts(16), 902L, 3.0), (1L, ts(24), 903L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
    def got(dir: String) = AsOfJoin.asOf(left, right, "user_id", "ts",
        "event_id", Seq("value"), direction = dir)
      .select($"event_id", $"asof_value")
      .as[(Long, Option[Double])].collect().toSet
    assert(got("forward") == Set(
      (100L, Some(2.0)),  // equal-ts right matches forward too
      (101L, Some(4.0)),  // earliest at-or-after ts(20) is ts(24)
      (102L, None),       // nothing after ts(40)
      (103L, None)))      // no right rows for user 2
    assert(got("nearest") == Set(
      (100L, Some(2.0)),  // exact hit
      (101L, Some(3.0)),  // ts(16) at distance 4 beats ts(24) at 4? no:
                          // back=ts(16) d=4, fwd=ts(24) d=4 — TIE, so
                          // the backward match wins (the pandas rule)
      (102L, Some(4.0)),  // only a backward match exists
      (103L, None)))
    // backward default unchanged by the refactor
    assert(got("backward") == Set((100L, Some(2.0)), (101L, Some(3.0)),
      (102L, Some(4.0)), (103L, None)))
    intercept[IllegalArgumentException](got("sideways"))
  }

  test("forward and nearest match their naive range-join arg-min/" +
       "closest forms (property)") {
    val row = for {
      u <- Gen.choose(1L, 4L); m <- Gen.choose(0, 30)
      v <- Gen.choose(0, 99)
    } yield (u, m, v.toDouble)
    forAllSamples(Gen.zip(Gen.listOfN(25, row), Gen.listOfN(25, row)), 5) {
      case (ls, rs) =>
        val left = ls.zipWithIndex.map { case ((u, m, _), i) =>
          (i.toLong, u, ts(m)) }.toDF("event_id", "user_id", "ts")
        val right = rs.zipWithIndex.map { case ((u, m, v), i) =>
          (u, ts(m), 1000L + i, v) }.toDF("user_id", "ts", "event_id",
          "value")
        // canonical right row per (user, ts): highest seq
        val canon = rs.zipWithIndex
          .groupBy { case ((u, m, _), _) => (u, m) }
          .map { case (_, g) => g.maxBy(_._2) }.toSeq
        def naiveFwd(u: Long, m: Int) = canon
          .filter { case ((ru, rm, _), _) => ru == u && rm >= m }
          .sortBy { case ((_, rm, _), j) => (rm, j) }.headOption
        def naiveBack(u: Long, m: Int) = canon
          .filter { case ((ru, rm, _), _) => ru == u && rm <= m }
          .sortBy { case ((_, rm, _), j) => (rm, j) }.lastOption
        val gotF = AsOfJoin.asOf(left, right, "user_id", "ts",
            "event_id", Seq("value"), direction = "forward")
          .select($"event_id", $"asof_value")
          .as[(Long, Option[Double])].collect().toSet
        assert(gotF == ls.zipWithIndex.map { case ((u, m, _), i) =>
          (i.toLong, naiveFwd(u, m).map(_._1._3)) }.toSet)
        val gotN = AsOfJoin.asOf(left, right, "user_id", "ts",
            "event_id", Seq("value"), direction = "nearest")
          .select($"event_id", $"asof_value")
          .as[(Long, Option[Double])].collect().toSet
        assert(gotN == ls.zipWithIndex.map { case ((u, m, _), i) =>
          val b = naiveBack(u, m); val f = naiveFwd(u, m)
          val pick = (b, f) match {
            case (None, x) => x
            case (x, None) => x
            case (Some(bb), Some(ff)) =>
              if (m - bb._1._2 <= ff._1._2 - m) Some(bb) else Some(ff)
          }
          (i.toLong, pick.map(_._1._3))
        }.toSet)
    }
  }

  private def forAllSamples[T](gen: Gen[T], n: Int)(f: T => Unit): Unit =
    (1 to n).foreach(_ => gen.sample.foreach(f))
}
