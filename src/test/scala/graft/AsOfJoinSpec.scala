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

  private def forAllSamples[T](gen: Gen[T], n: Int)(f: T => Unit): Unit =
    (1 to n).foreach(_ => gen.sample.foreach(f))
}
