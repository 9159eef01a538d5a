package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("asof: latest right row at or before left ts, per key") {
    val left = Seq((1L, ts(10), "p1"), (1L, ts(25), "p2"), (2L, ts(5), "p3"))
      .toDF("uid", "t", "what")
    val right = Seq((1L, ts(8), 100.0), (1L, ts(20), 200.0), (2L, ts(9), 300.0))
      .toDF("uid", "t", "v")
    val out = AsOfJoin.asof(left, right, "uid", "t", "t", Seq("v"))
      .select("what", "v").as[(String, Option[Double])].collect().toMap
    assert(out == Map("p1" -> Some(100.0), "p2" -> Some(200.0), "p3" -> None))
  }

  test("asof: a null value in the nearest row is served as null, not an older row's value") {
    // pandas merge_asof carries the nearest row WHOLESALE — a per-column
    // forward fill would skip the null and mix in price=10 from ts=1
    val left = Seq((1L, ts(3), "p")).toDF("uid", "t", "what")
    val right = Seq((1L, ts(1), Option(10.0), Option("a")),
      (1L, ts(2), None: Option[Double], Option("b")))
      .toDF("uid", "t", "price", "tag")
    val out = AsOfJoin.asof(left, right, "uid", "t", "t", Seq("price", "tag"))
      .select("price", "tag").as[(Option[Double], Option[String])].head()
    assert(out == ((None, Some("b"))), s"nearest row must win wholesale: $out")
  }

  test("asof: equal timestamps match (>= semantics), like DuckDB/pandas") {
    val left = Seq((1L, ts(10), "x")).toDF("uid", "t", "what")
    val right = Seq((1L, ts(10), 7.0)).toDF("uid", "t", "v")
    val out = AsOfJoin.asof(left, right, "uid", "t", "t", Seq("v"))
      .select("v").as[Double].collect()
    assert(out.toSeq == Seq(7.0))
  }

  test("asof: right rows strictly after left ts never leak backwards") {
    val left = Seq((1L, ts(10), "x")).toDF("uid", "t", "what")
    val right = Seq((1L, ts(11), 9.9)).toDF("uid", "t", "v")
    val out = AsOfJoin.asof(left, right, "uid", "t", "t", Seq("v"))
      .select("v").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None))
  }

  test("asofForward: next right row at or after left ts, per key") {
    val left = Seq((1L, ts(10), "p1"), (1L, ts(25), "p2"), (2L, ts(5), "p3"))
      .toDF("uid", "t", "what")
    val right = Seq((1L, ts(10), 100.0), (1L, ts(20), 200.0), (2L, ts(4), 300.0))
      .toDF("uid", "t", "v")
    val out = AsOfJoin.asofForward(left, right, "uid", "t", "t", Seq("v"))
      .select("what", "v").as[(String, Option[Double])].collect().toMap
    // p1: equal ts matches (>=); p2: nothing after 25; p3: 4 < 5 is past
    assert(out == Map("p1" -> Some(100.0), "p2" -> None, "p3" -> None))
  }

  test("asofNearest: closest in either direction, ties break backward") {
    val left = Seq(
      (1L, ts(10), "closer_back"),   // back at 8 (d=2), fwd at 20 (d=10)
      (1L, ts(19), "closer_fwd"),    // back at 8 (d=11), fwd at 20 (d=1)
      (1L, ts(14), "exact_tie"),     // back 8 (d=6), fwd 20 (d=6) -> back
      (2L, ts(5), "only_fwd"),       // no earlier row for key 2
      (3L, ts(5), "no_match")        // key 3 absent on the right
    ).toDF("uid", "t", "what")
    val right = Seq((1L, ts(8), 100.0), (1L, ts(20), 200.0), (2L, ts(9), 300.0))
      .toDF("uid", "t", "v")
    val out = AsOfJoin.asofNearest(left, right, "uid", "t", "t", Seq("v"))
      .select("what", "v").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "closer_back" -> Some(100.0), "closer_fwd" -> Some(200.0),
      "exact_tie" -> Some(100.0), "only_fwd" -> Some(300.0),
      "no_match" -> None))
  }

  test("asofNearest: simultaneous right row wins at distance zero") {
    val left = Seq((1L, ts(10), "now")).toDF("uid", "t", "what")
    val right = Seq((1L, ts(10), 1.0), (1L, ts(11), 2.0)).toDF("uid", "t", "v")
    val out = AsOfJoin.asofNearest(left, right, "uid", "t", "t", Seq("v"))
      .select("v").as[Double].collect()
    assert(out.toSeq == Seq(1.0))
  }

  test("asofTolerance: stale matches are discarded, fresh ones kept") {
    val left = Seq((1L, ts(100), "fresh"), (1L, ts(500), "stale"))
      .toDF("uid", "t", "what")
    val right = Seq((1L, ts(90), 1.5)).toDF("uid", "t", "v")
    val out = AsOfJoin.asofTolerance(left, right, "uid", "t", "t",
      Seq("v"), toleranceSeconds = 60L)
      .select("what", "v").as[(String, Option[Double])].collect().toMap
    // 100-90=10s <= 60s keeps; 500-90=410s > 60s nulls
    assert(out == Map("fresh" -> Some(1.5), "stale" -> None))
    // boundary: exactly tolerance old still matches
    val edge = AsOfJoin.asofTolerance(
      Seq((1L, ts(150), "edge")).toDF("uid", "t", "what"),
      right, "uid", "t", "t", Seq("v"), toleranceSeconds = 60L)
      .select("v").as[Option[Double]].collect()
    assert(edge.toSeq == Seq(Some(1.5)))
  }
}
