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
}
