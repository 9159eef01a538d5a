package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("intervalJoin matches brute-force non-equi join (incl. boundaries)") {
    val points = Seq((1L, ts(100)), (2L, ts(250)), (3L, ts(300)), (4L, ts(999)))
      .toDF("pid", "pt")
    val intervals = Seq((10L, ts(100), ts(200)), (20L, ts(250), ts(300)), (30L, ts(400), ts(450)))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.intervalJoin(points, intervals, "pt", "lo", "hi",
      maxWidthSec = 200)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val brute = intervals.crossJoin(points)
      .filter($"pt" >= $"lo" && $"pt" <= $"hi")
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(got == Set((10L, 1L), (20L, 2L), (20L, 3L))) // boundary hits both ends
  }

  test("intervalJoin keeps matches for intervals wider than the bucket") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // interval spans 150s with 60s buckets: the point at +130s sits two
    // buckets past the interval's start — a fixed {b, b+1} expansion
    // silently dropped it
    val points = Seq((1L, t(130))).toDF("pid", "pt")
    val ivals = Seq((9L, t(0), t(150))).toDF("iid", "lo", "hi")
    val got = RangeJoin.intervalJoin(points, ivals, "pt", "lo", "hi",
      maxWidthSec = 60L).select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 9L)))
  }

  test("intervalJoin on real tables equals plain non-equi join") {
    val orders = graft.queries.t(spark, sf, "orders").limit(300)
      .withColumn("o_hi", $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .select("o_orderkey", "o_orderdate", "o_hi")
    val li = graft.queries.t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    val bucketed = RangeJoin.intervalJoin(li, orders, "l_shipdate",
      "o_orderdate", "o_hi", 30L * 86400)
      .groupBy("o_orderkey").agg(count("l_orderkey").as("n"))
    val brute = orders.join(li,
      li("l_shipdate") >= orders("o_orderdate") && li("l_shipdate") <= orders("o_hi"))
      .groupBy("o_orderkey").agg(count("l_orderkey").as("n"))
    val a = bucketed.orderBy("o_orderkey").as[(Long, Long)].collect().toSeq
    val b = brute.orderBy("o_orderkey").as[(Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("intervalOverlapJoin: each overlapping pair exactly once, endpoints inclusive") {
    import org.apache.spark.sql.functions._
    val left = Seq(("A", 0L, 100L), ("B", 200L, 300L), ("C", 400L, 500L))
      .toDF("lid", "lo_s", "hi_s")
      .select(col("lid"), to_timestamp(col("lo_s")).as("l_lo"),
        to_timestamp(col("hi_s")).as("l_hi"))
    val right = Seq(("R1", 50L, 250L), ("R2", 300L, 310L))
      .toDF("rid", "lo_s", "hi_s")
      .select(col("rid"), to_timestamp(col("lo_s")).as("r_lo"),
        to_timestamp(col("hi_s")).as("r_hi"))
    // 60s bins: A and R1 share bins 0 and 1 — the canonical-bin gate
    // must emit the pair ONCE; R2 touches B only at the inclusive
    // endpoint 300
    val got = RangeJoin.intervalOverlapJoin(left, right,
        "l_lo", "l_hi", "r_lo", "r_hi", binSizeSec = 60L)
      .select("lid", "rid").as[(String, String)].collect().toList
    assert(got.sorted == List(("A", "R1"), ("B", "R1"), ("B", "R2")))
  }
}
