package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points: DataFrame =
    Seq((1L, ts("2024-01-01 00:30:00")), (2L, ts("2024-01-01 05:00:00")),
      (3L, ts("2024-01-02 12:00:00")), (4L, ts("2024-03-01 00:00:00")))
      .toDF("pid", "pt")

  private def intervals: DataFrame =
    Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (20L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")), // spans many buckets
      (30L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))) // matches nothing
      .toDF("iid", "lo", "hi")

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("plain interval join is rewritten to a bucketed equi join, same rows") {
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val naive = points.join(intervals, cond)
      .select("pid", "iid").sort("pid", "iid").collect().toSeq
    assert(naive.nonEmpty)
    RangeJoinRewrite.enable(spark, 3600L)
    try {
      val rewritten = points.join(intervals, cond)
      assert(!plan(rewritten).contains("BroadcastNestedLoopJoin"),
        s"rule did not fire:\n${plan(rewritten)}")
      assert(rewritten.select("pid", "iid").sort("pid", "iid").collect().toSeq
        === naive)
    } finally RangeJoinRewrite.disable()
  }

  test("intervals wider than the bucket still find every match") {
    // bucket = 1h, interval 20 spans 48h -> explodes into 49 cells; each
    // in-range point must match exactly once (a point lives in ONE cell)
    RangeJoinRewrite.enable(spark, 3600L)
    try {
      val got = points
        .join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .filter(col("iid") === 20L).select("pid")
        .as[Long].collect().sorted.toSeq
      assert(got === Seq(1L, 2L, 3L))
    } finally RangeJoinRewrite.disable()
  }

  test("strict bounds are preserved exactly") {
    RangeJoinRewrite.enable(spark, 3600L)
    try {
      // pt > lo excludes the point exactly AT lo of interval 10? none sits
      // at lo; use hi: pid 1 at 00:30 < hi, boundary probe via interval 10's
      // hi = 01:00 with a point planted exactly there
      val pts = Seq((9L, ts("2024-01-01 01:00:00"))).toDF("pid", "pt")
      val inclusive = pts.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
        .filter(col("iid") === 10L).count()
      val strict = pts.join(intervals,
        col("pt") > col("lo") && col("pt") < col("hi"))
        .filter(col("iid") === 10L).count()
      assert(inclusive === 1L && strict === 0L)
    } finally RangeJoinRewrite.disable()
  }

  test("extra cross-side conjuncts ride along unchanged") {
    RangeJoinRewrite.enable(spark, 3600L)
    try {
      val cond = col("pt") >= col("lo") && col("pt") <= col("hi") &&
        col("pid") < col("iid")
      val got = points.join(intervals, cond)
        .select("pid", "iid").sort("pid", "iid").collect().toSeq
      RangeJoinRewrite.disable()
      val naive = points.join(intervals, cond)
        .select("pid", "iid").sort("pid", "iid").collect().toSeq
      assert(got === naive)
    } finally RangeJoinRewrite.disable()
  }

  test("a join with a cross-side equi key is left alone") {
    RangeJoinRewrite.enable(spark, 3600L)
    try {
      val iv2 = intervals.withColumn("k", col("iid") % 2)
      val pt2 = points.withColumn("k", col("pid") % 2)
      val joined = pt2.join(iv2,
        pt2("k") === iv2("k") && col("pt") >= col("lo") && col("pt") <= col("hi"))
      // native plan keeps the equi join; no Generate/explode injected
      assert(!plan(joined).contains("Generate"),
        s"rule must not touch equi joins:\n${plan(joined)}")
      // range matches (1,10),(1,20),(2,20),(3,20); k-parity keeps (2,20)
      assert(joined.count() === 1L)
    } finally RangeJoinRewrite.disable()
  }

  test("disabled rule leaves the nested-loop plan untouched") {
    val joined = points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    assert(plan(joined).contains("BroadcastNestedLoopJoin"))
  }

  test("downstream operators see the original output (aggregate on top)") {
    RangeJoinRewrite.enable(spark, 3600L)
    try {
      val agg = points
        .join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .groupBy("iid").agg(count(lit(1)).as("n"))
        .sort("iid").as[(Long, Long)].collect().toSeq
      assert(agg === Seq((10L, 1L), (20L, 3L)))
    } finally RangeJoinRewrite.disable()
  }
}
