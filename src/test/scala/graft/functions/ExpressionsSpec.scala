package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("ArrayDotLong matches interpreted aggregate/zip_with result") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-7L, 0L, 2L), Array(3L, 9L, -1L))).toDF("a", "b")
    val got = df.select(ArrayDotLong($"a", $"b")).as[Long].collect().toSeq
    val ref = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, v) => acc + v))
      .as[Long].collect().toSeq
    assert(got == ref && got == Seq(32L, -23L))
  }

  test("ArrayDotLong truncates to the shorter array, nulls contribute 0") {
    val df = Seq((Seq(Some(2L), None, Some(4L)), Seq(Some(10L), Some(10L)))).toDF("a", "b")
    assert(df.select(ArrayDotLong($"a", $"b")).as[Long].head() == 20L)
  }

  test("ArrayDotLong rejects non-long arrays at analysis") {
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    intercept[Exception] { df.select(ArrayDotLong($"a", $"b")).collect() }
  }

  test("RollingHash64 is deterministic, content-sensitive, codegen==interp") {
    val df = Seq("hello world", "hello worlD", "hello world", "").toDF("s")
    val h = df.select(RollingHash64($"s")).as[Long].collect()
    assert(h(0) == h(2) && h(0) != h(1))
    // interpreted path (eval) must agree with the codegen'd result
    val interp = new RollingHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world"),
        org.apache.spark.sql.types.StringType)).eval(null)
    assert(interp == h(0))
    // empty string hashes to the FNV offset basis
    assert(h(3) == 0xcbf29ce484222325L)
  }

  test("fingerprint64 is whitespace/case-invariant like the md5 form") {
    import graft.analytics.TextAnalysis
    val df = Seq(("a B  c", "A b c", "a b d")).toDF("x", "y", "z")
    val r = df.select(
      TextAnalysis.fingerprint64($"x").as("fx"),
      TextAnalysis.fingerprint64($"y").as("fy"),
      TextAnalysis.fingerprint64($"z").as("fz")).head()
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) != r.getLong(2))
  }

  test("bpeishTokens splits letter runs, digit runs, and marks") {
    val got = Seq("Hello, world42!  ok").toDF("s")
      .select(graft.analytics.TextAnalysis.bpeishTokens($"s")).as[Seq[String]].head()
    assert(got == Seq("hello", ",", "world", "42", "!", "ok"))
  }
}
