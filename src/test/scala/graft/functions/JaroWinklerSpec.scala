package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JaroWinklerE6 parity contract: the expected values below are
  * DuckDB 1.0.0 `jaro_winkler_similarity` outputs scaled e6 (probed
  * directly; the oracle of q293 depends on bit-identical doubles). */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Long = {
    // via a DataFrame so the codegen path (not just eval) is exercised
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinklerE6(col("a"), col("b")).as("s"))
      .head().getLong(0)
  }

  test("known values match DuckDB jaro_winkler_similarity (e6)") {
    assert(jw("martha", "marhta") == 961111L)    // 0.9611111111111111
    assert(jw("dixon", "dicksonx") == 813333L)   // 0.8133333333333332
    assert(jw("dwayne", "duane") == 840000L)     // 0.8400000000000001
    assert(jw("jellyfish", "smellyfish") == 896296L)
    assert(jw("crate", "trace") == 733333L)      // no boost: prefix 0
    assert(jw("abcd", "abcde") == 960000L)       // prefix capped at 4
    assert(jw("abc", "abc") == 1000000L)
  }

  test("degenerate cases follow the DuckDB convention") {
    assert(jw("", "") == 0L)       // empty -> 0, NOT the classic 1
    assert(jw("a", "") == 0L)
    assert(jw("a", "b") == 0L)
    assert(jw("ab", "ba") == 0L)   // window 0: no cross-position match
  }

  test("null propagates") {
    val r = Seq(("x", Option.empty[String])).toDF("a", "b")
      .select(JaroWinklerE6(col("a"), col("b")).as("s"))
      .head()
    assert(r.isNullAt(0))
  }

  test("symmetric on a corpus slice") {
    val names = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_name")).limit(50).as[String].collect()
    for (i <- names.indices; j <- (i + 1) until names.length) {
      assert(JaroWinklerE6.simE6(
        org.apache.spark.unsafe.types.UTF8String.fromString(names(i)),
        org.apache.spark.unsafe.types.UTF8String.fromString(names(j))) ==
        JaroWinklerE6.simE6(
          org.apache.spark.unsafe.types.UTF8String.fromString(names(j)),
          org.apache.spark.unsafe.types.UTF8String.fromString(names(i))))
    }
  }
}
