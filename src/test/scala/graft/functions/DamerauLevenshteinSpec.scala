package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full (Lowrance-Wagner) Damerau-Levenshtein: expected values are
  * DuckDB damerau_levenshtein outputs (probed directly; q299's oracle
  * depends on exact agreement). The CA/ABC case distinguishes full DL
  * (2) from the restricted OSA variant (3). */
class DamerauLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private def d(a: String, b: String): Long =
    Seq((a, b)).toDF("a", "b")
      .select(DamerauLevenshteinExpr(col("a"), col("b")).as("d"))
      .head().getLong(0)

  test("full DL, not OSA") {
    assert(d("CA", "ABC") == 2L) // OSA would say 3
    assert(d("ab", "ba") == 1L)
    assert(d("abcdef", "abcfed") == 2L)
  }

  test("reduces to Levenshtein without transpositions") {
    assert(d("kitten", "sitting") == 3L)
    assert(d("", "abc") == 3L)
    assert(d("abc", "") == 3L)
    assert(d("same", "same") == 0L)
    assert(d("abxcd", "abcd") == 1L)
  }

  test("symmetric and never exceeds plain Levenshtein on a corpus slice") {
    val pairs = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_name")).limit(60)
      .crossJoin(spark.read.parquet(s"$sf/part.parquet")
        .select(col("p_name").as("p2")).limit(60))
      .select(DamerauLevenshteinExpr(col("p_name"), col("p2")).as("dl"),
        DamerauLevenshteinExpr(col("p2"), col("p_name")).as("dl_rev"),
        levenshtein(col("p_name"), col("p2")).cast("long").as("lev"))
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) == r.getLong(1)) // symmetric
      assert(r.getLong(0) <= r.getLong(2)) // DL <= Levenshtein
    }
  }
}
