package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def lineageOf(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    Lineage.columnLineage(df).as[(String, String, String)].collect().toSet

  test("lineage traces through explode, window, and computed projections") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // generator: exploded tokens trace back to the text column
    val toks = docs.select($"source",
      explode(split(lower($"text"), "\\s+")).as("term"))
    assert(lineageOf(toks) == Set(
      ("source", "documents", "source"),
      ("term", "documents", "text")))
    // window: a rank over n_chars traces to both the partition+order refs
    import org.apache.spark.sql.expressions.Window
    val w = docs.select($"doc_id",
      row_number().over(Window.partitionBy($"lang").orderBy($"n_chars")).as("rk"))
    val got = lineageOf(w)
    assert(got.contains(("doc_id", "documents", "doc_id")))
    assert(got.contains(("rk", "documents", "lang")))
    assert(got.contains(("rk", "documents", "n_chars")))
  }

  test("literal-only columns have no source rows; joins merge both sides") {
    val a = spark.read.parquet(s"$sf/nation.parquet")
    val b = spark.read.parquet(s"$sf/region.parquet")
    val j = a.join(b, $"n_regionkey" === $"r_regionkey")
      .select($"n_name", lit(1L).as("one"),
        concat($"n_name", lit("/"), $"r_name").as("path"))
    val got = lineageOf(j)
    assert(got == Set(
      ("n_name", "nation", "n_name"),
      ("path", "nation", "n_name"),
      ("path", "region", "r_name")))
    assert(!got.exists(_._1 == "one"), "a literal column must contribute no lineage")
  }
}
