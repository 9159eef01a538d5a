package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hub of a star out-ranks leaves; teleport floor holds") {
    // undirected star: hub h <-> leaves l1..l8
    val pairs = (1 to 8).flatMap(i => Seq(("h", s"l$i"), (s"l$i", "h")))
    val got = Graph.pageRank(pairs.toDF("src", "dst"), "src", "dst", iters = 5)
      .as[(String, Long)].collect().toMap
    val leafRanks = (1 to 8).map(i => got(s"l$i")).toSet
    assert(leafRanks.size == 1, "symmetric leaves must tie exactly")
    assert(got("h") > leafRanks.head * 4, s"hub ${got("h")} vs leaf ${leafRanks.head}")
    // every node keeps at least the teleport term (0.15e12 / 9)
    assert(got.values.forall(_ >= 150000000000L / 9))
    // truncated mass never exceeds the ideal total, and stays close
    val total = got.values.sum
    assert(total <= 1000000000000L && total > 990000000000L, total.toString)
  }

  test("pageRank: bit-identical under repartitioning (integer arithmetic)") {
    val pairs = (1 to 40).map(i => (s"n${i % 7}", s"n${(i * 3) % 7}"))
      .filter(p => p._1 != p._2).distinct
    val df = pairs.toDF("src", "dst")
    val a = Graph.pageRank(df, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    val b = Graph.pageRank(df.repartition(13), "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
