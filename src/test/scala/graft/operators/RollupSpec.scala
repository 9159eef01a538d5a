package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 9999L)
    .map(i => (s"k${i % 7}", (i * 31L) % 1000))
    .toDF("k", "v")

  test("merge of arbitrary partitions of the data == full state") {
    val full = Rollup.state(rows, Seq("k"), col("v"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    // three different partitionings of the same rows
    val cuts = Seq(
      Seq(rows.filter($"v" < 300), rows.filter($"v" >= 300)),
      Seq(rows.limit(1), rows.exceptAll(rows.limit(1))),
      (0 to 3).map(m => rows.filter(pmod($"v", lit(4)) === m)))
    cuts.foreach { parts =>
      val merged = Rollup.merge(parts.map(p => Rollup.state(p, Seq("k"), col("v"))))
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(merged == full, "merged states diverged from full recompute")
    }
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val parts = (0 to 2).map(m =>
      Rollup.state(rows.filter(pmod($"v", lit(3)) === m), Seq("k"), col("v")))
    val left = Rollup.merge(Seq(Rollup.merge(parts.take(2)), parts(2)))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val right = Rollup.merge(Seq(parts(0), Rollup.merge(parts.drop(1))))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(left == right)
  }

  test("a key present in only one state survives the merge") {
    val a = Rollup.state(Seq(("only_a", 5L)).toDF("k", "v"), Seq("k"), col("v"))
    val b = Rollup.state(Seq(("shared", 7L)).toDF("k", "v"), Seq("k"), col("v"))
    val m = Rollup.merge(Seq(a, b)).orderBy("k")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(m == Seq(("only_a", 1L, 5L, 5L, 5L), ("shared", 1L, 7L, 7L, 7L)))
  }

  test("joinDelta: materialized + delta == full recompute, no double counting") {
    val a = Seq((1L, "a1"), (1L, "a1b"), (2L, "a2"), (3L, "a3"), (9L, "aNew"))
      .toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (2L, "b2b"), (9L, "bNew"))
      .toDF("k", "bv")
    // deltas: a's rows with value ending in "New" or "b"; disjoint splits
    val aDelta = a.filter($"av".endsWith("New") || $"av".endsWith("b"))
    val aOld = a.except(aDelta)
    val bDelta = b.filter($"bv".endsWith("New") || $"bv".endsWith("b"))
    val bOld = b.except(bDelta)
    val maintained = aOld.join(bOld, Seq("k"))
      .unionByName(Rollup.joinDelta(aOld, aDelta, bOld, bDelta, Seq("k")))
      .as[(Long, String, String)].collect()
    val full = a.join(b, Seq("k")).as[(Long, String, String)].collect()
    // multiset equality: counts matter (double-counting a pair would
    // preserve the set but not the bag)
    def bag(xs: Array[(Long, String, String)]) =
      xs.groupBy(identity).view.mapValues(_.length).toMap
    assert(bag(maintained) == bag(full))
    assert(maintained.length == full.length)
  }
}
