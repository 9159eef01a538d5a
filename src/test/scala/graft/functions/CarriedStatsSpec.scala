package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, lit, min}
import org.apache.spark.sql.graftshim.Shim

/** Regression guard for the carried-statistics blowup class: Spark's
  * checkpoint preserves the original plan's estimated sizeInBytes on
  * the truncated LogicalRDD, and a self-join fixpoint then SQUARES the
  * estimate per round — its BigInt digit count doubles and the planner
  * eventually sits in million-digit BigInteger math for minutes (this
  * hung DedupClusterSpec's 200-node graphs for 30+ minutes before
  * Shim.capCarriedStats). These tests pin the bound mechanically so a
  * Spark upgrade or a refactor that drops the cap goes red here in
  * seconds instead of hanging a suite. */
class CarriedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def sizeBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  test("uncapped checkpoints square carried estimates per self-join round (the hazard is real)") {
    var cur = (0L until 50L).map(i => (i, i + 1)).toDF("a", "b")
      .localCheckpoint(true)
    val bits0 = sizeBits(cur)
    (1 to 4).foreach { _ =>
      cur = cur.as("x")
        .join(cur.as("y"), $"x.b" === $"y.a")
        .select($"x.a".as("a"), $"y.b".as("b"))
        .localCheckpoint(true)
    }
    // 4 squarings: the estimate's bit length grows ~2^4x — the
    // exponential signature this spec exists to document
    assert(sizeBits(cur) > bits0 * 8,
      s"expected exponential growth, got $bits0 -> ${sizeBits(cur)} bits")
  }

  test("capCarriedStats keeps the estimate bounded across arbitrarily many self-join rounds") {
    var cur = Shim.capCarriedStats(
      (0L until 50L).map(i => (i, i + 1)).toDF("a", "b").localCheckpoint(true))
    (1 to 8).foreach { _ =>
      cur = Shim.capCarriedStats(cur.as("x")
        .join(cur.as("y"), $"x.b" === $"y.a")
        .select($"x.a".as("a"), $"y.b".as("b"))
        .localCheckpoint(true))
    }
    // every checkpointed leaf is <= Long.MaxValue (64 bits); the
    // worst pre-cap product of a round's O(1) leaves stays tiny
    assert(sizeBits(cur) <= 64,
      s"capped estimate must stay <= 64 bits, got ${sizeBits(cur)}")
  }

  test("capCarriedStats passes small real estimates through untouched") {
    val df = (0L until 10L).map(i => (i, i)).toDF("a", "b").localCheckpoint(true)
    val before = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val capped = Shim.capCarriedStats(df)
    assert(capped.queryExecution.optimizedPlan.stats.sizeInBytes == before,
      "a realistic estimate (and its broadcast decision) must survive the cap")
    // and the rows are untouched
    assert(capped.count() == 10L)
  }

  // ---- deep-round pins per reference-multiplicity class, through the
  // ---- ONE shared helper every fixpoint routes its in-loop cuts by
  // ---- (graft.operators.Fixpoint.cut). 30+ rounds is past where the
  // ---- uncapped q57-class hang became visible (~15): if a refactor
  // ---- drops the cap inside the helper, these go red (or hang a
  // ---- CI-visible few minutes) instead of shipping the regression.

  import graft.operators.Fixpoint

  test("Fixpoint.cut: 2-reference self-join fixpoint (connected-components class) stays bounded at depth 35") {
    var cur = Fixpoint.cut((0L until 40L).map(i => (i, i + 1)).toDF("a", "b"))
    (1 to 35).foreach { _ =>
      cur = Fixpoint.cut(cur.as("x")
        .join(cur.as("y"), $"x.b" === $"y.a")
        .select($"x.a".as("a"), $"y.b".as("b")))
    }
    assert(sizeBits(cur) <= 64, s"2-ref class: ${sizeBits(cur)} bits")
  }

  test("Fixpoint.cut: 3-reference fixpoint (kPeel class — frame + two derived keep-sets) stays bounded at depth 35") {
    var cur = Fixpoint.cut((0L until 40L).map(i => (i, i + 1)).toDF("lo", "hi"))
    (1 to 35).foreach { _ =>
      val keep = cur.select($"lo".as("node")).union(cur.select($"hi"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .filter($"deg" >= 1).select("node")
      cur = Fixpoint.cut(cur
        .join(keep.select($"node".as("lo")), Seq("lo"), "left_semi")
        .join(keep.select($"node".as("hi")), Seq("hi"), "left_semi"))
    }
    assert(sizeBits(cur) <= 64, s"3-ref class: ${sizeBits(cur)} bits")
  }

  test("Fixpoint.cut: 1-reference chain against a fixed relation (BFS/Bellman-Ford/BPE class) stays bounded at depth 35") {
    val edges = Fixpoint.cut(
      (0L until 40L).map(i => (i, (i + 1) % 40L)).toDF("src", "dst"))
    var dist = Fixpoint.cut(Seq((0L, 0L)).toDF("node", "dist"))
    (1 to 35).foreach { _ =>
      dist = Fixpoint.cut(dist
        .union(edges.join(dist.withColumnRenamed("node", "src"), Seq("src"))
          .select($"dst".as("node"), ($"dist" + 1L).as("dist")))
        .groupBy("node").agg(min($"dist").as("dist")))
    }
    assert(sizeBits(dist) <= 64, s"1-ref class: ${sizeBits(dist)} bits")
    // and the relaxation actually ran: 35 hops from the single seed on
    // a directed 40-cycle reach nodes 0..35 — 36 rows
    assert(dist.count() == 36L)
  }

  test("Fixpoint.cut uses a reliable checkpoint when a checkpoint dir is configured") {
    val dir = java.nio.file.Files.createTempDirectory("fixpoint-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val df = Fixpoint.cut((0L until 5L).map(i => (i, i)).toDF("a", "b"))
      assert(df.count() == 5L)
      assert(df.rdd.toDebugString.contains("ReliableCheckpointRDD") ||
        new java.io.File(dir).listFiles().nonEmpty,
        "expected a reliable checkpoint under the configured dir")
    } finally {
      // unset for the rest of the JVM-shared session
      Shim.clearCheckpointDir(spark.sparkContext)
    }
  }
}
