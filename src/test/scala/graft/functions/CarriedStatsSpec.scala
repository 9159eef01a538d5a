package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
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
}
