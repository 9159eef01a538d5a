package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch/streaming parity for the keyed recurrence: replaying the same
  * rows through decayedSumStream (flatMapGroupsWithState) reproduces
  * the batch DecayedScan custom operator bit-for-bit — the contract
  * that makes the two faces of the operator interchangeable. */
class DecayedStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed recurrence equals the batch custom operator, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (1L, 1L, 100L), (1L, 2L, 50L), (1L, 3L, 7L), (1L, 4L, 0L),
      (2L, 1L, 10L), (2L, 2L, 990L), (3L, 1L, 5L))
    // batch side: the custom physical operator
    val batch = graft.plans.Recurrence.decayedSum(
        data.toDF("k", "o", "v"), "k", Seq("o"), "v", 9, 10, "s")
      .select("k", "o", "s").as[(Long, Long, Long)].collect().toSet

    // streaming side: same rows split across three micro-batches
    val input = MemoryStream[(Long, Long, Long)]
    val q = IncrementalStream.decayedSumStream(input.toDS(), 9, 10)
      .writeStream.format("memory").queryName("decay_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(data.take(3): _*); q.processAllAvailable()
    input.addData(data.slice(3, 5): _*); q.processAllAvailable()
    input.addData(data.drop(5): _*); q.processAllAvailable()
    val streamed = spark.table("decay_out")
      .as[IncrementalStream.DecayUpdate].collect()
      .map(u => (u.key, u.ord, u.decayed)).toSet
    q.stop()
    assert(streamed == batch)
  }

  test("late duplicate replays are dropped (exactly-once on ord)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = IncrementalStream.decayedSumStream(input.toDS(), 1, 2)
      .writeStream.format("memory").queryName("decay_dup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData((1L, 1L, 100L), (1L, 2L, 100L)); q.processAllAvailable()
    input.addData((1L, 2L, 100L), (1L, 1L, 100L)); q.processAllAvailable() // replay
    input.addData((1L, 3L, 100L)); q.processAllAvailable()
    val rows = spark.table("decay_dup_out")
      .as[IncrementalStream.DecayUpdate].collect().sortBy(_.ord)
    q.stop()
    // 1: 100; 2: 100/2+100=150; replay emits nothing; 3: 150/2+100=175
    assert(rows.map(r => (r.ord, r.decayed)).toSeq ==
      Seq((1L, 100L), (2L, 150L), (3L, 175L)))
  }
}
