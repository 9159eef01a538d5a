package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulSessionSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState sessionization carries state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = IncrementalStream.sessionizeStream(input.toDS(), gapSeconds = 1800)
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode(OutputMode.Update())
      .start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)

    // batch 1: user 1 has two events 60s apart -> one session
    input.addData((1L, ts(0)), (1L, ts(60)))
    q.processAllAvailable()
    val after1 = spark.table("sess_out")
      .as[IncrementalStream.SessionUpdate].collect()
    assert(after1.exists(u => u.user_id == 1L && u.n_sessions == 1L && u.n_events == 2L))

    // batch 2: 2h later -> state remembers lastSec, opens session #2
    input.addData((1L, ts(60 + 7200)))
    q.processAllAvailable()
    val after2 = spark.table("sess_out")
      .as[IncrementalStream.SessionUpdate].collect()
    assert(after2.exists(u => u.user_id == 1L && u.n_sessions == 2L && u.n_events == 3L))
    q.stop()
  }

  test("dedupStream: fingerprint dedup with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val deduped = IncrementalStream.dedupStream(
      input.toDS().toDF("ts", "text"), "ts", "text", watermark = "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("fpdedup_out")
      .outputMode(OutputMode.Append())
      .start()
    // same CONTENT under different whitespace/case is one fingerprint
    input.addData(
      (ts(0), "The quick   brown fox"),
      (ts(30), "  the quick brown FOX "),
      (ts(60), "a different document"))
    q.processAllAvailable()
    input.addData((ts(120), "the quick brown fox")) // dup across batches
    q.processAllAvailable()
    val out = spark.table("fpdedup_out").select("text").as[String].collect()
    assert(out.length == 2, s"expected 2 surviving docs, got ${out.toSeq}")
    q.stop()
  }

  test("curateStream: scrub + gates + watermark dedup at ingest") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val curated = IncrementalStream.curateStream(
      input.toDS().toDF("doc_id", "ts", "text"),
      "doc_id", "ts", "text", watermark = "10 minutes")
    val q = curated.writeStream
      .format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append())
      .start()
    // timestamps well above epoch 0: an event time equal to the INITIAL
    // watermark (0) is treated as late and silently dropped
    input.addData(
      (1L, ts(1000), "a perfectly ordinary clean document with enough words here"),
      (2L, ts(1010), "#### %%%% @@@@"), // fails the gates
      (3L, ts(1020), "mail me at someone@example.com about the meeting plan today"))
    q.processAllAvailable()
    // dup of doc 1's content in a LATER batch: state must still drop it
    input.addData(
      (4L, ts(1030), "a perfectly ordinary clean document with enough words here"))
    q.processAllAvailable()
    val out = spark.table("curate_out")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 3L), s"got ${out.keySet}")
    assert(out(3L).contains("<EMAIL>") && !out(3L).contains("example.com"))
    q.stop()
  }

  test("streaming dropDuplicates: exact dedup state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = input.toDS().toDF("id", "v").dropDuplicates("id")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    input.addData((1L, "a"), (2L, "b"), (1L, "dup-in-batch"))
    q.processAllAvailable()
    input.addData((1L, "dup-across-batch"), (3L, "c"))
    q.processAllAvailable()
    val out = spark.table("dedup_out").as[(Long, String)].collect()
    assert(out.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L)) // each id exactly once
    q.stop()
  }

  test("kmvDistinctStream: merged state equals the batch sketch on the union") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val est = IncrementalStream.kmvDistinctStream(input.toDS(), k = 64)
    val q = est.writeStream
      .format("memory").queryName("kmv_out")
      .outputMode(OutputMode.Update())
      .start()
    // 500 distinct values split arbitrarily across two batches, with
    // overlap between the batches (merge must dedup, not just append)
    val all = (1 to 500).map(i => ("g", s"v$i"))
    input.addData(all.take(300): _*)
    q.processAllAvailable()
    input.addData(all.drop(250): _*) // 50 values replay across batches
    q.processAllAvailable()
    val streamed = spark.table("kmv_out")
      .as[IncrementalStream.KmvUpdate].collect()
      .filter(_.key == "g").last.distinct_est
    val batch = graft.operators.Stats.kmvDistinct(
        all.toDF("g", "v"), "g", "v", k = 64)
      .as[(String, Double)].head()._2
    assert(streamed == batch,
      s"stream $streamed != batch $batch — merge must be lossless")
    // below-k path: exact count even across batches
    input.addData(("h", "x1"), ("h", "x2"))
    q.processAllAvailable()
    input.addData(("h", "x2"), ("h", "x3"))
    q.processAllAvailable()
    val small = spark.table("kmv_out")
      .as[IncrementalStream.KmvUpdate].collect().filter(_.key == "h").last
    assert(small.m == 3L && small.distinct_est == 3.0)
    q.stop()
  }
}
