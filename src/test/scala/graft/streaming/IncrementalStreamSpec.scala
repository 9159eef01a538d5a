package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalStreamSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalCopy processes each file exactly once across runs (I2)") {
    val src = Files.createTempDirectory("stream-src").toString
    val dst = Files.createTempDirectory("stream-dst").toString
    val ckp = Files.createTempDirectory("stream-ckp").toString

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    IncrementalStream.incrementalCopy(spark, src, schema, dst, ckp).awaitTermination()
    assert(spark.read.parquet(dst).count() == 2)

    // second batch of files appears; only they are processed
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    IncrementalStream.incrementalCopy(spark, src, schema, dst, ckp).awaitTermination()
    val out = spark.read.parquet(dst)
    assert(out.count() == 3) // no reprocessing of batch 1
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))

    // idempotent re-run with no new files
    IncrementalStream.incrementalCopy(spark, src, schema, dst, ckp).awaitTermination()
    assert(spark.read.parquet(dst).count() == 3)
  }

  test("upsertStream: micro-batch SCD1 with in-batch last-writer-wins") {
    val src = Files.createTempDirectory("ups-src").toString
    val tbl = Files.createTempDirectory("ups-tbl").toString
    val ckp = Files.createTempDirectory("ups-ckp").toString

    def drain(): Unit = {
      val schema = spark.read.parquet(src).schema
      val updates = spark.readStream.schema(schema).parquet(src)
      IncrementalStream.upsertStream(updates, Seq("id"), "seq", tbl, ckp)
        .awaitTermination()
    }
    def current(): Map[Long, (String, Long)] = {
      val v = IncrementalStream.latestVersion(tbl).get
      spark.read.parquet(s"$tbl/v=$v").as[(Long, String, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    }

    // batch 1 carries two versions of key 2 -> the higher seq wins
    Seq((1L, "a", 1L), (2L, "b", 1L), (2L, "b2", 2L))
      .toDF("id", "v", "seq").write.mode("append").parquet(src)
    drain()
    assert(current() == Map(1L -> (("a", 1L)), 2L -> (("b2", 2L))))

    // batch 2 updates key 2 and inserts key 3; key 1 untouched
    Seq((2L, "c", 3L), (3L, "d", 3L))
      .toDF("id", "v", "seq").write.mode("append").parquet(src)
    drain()
    assert(current() == Map(
      1L -> (("a", 1L)), 2L -> (("c", 3L)), 3L -> (("d", 3L))))
  }

  test("watermarked windowed counts over a bounded stream match batch") {
    val src = Files.createTempDirectory("stream-ev").toString
    graft.queries.t(spark, sf, "events")
      .select("ts", "event_type", "value").write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    val stream = spark.readStream.schema(schema).parquet(src)
    val agg = IncrementalStream.windowedCounts(stream, "ts", "1 hour",
      "10 minutes", Seq("event_type"))
    IncrementalStream.runToMemory(agg, "win_out")

    val streamed = spark.table("win_out").agg(sum("n")).as[Long].head()
    val batch = spark.read.parquet(src).count()
    assert(streamed == batch)
  }
}
