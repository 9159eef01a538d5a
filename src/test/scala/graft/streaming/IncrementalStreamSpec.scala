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

  test("attributionJoin: purchases match in-window same-user clicks only") {
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val clickDir = Files.createTempDirectory("attr-clicks").toString
    val purchDir = Files.createTempDirectory("attr-purch").toString
    Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(0)), (1L, ts(40)))
      .toDF("user_id", "ts").write.mode("append").parquet(clickDir)
    Seq((1L, ts(10)), (2L, ts(50)), (3L, ts(10)))
      .toDF("user_id", "ts").write.mode("append").parquet(purchDir)
    val schema = spark.read.parquet(clickDir).schema
    val joined = IncrementalStream.attributionJoin(
      spark.readStream.schema(schema).parquet(clickDir),
      spark.readStream.schema(schema).parquet(purchDir),
      "user_id", "ts", windowSeconds = 30)
    IncrementalStream.runToMemory(joined, "attr_out", outputMode = "append")
    val got = spark.table("attr_out")
      .as[(Long, Timestamp, Timestamp)].collect()
      .map { case (u, p, c) => (u, p.toString, c.toString) }.toSet
    // u1@10 matches u1 clicks at 0 and 5 (both within 30s); u2@50 is
    // 50s after u2's only click -> no match; u3 never clicked; u1's
    // click at 40 is AFTER the purchase -> excluded
    assert(got == Set(
      (1L, ts(10).toString, ts(0).toString),
      (1L, ts(10).toString, ts(5).toString)))
  }

  test("latestVersion: incomplete versions and the replayed batch are invisible") {
    val tbl = Files.createTempDirectory("lv-tbl").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$tbl/v=0")
    Seq((1L, "b")).toDF("id", "v").write.parquet(s"$tbl/v=1")
    // v=2 simulates a KILLED write: directory exists, no _SUCCESS
    Seq((1L, "c")).toDF("id", "v").write.parquet(s"$tbl/v=2")
    Files.delete(java.nio.file.Paths.get(s"$tbl/v=2/_SUCCESS"))
    assert(IncrementalStream.latestVersion(spark, tbl) == Some(1L))
    // a replay of batch 1 must base itself on v=0, never read its own
    // about-to-be-overwritten output
    assert(IncrementalStream.latestVersion(spark, tbl, below = Some(1L)) == Some(0L))
    assert(IncrementalStream.latestVersion(spark, tbl, below = Some(0L)) == None)
    assert(IncrementalStream.latestVersion(spark,
      Files.createTempDirectory("lv-missing").toString + "/nope") == None)
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
      val v = IncrementalStream.latestVersion(spark, tbl).get
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

  test("cubeMaintenanceStream: micro-batch deltas keep the rollup rewrite current") {
    val src = Files.createTempDirectory("cube-src").toString
    val cubes = Files.createTempDirectory("cube-ver").toString
    val ckp = Files.createTempDirectory("cube-ckp").toString
    val basePath = Files.createTempDirectory("cube-base").toString + "/facts.parquet"
    val initCube = Files.createTempDirectory("cube-init").toString

    // the registered base fact + its initial cube
    Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v")
      .write.parquet(basePath)
    val base = spark.read.parquet(basePath)
    graft.plans.RollupRewrite.materializeAndRegister(spark, "stream_cube",
      base, basePath, dims = Seq("k"), measures = Seq("v"), initCube)
    try {
      def drain(): Unit = {
        val schema = spark.read.parquet(src).schema
        IncrementalStream.cubeMaintenanceStream(
            spark.readStream.schema(schema).parquet(src),
            "stream_cube", cubes, ckp)
          .awaitTermination()
      }
      // the covered aggregate, rebuilt each time (plan caching)
      def totals(): Map[String, (Long, Long)] = {
        val q = spark.read.parquet(basePath).groupBy("k")
          .agg(sum("v").as("s"), count(lit(1)).as("n"))
        val got = q.as[(String, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val p = q.queryExecution.executedPlan.toString
        assert(!p.contains("facts.parquet"), s"must answer from the cube:\n$p")
        got
      }

      Seq(("a", 1L), ("c", 100L)).toDF("k", "v")
        .write.mode("append").parquet(src)
      drain()
      assert(totals() == Map(
        "a" -> ((31L, 3L)), "b" -> ((5L, 1L)), "c" -> ((100L, 1L))))

      Seq(("c", 1L)).toDF("k", "v").write.mode("append").parquet(src)
      drain()
      assert(totals() == Map(
        "a" -> ((31L, 3L)), "b" -> ((5L, 1L)), "c" -> ((101L, 2L))))
    } finally {
      graft.plans.RollupRewrite.clear() // shared session
    }
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
