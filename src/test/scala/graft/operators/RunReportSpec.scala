package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RunReportSpec extends SparkSpec {
  import spark.implicits._

  private def awaitReports(r: RunReport, n: Int): Unit = {
    val deadline = System.nanoTime() + 10e9.toLong
    while (r.report.size < n && System.nanoTime() < deadline) Thread.sleep(50)
  }

  test("run report captures one OperationMetadata per action (C3)") {
    val report = RunReport.attach(spark)
    try {
      Seq(1, 2, 3).toDF("x").filter($"x" > 1).count()
      Seq(4, 5).toDF("y").collect()
      awaitReports(report, 2)
      val r = report.report
      assert(r.size >= 2)
      assert(r.forall(_.succeeded == 1L))
      assert(r.forall(_.failed == 0L))
      assert(r.forall(_.durationSeconds > 0.0))
      assert(r.map(_.operation).exists(Set("count", "collect")))
      val s = report.summary("run")
      assert(s.succeeded >= 2 && s.failed == 0)
    } finally report.detach(spark)
  }

  test("failed actions land in the report as failures, not silence") {
    val report = RunReport.attach(spark)
    try {
      val boom = udf((i: Int) => if (i > 1) throw new RuntimeException("boom") else i)
      intercept[Exception] {
        Seq(1, 2, 3).toDF("x").select(boom($"x")).collect()
      }
      awaitReports(report, 1)
      assert(report.report.exists(_.failed == 1L) || report.failed.nonEmpty)
    } finally report.detach(spark)
  }

  test("per-run isolation: a report attached to its own session ignores other sessions' actions") {
    val mine = spark.newSession()
    val report = RunReport.attach(mine)
    try {
      // action on the OTHER session: must not pollute this run's report
      Seq(1, 2).toDF("x").count()
      // action on the attached session: must be captured
      mine.range(5).toDF().count()
      assert(report.awaitQuiescence(), "listener bus must drain")
      awaitReports(report, 1)
      val r = report.report
      assert(r.nonEmpty && r.forall(_.succeeded == 1L))
      assert(r.map(_.processed).sum <= 5L, s"foreign session's rows leaked in: $r")
    } finally report.detach(mine)
  }

  test("detach stops capture") {
    val report = RunReport.attach(spark)
    report.detach(spark)
    Seq(1).toDF("x").count()
    Thread.sleep(300)
    assert(report.report.isEmpty)
  }
}
