package graft.operators

import graft.SparkSpec
import graft.sources.Readers
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end reference-shaped pipeline over synthesized 5-source
  * fixtures (FIXTURES.md §A): messy headers, NULL literals, duplicates,
  * whitespace, dangling FKs — through land -> clean -> warehouse ->
  * star -> quality. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("full pipeline: 5 sources to star schema with quality checks") {
    val root = Files.createTempDirectory("pipe").toString
    val srcDir = Files.createTempDirectory("pipe-src").toString

    // customers CSV (messy headers, dup row, whitespace)
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/customers.csv"),
      """customer_id,name,Gender,DATE of biRTH,signup_date,email,address
        |c1,  Ann ,F,1990-01-01,2020-01-01,a@x.com,addr1
        |c1,  Ann ,F,1990-01-01,2020-01-01,a@x.com,addr1
        |c2,Bea,F,NULL,2020-02-01,b@x.com,
        |""".stripMargin)
    // call logs CSV (daily incremental)
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/call_logs.csv"),
      """call ID,customeR iD,COMPLAINT_catego ry,agent ID,resolutionstatus
        |k1,c1,billing,a1,resolved
        |k2,c2,network,a2,open
        |k3,cX,network,a1,open
        |""".stripMargin)
    // social media JSON
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/social.json"),
      """{"complaint_id":"s1","customeR iD":"c1","agent ID":"a1","media_channel":"tw"}
        |{"complaint_id":"s2","customeR iD":"c2","agent ID":"aX","media_channel":"fb"}
        |""".stripMargin)

    val agentSchema = StructType(Seq(
      StructField("iD", StringType), StructField("NamE", StringType),
      StructField("experience", StringType), StructField("state", StringType)))

    val sources = Seq(
      Pipeline.Source("customers",
        s => Readers.csvAllString(s, s"$srcDir/customers.csv"),
        renames = Map("Gender" -> "gender", "DATE of biRTH" -> "date_of_birth")),
      Pipeline.Source("agents",
        s => Readers.rows(s, Seq(Row("a1", "Zed", "5", "TX"), Row("a2", "Yan", "3", "CA")),
          agentSchema),
        renames = Map("iD" -> "id", "NamE" -> "name")),
      Pipeline.Source("call_logs",
        s => Readers.csvAllString(s, s"$srcDir/call_logs.csv"),
        renames = Map("call ID" -> "call_id", "customeR iD" -> "customer_id",
          "COMPLAINT_catego ry" -> "complaint_category", "agent ID" -> "agent_id",
          "resolutionstatus" -> "resolution_status"),
        incremental = true),
      Pipeline.Source("social_medias",
        s => Readers.json(s, s"$srcDir/social.json"),
        renames = Map("customeR iD" -> "customer_id", "agent ID" -> "agent_id"),
        incremental = true))

    def star(tables: Map[String, org.apache.spark.sql.DataFrame]) =
      StarSchema.build(
        staging = tables,
        dims = Seq(
          "dim_customers" -> (c => StarSchema.dim(c("customers"),
            "customer_id" -> "customer_id", "name" -> "customer_name",
            "gender" -> "gender")),
          "dim_agents" -> (c => StarSchema.dim(c("agents"),
            "id" -> "agent_id", "name" -> "agent_name", "state" -> "state"))),
        facts = Seq(
          "fact_call_logs" -> (c => StarSchema.fact(c("call_logs"),
            Seq("call_id", "customer_id", "agent_id", "complaint_category",
              "resolution_status"),
            Seq((c("dim_customers"), "customer_id", "customer_id"),
              (c("dim_agents"), "agent_id", "agent_id")))),
          "fact_social_media_complaints" -> (c => StarSchema.fact(c("social_medias"),
            Seq("complaint_id", "customer_id", "agent_id", "media_channel"),
            Seq((c("dim_customers"), "customer_id", "customer_id"),
              (c("dim_agents"), "agent_id", "agent_id"))))))

    val report = Pipeline.run(spark, sources, root, star)
    assert(report.stages.map(_.operation) ==
      Seq("land", "transform", "warehouse_load", "star_schema"))

    // C3: the QueryExecutionListener hook captured per-action metrics
    // for the run's writes/reads, all successful
    assert(report.actions.nonEmpty, "run report captured no actions")
    assert(report.actions.forall(_.failed == 0L))
    assert(report.actions.map(_.durationSeconds).sum > 0.0)

    // customers: dup row collapsed, trim applied, NULL literal nulled
    val cust = spark.table("customers")
    assert(cust.count() == 2)
    assert(cust.filter($"customer_id" === "c1").select("name").as[String].head() == "Ann")
    assert(cust.filter($"customer_id" === "c2" && $"date_of_birth".isNull).count() == 1)

    // facts: dangling FKs dropped by the dim inner joins
    assert(spark.table("fact_call_logs").select("call_id").as[String]
      .collect().toSet == Set("k1", "k2"))
    assert(spark.table("fact_social_media_complaints").count() == 1)

    // dbt-test analogs pass on the built star schema
    assert(Quality.isUnique(spark.table("dim_customers"), "customer_id"))
    assert(Quality.isNotNull(spark.table("fact_call_logs"), "customer_id"))

    // re-run: incremental sources are ledger-skipped -> same row counts
    val report2 = Pipeline.run(spark, sources, root, star)
    assert(spark.table("customers").count() == 2) // full reload overwrites staging
    assert(report2.stages.head.skipped == 2)      // both incremental batches skipped
    assert(spark.table("fact_call_logs").select("call_id").as[String]
      .collect().toSet == Set("k1", "k2"))
  }

  test("transient source failure is retried and recorded (reference retries: 2)") {
    val root = Files.createTempDirectory("pipe-retry").toString
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("v", StringType)))
    var landCalls = 0
    val flaky = Pipeline.Source("flaky_src", s => {
      landCalls += 1
      // first attempt dies (transient outage); the retry succeeds —
      // the run must complete, record the re-attempt, and mark no failure
      if (landCalls == 1) throw new RuntimeException("transient source outage")
      Readers.rows(s, Seq(Row("r1", "x"), Row("r2", "y")), schema)
    })
    // no star models: the default identity buildStar would re-materialize
    // the warehouse table onto itself (UNSUPPORTED_OVERWRITE)
    val report = Pipeline.run(spark, Seq(flaky), root, _ => Map.empty)
    val land = report.stages.find(_.operation == "land").get
    assert(land.retried == 1, s"expected 1 recorded re-attempt, got $land")
    assert(land.succeeded == 1 && land.failed == 0 && land.processed == 1)
    assert(landCalls == 2)
    assert(spark.table("flaky_src").count() == 2)

    // retry exhaustion: the unit marks failed and the run aborts
    val root2 = Files.createTempDirectory("pipe-retry-exhaust").toString
    var calls2 = 0
    val dead = Pipeline.Source("dead_src", _ => {
      calls2 += 1; throw new RuntimeException("permanent outage")
    })
    val ex = intercept[RuntimeException] {
      Pipeline.run(spark, Seq(dead), root2, _ => Map.empty, retries = 1)
    }
    assert(ex.getMessage == "permanent outage")
    assert(calls2 == 2, "retries = 1 means exactly two attempts")
  }
}
