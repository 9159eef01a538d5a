package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import graft.operators._
import graft.sources.Readers
import java.nio.file.Files

/** Runnable end-to-end demo of the reference-shaped pipeline (C1): five
  * sources -> land -> clean -> ledger-gated warehouse load -> star schema
  * -> quality report. `sbt "runMain graft.PipelineDemo"`.
  *
  * Mirrors the reference DAG (airflow/dags/pipeline.py:269) over
  * synthesized fixtures (FIXTURES.md §A shapes), and runs TWICE to show
  * the exactly-once ledger semantics on re-run.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-demo-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft-demo").toString
    val srcDir = Files.createTempDirectory("graft-demo-src").toString
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/customers.csv"),
      """customer_id,name,Gender,DATE of biRTH,signup_date,email,address
        |c1,  Ann ,F,1990-01-01,2020-01-01,a@x.com,addr1
        |c1,  Ann ,F,1990-01-01,2020-01-01,a@x.com,addr1
        |c2,Bea,F,NULL,2020-02-01,b@x.com,
        |c3,Cy,M,1985-05-05,2021-03-01,c@x.com,addr3
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/call_logs.csv"),
      """call ID,customeR iD,COMPLAINT_catego ry,agent ID,resolutionstatus
        |k1,c1,billing,a1,resolved
        |k2,c2,network,a2,open
        |k3,cX,network,a1,open
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
              (c("dim_agents"), "agent_id", "agent_id"))))))

    Seq("run 1", "run 2 (re-run: ledger skips)").foreach { label =>
      val report = Pipeline.run(spark, sources, root, star)
      println(s"=== $label ===")
      report.stages.foreach(m => println(
        f"  ${m.operation}%-15s processed=${m.processed} skipped=${m.skipped} ${m.durationSeconds}%.2fs"))
      Seq("customers", "dim_customers", "fact_call_logs").foreach { t =>
        println(s"  $t rows=${spark.table(t).count()}")
      }
      println(s"  dim_customers unique(customer_id)=${Quality.isUnique(spark.table("dim_customers"), "customer_id")}")
      println(s"  fact_call_logs notNull(customer_id)=${Quality.isNotNull(spark.table("fact_call_logs"), "customer_id")}")
    }
    spark.stop()
  }
}
