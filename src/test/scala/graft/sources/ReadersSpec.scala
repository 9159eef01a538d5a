package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

class ReadersSpec extends SparkSpec {

  private def tmpDir = Files.createTempDirectory("readers").toString

  test("csv: messy headers round-trip; NULL/empty literals become null") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"),
      "customeR iD,DATE of biRTH,email\nc1,NULL,a@x.com\nc2,1990-01-01,\n")
    val df = Readers.csvAllString(spark, s"$dir/a.csv")
    assert(df.columns.toSeq == Seq("customeR iD", "DATE of biRTH", "email"))
    val rows = df.orderBy("`customeR iD`").collect()
    assert(rows(0).isNullAt(1)) // "NULL" literal
    assert(rows(1).isNullAt(2)) // empty literal
  }

  test("csv with inference types numerics, keeps strings") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Paths.get(s"$dir/n.csv"),
      "id,score,name\n1,2.5,ann\n2,3.5,bea\n")
    val df = Readers.csv(spark, s"$dir/n.csv")
    assert(df.schema("id").dataType == IntegerType)
    assert(df.schema("score").dataType == DoubleType)
    assert(df.schema("name").dataType == StringType)
  }

  test("json: newline-delimited objects with native inference") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.json"),
      """{"complaint_id":"x1","n":1}
        |{"complaint_id":"x2","n":2}
        |""".stripMargin)
    val df = Readers.json(spark, s"$dir/d.json")
    assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("complaint_id", "n"))
  }

  test("rows: sheet-like driver-side records become a DataFrame (S3 analog)") {
    val schema = StructType(Seq(
      StructField("iD", StringType), StructField("NamE", StringType)))
    val df = Readers.rows(spark, Seq(Row("a1", "Zed"), Row("a2", "Yan")), schema)
    assert(df.count() == 2 && df.columns.toSeq == Seq("iD", "NamE"))
  }

  test("jdbc: Derby round-trip + sorted table discovery (S4)") {
    val url = s"jdbc:derby:memory:graftdb${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE APP.WEB_B (request_id VARCHAR(10))")
    st.execute("CREATE TABLE APP.WEB_A (request_id VARCHAR(10))")
    st.execute("INSERT INTO APP.WEB_A VALUES ('r1'), ('r2')")
    st.close(); conn.close()
    val tables = Readers.jdbcAllTables(spark, url, "APP")
    assert(tables.map(_._1) == Seq("WEB_A", "WEB_B")) // deterministic order
    assert(tables.head._2.count() == 2)
  }

  test("jdbcPartitioned: scan splits into parallel range-query partitions") {
    val url = s"jdbc:derby:memory:graftpart${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE APP.CALLS (call_id BIGINT, who VARCHAR(10))")
    st.execute("INSERT INTO APP.CALLS VALUES " +
      (1 to 40).map(i => s"($i, 'u$i')").mkString(", "))
    st.close(); conn.close()
    val df = Readers.jdbcPartitioned(spark, url, "APP.CALLS",
      "call_id", lowerBound = 1, upperBound = 40, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4) // 4 concurrent range cursors
    assert(df.count() == 40) // ranges partition the table exactly
    // bounds-discovering variant: same result without caller-known bounds
    val auto = Readers.jdbcPartitionedAuto(spark, url, "APP.CALLS",
      "call_id", numPartitions = 4)
    assert(auto.rdd.getNumPartitions > 1)
    assert(auto.count() == 40)
  }

  test("csvWithCorruptCapture: malformed rows quarantined, not fatal or silent") {
    val dir = tmpDir
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/m.csv"),
      "id,score\n1,2.5\nnot_a_number,whoops\n3,4.0\n".getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    val rows = Readers.csvWithCorruptCapture(spark, s"$dir/m.csv", schema)
      .collect()
    assert(rows.length == 3)
    val corrupt = rows.filter(r => !r.isNullAt(2))
    assert(corrupt.length == 1)
    assert(corrupt.head.getString(2) == "not_a_number,whoops") // raw line kept
    assert(rows.filter(r => r.isNullAt(2)).map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("orc: write-read round-trip preserves schema and values") {
    val root = tmpDir
    import spark.implicits._
    val data = Seq((1L, "a", 1.5), (2L, "NULL", 2.5), (3L, null, 3.5))
      .toDF("id", "name", "score")
    graft.operators.TableStore.writeAs(data, "orc", s"$root/orc")
    val back = Readers.orc(spark, s"$root/orc")
    assert(back.columns.toSeq == Seq("id", "name", "score"))
    assert(back.count() == 3)
    // values, including genuine nulls, survive the round-trip; the
    // "NULL" literal is NOT narrowed here (that is the CSV ingestion
    // boundary's contract, not the self-describing formats')
    val names = back.orderBy("id").select("name").as[String].collect().toSeq
    assert(names == Seq("a", "NULL", null))
  }

  test("orc scan prunes columns and pushes filters like parquet") {
    val root = tmpDir
    import spark.implicits._
    (1L to 1000L).map(i => (i, s"n$i", i % 7)).toDF("id", "name", "grp")
      .write.orc(s"$root/t")
    val df = Readers.orc(spark, s"$root/t")
      .filter(org.apache.spark.sql.functions.col("grp") === 3)
      .select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("grp"),
      s"filter must reach the ORC scan:\n$plan")
    assert(!plan.contains("name"), s"pruned column must not be read:\n$plan")
    assert(df.count() == 143)
  }

  test("discoverTables: one table per subdirectory, sorted (S7)") {
    val root = tmpDir
    import spark.implicits._
    Seq(1, 2).toDF("x").write.parquet(s"$root/beta")
    Seq(3).toDF("x").write.parquet(s"$root/alpha")
    val found = Readers.discoverTables(spark, root)
    assert(found.map(_._1) == Seq("alpha", "beta"))
    assert(found.map(_._2.count()).sum == 3)
  }
}
