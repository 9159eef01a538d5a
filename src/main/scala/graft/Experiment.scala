package graft

// Scratch harness for optimization-round phase timing — not registered,
// not part of the driver contract. Run:
//   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Experiment <sfDir> <what>"
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Experiment {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val what = if (args.length > 1) args(1) else "pagerank"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def t(name: String) = graft.queries.t(spark, sfDir, name)

    what match {
      case "pagerank" =>
        // replicate q142's shape phase by phase
        (1 to 2).foreach { round =>
          println(s"--- round $round ---")
          spark.catalog.clearCache()
          val pairs = timed("pairs(join+distinct)") {
            val p = t("orders")
              .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
              .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
                concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
              .distinct()
            p.write.format("noop").mode("overwrite").save(); p
          }
          val sym = pairs.select(explode(array(
              struct(col("src"), col("dst")),
              struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
          val out = timed("pageRank(5 iters)") {
            val r = graft.operators.Graph.pageRank(sym, "src", "dst", iters = 5)
            r.write.format("noop").mode("overwrite").save(); r
          }
          timed("orderBy+count") { out.orderBy("node").count() }
        }
      case _ => println(s"unknown: $what")
    }
    spark.stop()
  }
}
