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
      case "pr-phases" =>
        // inline replica of Graph.pageRank with per-phase prints, in
        // two shapes: "old" (r14: no e persist, no co-partitioning)
        // and "new" (r15: e persisted, eDeg/nodesN co-partitioned)
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        Seq("warm", "chunk2", "old", "chunk5",
            "chunk2", "old", "chunk5", "chunk2", "old").foreach { shape =>
          spark.catalog.clearCache()
          println(s"--- shape $shape ---")
          val pairs = t("orders")
            .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
            .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
              concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
            .distinct()
          val sym = pairs.select(explode(array(
              struct(col("src"), col("dst")),
              struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
            .select(col("e.src").as("__src"), col("e.dst").as("__dst"))
          val copart = shape == "new"
          val doPersist = shape == "new" || shape == "persistonly"
          val chunk = shape match {
            case "chunk2" => 2
            case "chunk5" => 5
            case _ => 1
          }
          val e = if (doPersist) sym.persist(lvl) else sym
          val eDeg0 = e
            .join(e.groupBy("__src").agg(count(lit(1)).as("__deg")), "__src")
          val eDeg = (if (copart)
              eDeg0.repartition(col("__src")).sortWithinPartitions("__src")
            else eDeg0).persist(lvl)
          timed("eDeg materialize")(eDeg.count())
          val nodes = e.select(col("__src").as("node"))
            .union(e.select(col("__dst")))
            .distinct().persist(lvl)
          val nTotal = nodes.agg(count(lit(1)).as("__n"))
          val nodesN0 = nodes.crossJoin(broadcast(nTotal))
          val nodesN = (if (copart)
              nodesN0.repartition(col("node")).sortWithinPartitions("node")
            else nodesN0).persist(lvl)
          timed("nodesN materialize")(nodesN.count())
          val teleport = expr("150000000000L DIV __n")
          var rank = nodesN
            .select(col("node"), expr("1000000000000L DIV __n").as("rank_e12"))
            .persist(lvl)
          (1 to 5).foreach { i =>
            val contribs = rank
              .join(eDeg, rank("node") === eDeg("__src"))
              .select(col("__dst").as("node"), expr("rank_e12 DIV __deg").as("__c"))
              .groupBy("node").agg(sum("__c").as("__in"))
            val next0 = nodesN
              .join(contribs, Seq("node"), "left")
              .select(col("node"),
                (teleport + expr("85L * coalesce(__in, 0L) DIV 100")).as("rank_e12"))
            if (i % chunk == 0 || i == 5) {
              val next = next0.persist(lvl)
              timed(s"round $i count")(next.count())
              rank.unpersist()
              rank = next
            } else rank = next0
          }
          timed("final orderBy count")(rank.orderBy("node").count())
        }
      case "tfidf" =>
        // q284's tfIdfCosinePairs, phase by phase (guide §1.4/§1.5)
        import org.apache.spark.sql.functions.{count => fcount}
        (1 to 2).foreach { round =>
          println(s"--- round $round ---")
          spark.catalog.clearCache()
          val df = t("documents")
          val D = org.apache.spark.sql.types.DecimalType(38, 0)
          val maxDocFreq = 256L
          val tf = df
            .select(col("source").as("__blk"), col("doc_id").as("__id"),
              explode(graft.analytics.TextAnalysis.tokens(lower(col("text"))))
                .as("__term"))
            .groupBy("__blk", "__id", "__term").agg(fcount(lit(1)).as("__tf"))
          val nd = tf.agg(count_distinct(col("__id")).as("__nd"))
          val dft = tf.groupBy("__term").agg(fcount(lit(1)).as("__df"))
          val w = tf.join(dft, Seq("__term"))
            .crossJoin(broadcast(nd))
            .filter(col("__df") < col("__nd"))
            .select(col("__blk"), col("__id"), col("__term"),
              (col("__tf") * expr(
                "CAST(floor(1000 * ln(CAST(__nd AS DOUBLE) / __df) + 0.5) AS BIGINT)"))
                .as("__wl"),
              (col("__df") <= maxDocFreq).as("__kept"))
            .withColumn("__w", col("__wl").cast(D))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          timed("w build+persist") {
            w.write.format("noop").mode("overwrite").save() }
          val zero = lit(0).cast(D)
          val norm = w.groupBy(col("__id"))
            .agg(sum(expr("__w * __w")).as("__n2"),
              sum(when(!col("__kept"), expr("__w * __w")).otherwise(zero)).as("__n2d"))
          timed("norm") {
            norm.write.format("noop").mode("overwrite").save() }
          val wk = w.filter(col("__kept"))
          val dotK = wk.select(col("__blk"), col("__term"),
              col("__id").as("id_a"), col("__w").as("__wa"))
            .join(wk.select(col("__blk"), col("__term"),
              col("__id").as("id_b"), col("__w").as("__wb"))
              .hint("shuffle_hash"), Seq("__blk", "__term"))
            .filter(col("id_a") < col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(sum(expr("__wa * __wb")).as("__dotk"))
          timed("dotK self-join+agg") {
            dotK.write.format("noop").mode("overwrite").save() }
          val cand1 = dotK
            .join(norm.select(col("__id").as("id_a"), col("__n2").as("__na"),
              col("__n2d").as("__nda")), Seq("id_a"))
            .join(norm.select(col("__id").as("id_b"), col("__n2").as("__nb"),
              col("__n2d").as("__ndb")), Seq("id_b"))
            .filter(expr(s"2 * 25 * (__dotk * __dotk + __nda * __ndb)" +
              s" >= 16 * __na * __nb"))
            .select(col("id_a"), col("id_b"))
          timed("cand1 (norm joins)") {
            cand1.write.format("noop").mode("overwrite").save() }
          val heavy = norm
            .filter(expr(s"2 * 25 * __n2d >= 16 * __n2"))
            .select(col("__id"))
          val wd = w.filter(!col("__kept"))
            .join(heavy.hint("broadcast"), Seq("__id"))
          val heavyB0 = wd.select(col("__blk"), col("__id")).distinct()
          val heavyCnt = heavyB0.groupBy("__blk").agg(fcount(lit(1)).as("__hc"))
          val heavyB = heavyB0.join(heavyCnt.hint("broadcast"), Seq("__blk"))
            .filter(assert_true(col("__hc") <= (1L << 16),
              lit("boom")).isNull)
            .select(col("__blk"), col("__id"))
          val cand2 = heavyB.as("hx")
            .join(heavyB.as("hy").hint("shuffle_hash"),
              col("hx.__blk") === col("hy.__blk")
                && col("hx.__id") < col("hy.__id"))
            .select(col("hx.__id").as("id_a"), col("hy.__id").as("id_b"))
          timed("cand2 (heavy grid)") {
            cand2.write.format("noop").mode("overwrite").save() }
          val cand = cand1.union(cand2).distinct()
          timed("cand union+distinct") {
            cand.write.format("noop").mode("overwrite").save() }
          val vecs = w.groupBy(col("__id"))
            .agg(sort_array(collect_list(struct(col("__term"), col("__wl"))))
              .as("__v"))
            .select(col("__id"),
              transform(col("__v"), e => e.getField("__term")).as("__ts"),
              transform(col("__v"), e => e.getField("__wl")).as("__ws"))
          timed("vecs build") {
            vecs.write.format("noop").mode("overwrite").save() }
          val dot = cand
            .join(vecs.select(col("__id").as("id_a"), col("__ts").as("__tsa"),
              col("__ws").as("__wsa")), Seq("id_a"))
            .join(vecs.select(col("__id").as("id_b"), col("__ts").as("__tsb"),
              col("__ws").as("__wsb")), Seq("id_b"))
            .select(col("id_a"), col("id_b"),
              graft.functions.SparseDotLong(col("__tsa"), col("__wsa"),
                col("__tsb"), col("__wsb")).cast(D).as("__dot"))
          val fin = dot
            .join(norm.select(col("__id").as("id_a"), col("__n2").as("__na")), Seq("id_a"))
            .join(norm.select(col("__id").as("id_b"), col("__n2").as("__nb")), Seq("id_b"))
            .filter(col("__dot") >= 0
              && expr(s"__dot * __dot * 25 >= __na * __nb * 16"))
          timed("dot+final") {
            fin.write.format("noop").mode("overwrite").save() }
          println(s"COUNTS cand1=${cand1.count()} cand2=${cand2.count()} " +
            s"cand=${cand.count()} heavyB=${heavyB.count()} " +
            s"w=${w.count()} kept=${wk.count()}")
          val full = graft.analytics.TextAnalysis.tfIdfCosinePairs(
            df, "doc_id", "text", "source", num = 4, den = 5)
          timed("FULL operator") {
            full.write.format("noop").mode("overwrite").save() }
        }
      case "pr-iter-plan" =>
        // evidence for plans/r15: ONE pageRank round's physical plan in
        // the simple shape (edges below the co-partition gate) vs the
        // forced co-partitioned shape (gate = 0), with auto-broadcast
        // disabled so the plans show what happens past broadcast scale
        // (the regime the re-layout exists for)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val outDir = new java.io.File("/tmp/pr_iter_plans")
        outDir.mkdirs()
        Seq(("simple", (1L << 62).toString), ("copartitioned", "0"))
          .foreach { case (label, gate) =>
            spark.catalog.clearCache()
            spark.conf.set("spark.graft.graph.copartitionMinEdges", gate)
            val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
            val pairs = t("orders")
              .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
              .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
                concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
              .distinct()
            val sym = pairs.select(explode(array(
                struct(col("src"), col("dst")),
                struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
              .select(col("e.src").as("__s"), col("e.dst").as("__d"))
            // build the loop-invariant relations exactly as pageRank does
            val e = sym.persist(lvl)
            val eDeg0 = e
              .join(e.groupBy("__s").agg(count(lit(1)).as("__deg")), "__s")
              .persist(lvl)
            eDeg0.count()
            val eDeg = if (gate == "0")
              eDeg0.repartition(col("__s")).sortWithinPartitions("__s")
                .persist(lvl)
            else eDeg0
            eDeg.count()
            val nodes = e.select(col("__s").as("node"))
              .union(e.select(col("__d"))).distinct().persist(lvl)
            val nTotal = nodes.agg(count(lit(1)).as("__n"))
            val nodesN = nodes.crossJoin(broadcast(nTotal)).persist(lvl)
            val rank = nodesN
              .select(col("node"), expr("1000000000000L DIV __n").as("rank_e12"))
              .persist(lvl)
            rank.count()
            val next = nodesN
              .join(
                rank.join(eDeg, rank("node") === eDeg("__s"))
                  .select(col("__d").as("node"),
                    expr("rank_e12 DIV __deg").as("__c"))
                  .groupBy("node").agg(sum("__c").as("__in")),
                Seq("node"), "left")
              .select(col("node"),
                expr("150000000000L DIV __n")
                  + expr("85L * coalesce(__in, 0L) DIV 100"))
            val txt = next.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"/tmp/pr_iter_plans/$label.txt"),
              txt.getBytes("UTF-8"))
            println(s"WROTE $label: " +
              s"${txt.linesIterator.count(_.contains("Exchange"))} Exchange nodes, " +
              s"${txt.linesIterator.count(_.contains("Sort "))} Sorts")
            spark.conf.unset("spark.graft.graph.copartitionMinEdges")
          }
      case "kmeans" =>
        val e = t("embeddings")
        println("rows=" + e.count())
        (1 to 3).foreach { i =>
          timed(s"trainPqCodebookKmeans #$i") {
            graft.analytics.Similarity.trainPqCodebookKmeans(
              e, "vec_id", "embedding") }
        }
      case _ => println(s"unknown: $what")
    }
    spark.stop()
  }
}
