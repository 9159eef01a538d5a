package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{Curation, Dedup, TextAnalysis}

/** Runnable end-to-end demo of the TRAINING-DATA curation surface —
  * the LLM-pipeline path the library adds beyond the reference's ETL:
  *
  *   documents → PII scrub → quality gates → exact + near dedup →
  *   decontaminate vs a benchmark slice → DSIR importance weights →
  *   deterministic token-budget sample → sequence packing →
  *   eval (calibration bins + rank AUC on the kept/dropped verdicts)
  *
  * `sbt "runMain graft.CurationDemo [sfDir]"` (default sf0.001).
  * Every stage prints one line; the whole run is driver-collect-free
  * except the final few-row reports. The same operators back the
  * oracled registry entries (q68/q67/q31/q32/q65/q132/q105/q66/
  * q228/q229), so each stage shown here is independently gated.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-curation-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = queries.t(spark, sfDir, "documents")
    println(s"[0] corpus: ${docs.count()} docs")

    // 1. PII scrub (q68 machinery)
    val scrubbed = TextAnalysis.scrubPii(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumnRenamed("text_scrubbed", "text")
    println(s"[1] scrubbed: ${scrubbed.count()} docs")

    // 2. Quality gates: token-count floor (q67's gate family)
    val gated = scrubbed
      .withColumn("__ntok", TextAnalysis.tokenCount(col("text")).cast("long"))
      .filter(col("__ntok") >= 5)
    println(s"[2] gated (>=5 tokens): ${gated.count()} docs")

    // 3. Exact dedup on the canonical text hash (q31)
    val exact = gated.withColumn("__h", md5(col("text").cast("binary")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__h").orderBy("doc_id")))
      .filter(col("__rn") === 1).drop("__h", "__rn")
    println(s"[3] exact-deduped: ${exact.count()} docs")

    // 4. Near-dedup: n-gram Jaccard >= 4/5 -> drop the higher doc_id (q32)
    val pairs = Dedup.ngramJaccardPairs(exact, "doc_id", "text",
      n = 3, num = 4, den = 5)
    val losers = pairs.select(greatest(col("id_a"), col("id_b")).as("doc_id")).distinct()
    val near = exact.join(losers, Seq("doc_id"), "left_anti")
    println(s"[4] near-deduped: ${near.count()} docs (${losers.count()} dropped)")

    // 5. Decontaminate vs a fake benchmark: every 20th doc is "eval";
    //    drop anything sharing >50% of its shingles with it (q65)
    val bench = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
    val verdicts = Curation.contamination(near, "doc_id", "text",
      bench, "text", n = 3)
    val clean = near.join(
      verdicts.filter(col("n_contaminated") * 2 > col("n_sh"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    println(s"[5] decontaminated: ${clean.count()} docs")

    // 6. DSIR importance weights toward the English slice (q132)
    val weighted = clean.join(
      Curation.dsirWeights(clean, "doc_id", "text",
        targetPred = col("lang") === "en"),
      Seq("doc_id"), "left")
    println(s"[6] DSIR-weighted: ${weighted.count()} docs")

    // 7. Deterministic token-budget sample (q105)
    val sampled = Curation.sampleToTokenBudget(clean, "doc_id", "text",
      budget = 10000L)
    println(s"[7] token-budget 10k sample: ${sampled.count()} docs")

    // 8. Pack into 512-token sequences (q66)
    val packed = Curation.packSequences(
      sampled.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
      budget = 512L)
    val nBins = packed.agg(countDistinct(col("bin"))).head().getLong(0)
    println(s"[8] packed into $nBins bins of <=512 tokens")

    // 9. Eval: does the DSIR weight separate en from non-en? (q228/q229)
    val scored = weighted
      .filter(col("dsir_weight").isNotNull)
      .select(expr("CAST(dsir_weight * 1000000 AS BIGINT)").as("w_e6"),
        (col("lang") === "en").as("pos"))
    val lo = scored.agg(min("w_e6")).head().getLong(0)
    val hi = scored.agg(max("w_e6")).head().getLong(0)
    val norm = scored.select(
      (((col("w_e6") - lo) * 1000000L) / math.max(1L, hi - lo)).cast("long")
        .as("score_e6"), col("pos"))
    val auc = graft.operators.Stats.rankAuc(norm, "score_e6", "pos")
      .head().getLong(3)
    println(s"[9] DSIR-vs-English rank AUC: ${auc / 10000.0}%")
    graft.operators.Stats.calibrationBins(norm, "score_e6", "pos")
      .orderBy("bin").collect()
      .foreach(r => println(f"    bin ${r.getLong(0)}: n=${r.getLong(1)}%4d pos_rate=${r.getLong(3) / 10000.0}%6.2f%%"))

    spark.stop()
  }
}
