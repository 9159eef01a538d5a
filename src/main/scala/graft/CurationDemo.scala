package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.analytics.{Curation, Dedup}

/** Runnable end-to-end demo of the TRAINING-DATA curation surface —
  * the LLM-pipeline path the library adds beyond the reference's ETL:
  *
  *   documents → PII scrub + quality gates → exact + near dedup →
  *   decontaminate vs a benchmark slice → DSIR importance weights →
  *   deterministic token-budget sample → sequence packing →
  *   eval (calibration bins + rank AUC of the weight vs the label)
  *
  * `sbt "runMain graft.CurationDemo [sfDir]"` (default sf0.001).
  * Each stage is a library operator backing an oracled registry entry
  * (q68+q67/q31/q32/q65/q132/q105/q66/q228/q229), is PERSISTED before
  * its count so later stages never recompute upstream joins, and every
  * stage prints one line. Driver-collect-free except the final
  * few-row reports.
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
    val lvl = StorageLevel.MEMORY_AND_DISK

    val docs = queries.t(spark, sfDir, "documents")
    println(s"[0] corpus: ${docs.count()} docs")

    // 1. PII scrub + Gopher-style quality gates in one fused pass
    //    (Curation.scrubAndGate = q68 + q67 machinery); lang rides
    //    back on for the DSIR/eval stages
    val kept = Curation.scrubAndGate(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .persist(lvl)
    println(s"[1] scrubbed + gated: ${kept.count()} docs")

    // 2. Exact dedup: fingerprint keepers (q31's hash-agg shape —
    //    min doc_id per fingerprint, never a per-hash window sort)
    val keepers = Dedup.exactByFingerprint(kept, "doc_id", "text")
      .select("doc_id")
    val exact = kept.join(keepers, Seq("doc_id"), "left_semi").persist(lvl)
    println(s"[2] exact-deduped: ${exact.count()} docs")

    // 3. Near-dedup: n-gram Jaccard >= 4/5 -> drop the higher doc_id (q32)
    val pairs = Dedup.ngramJaccardPairs(exact, "doc_id", "text",
      n = 3, num = 4, den = 5)
    val losers = pairs
      .select(greatest(col("id_a"), col("id_b")).as("doc_id")).distinct()
      .persist(lvl)
    val near = exact.join(losers, Seq("doc_id"), "left_anti").persist(lvl)
    println(s"[3] near-deduped: ${near.count()} docs (${losers.count()} dropped)")

    // 4. Decontaminate vs a fake benchmark: every 20th doc is "eval";
    //    drop anything sharing >50% of its shingles with it (q65)
    val bench = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
    val verdicts = Curation.contamination(near, "doc_id", "text",
      bench, "text", n = 3)
    val clean = near.join(
      verdicts.filter(col("n_contaminated") * 2 > col("n_sh"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
      .persist(lvl)
    println(s"[4] decontaminated: ${clean.count()} docs")

    // 5. DSIR importance weights toward the English slice (q132)
    val weighted = clean.join(
      Curation.dsirWeights(clean, "doc_id", "text",
        targetPred = col("lang") === "en"),
      Seq("doc_id"), "left")
      .persist(lvl)
    println(s"[5] DSIR-weighted: ${weighted.count()} docs")

    // 6. Deterministic token-budget sample (q105)
    val sampled = Curation.sampleToTokenBudget(clean, "doc_id", "text",
      budget = 10000L).persist(lvl)
    println(s"[6] token-budget 10k sample: ${sampled.count()} docs")

    // 7. Pack into 512-token sequences (q66)
    val packed = Curation.packSequences(
      sampled.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
      budget = 512L)
    val nBins = packed.agg(countDistinct(col("bin"))).head().getLong(0)
    println(s"[7] packed into $nBins bins of <=512 tokens")

    // 8. Eval: does the DSIR weight separate en from non-en? (q228/q229)
    //    Min-max normalize to an e6 score in INTEGER arithmetic (DIV —
    //    the whole eval battery's engine-portability rests on never
    //    leaving 64-bit integers).
    val scored = weighted
      .filter(col("dsir_weight").isNotNull)
      .select(expr("CAST(dsir_weight * 1000000 AS BIGINT)").as("w_e6"),
        (col("lang") === "en").as("pos"))
      .persist(lvl)
    val counts = scored.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("nn"),
      min("w_e6").as("lo"), max("w_e6").as("hi")).head()
    if (counts.isNullAt(0) || counts.getLong(0) == 0L || counts.getLong(1) == 0L)
      println("[8] eval skipped: need at least one positive and one negative")
    else {
      val (lo, hi) = (counts.getLong(2), counts.getLong(3))
      val span = math.max(1L, hi - lo)
      val norm = scored.select(
        expr(s"(w_e6 - ${lo}L) * 1000000L DIV ${span}L").as("score_e6"),
        col("pos"))
      val auc = graft.operators.Stats.rankAuc(norm, "score_e6", "pos")
        .head().getLong(3)
      println(s"[8] DSIR-vs-English rank AUC: ${auc / 10000.0}%")
      graft.operators.Stats.calibrationBins(norm, "score_e6", "pos")
        .orderBy("bin").collect()
        .foreach(r => println(f"    bin ${r.getLong(0)}: n=${r.getLong(1)}%4d pos_rate=${r.getLong(3) / 10000.0}%6.2f%%"))
    }

    spark.stop()
  }
}
