package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Audit of NO-PARTITION window operators across the whole registry.
  *
  * A `Window.orderBy(...)` with no `partitionBy` plans a WindowExec
  * over a single partition — Spark warns "No Partition Defined! Moving
  * all data to a single partition" because at corpus scale it IS a
  * scale bug: the entire input sorts through one task. The repo's
  * discipline is that global windows only ever run on post-rollup
  * relations that are provably bounded (day-grain series, deciles,
  * vocabularies, per-group summaries) — this spec turns that review
  * rule into a gate: it walks every registered query's optimized plan,
  * collects the queries that plan at least one global window, and
  * asserts the set EQUALS the allowlist below (each entry naming its
  * bound). A new global window over an unbounded relation fails the
  * suite instead of scrolling past as a WARN line; a stale allowlist
  * entry (query stopped planning one) fails too, so the table cannot
  * rot. Bench/Verify silence the WindowExec logger on the strength of
  * exactly this gate. */
class GlobalWindowAuditSpec extends SparkSpec {

  /** query → the bound that makes its global window(s) safe.
    *
    * "GlobalRank" entries are SIZE-GATED: GlobalRank measures its
    * input (persist + count) and takes the single-partition window
    * form only when the count is at or below
    * spark.graft.globalrank.maxSinglePartitionRows (default 2^20) —
    * so the global window these queries plan at this spec's scale is
    * bounded by a runtime gate, and a corpus-sized input switches to
    * the distributed machinery whose only global window is the
    * per-partition offsets relation: ONE row per shuffle partition
    * (metadata-scale by construction — ≤ spark.sql.shuffle.partitions
    * rows, whatever the data size). The data-sized rank there is
    * partitioned by __pid; GlobalRankSpec pins both paths and their
    * bit-equality. The other bounds are
    * post-rollup grains: days/months (calendar-sized), deciles
    * (10 rows), sources (enum-sized), k seed rows (limit k feeds the
    * window), distinct-x maxima (Skyline's documented bounded-axis
    * contract), topN slice (WindowGroupLimit prunes map-side to
    * ≤ partitions × topN before the single-partition sort). */
  private val bounded: Map[String, String] = Map(
    "q105_token_budget_sample" -> "GlobalRank offsets scan (sampling rank)",
    "q120_quality_deciles" -> "GlobalRank offsets scan (rankBuckets)",
    "q125_user_growth" -> "day-grain cumulative (one row per day)",
    "q128_pareto_frontier" -> "distinct-x maxima (Skyline bounded-axis contract)",
    "q158_quantile_normalize" -> "GlobalRank offsets scan (pooled rank)",
    "q165_model_calibration" -> "GlobalRank offsets scan (score rank)",
    "q171_vocab_growth" -> "GlobalRank offsets scan + decile rollup (10 rows)",
    "q184_peak_concurrency" -> "GlobalRank offsets scan (event-delta prefix sum)",
    "q187_revenue_trend" -> "month rollup (one row per month)",
    "q188_abc_classification" -> "GlobalRank offsets scan (cumulative revenue)",
    "q191_rfm_segments" -> "GlobalRank offsets scans (3 distributed ntiles)",
    "q202_autocorr_revenue" -> "day-series post-rollup (Stats contract)",
    "q203_cusum_revenue" -> "day-series post-rollup (Stats contract)",
    "q208_linear_interp" -> "day calendar spine (sequence off a 1-row agg)",
    "q212_budget_apportion" -> "source rollup (one row per source)",
    "q217_vocab_coverage" -> "GlobalRank offsets scan (vocab rank + share)",
    "q229_rank_auc" -> "GlobalRank offsets scan (score rank)",
    "q242_ks_drift" -> "GlobalRank offsets scan (pooled rank)",
    "q243_mann_whitney" -> "GlobalRank offsets scan (pooled rank)",
    "q256_ewma_revenue" -> "day-series post-rollup (Stats contract)",
    "q266_rfm_segments" -> "GlobalRank offsets scans (3 distributed ntiles)",
    "q273_zipf_slope" -> "topN slice (WindowGroupLimit-pruned)",
    "q295_decile_migration" -> "GlobalRank offsets scans (2 distributed ntiles)",
    "q301_sorted_neighborhood" -> "GlobalRank offsets scan (neighborhood rank)",
    "q310_kmeans_clusters" -> "k seed rows (limit k feeds the window)",
    "q311_cluster_balanced_sample" -> "k seed rows (limit k feeds the window)",
    "q66_pack_sequences" -> "GlobalRank offsets scan (token prefix sum)",
    "q78_curate_corpus" -> "GlobalRank offsets scan (packing prefix sum)")

  test("every registered query that plans a global (no-partition) window does so over a provably bounded relation") {
    val offenders = scala.collection.mutable.SortedMap.empty[String, Int]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          fail(s"$name failed to construct at $sf: ${e.getMessage}") }
      val n = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) { offenders(name) = n; () }
    }
    val unexpected = offenders.keySet -- bounded.keySet
    val stale = bounded.keySet -- offenders.keySet
    assert(unexpected.isEmpty,
      s"queries planning a global window WITHOUT a documented bound: " +
        unexpected.toSeq.sorted.map(q => s"$q(${offenders(q)})")
          .mkString(", "))
    assert(stale.isEmpty,
      s"allowlist entries that no longer plan a global window " +
        s"(table rot): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
