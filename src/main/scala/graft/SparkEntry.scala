package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator registry is assembled from per-domain modules under
  * graft.queries; each entry pairs a Spark implementation (built from the
  * library operators in graft.operators / graft.analytics) with, where
  * SQL-expressible, a DuckDB oracle over the same parquet tables.
  */
object SparkEntry {

  private val registry: Map[String, Q] =
    ParityQueries.defs ++ AnalyticsQueries.defs ++ EventsQueries.defs ++
      TextQueries.defs ++ EmbeddingQueries.defs ++ SqlSurfaceQueries.defs ++
      CurationQueries.defs ++ StreamingParityQueries.defs

  /** Registry pin — the single place the expected registry size lives.
    * EntrySmokeSpec asserts the live registry against these numbers, so
    * registering (or oracling) a query is a one-edit change: bump here,
    * in the same file as the registry itself. Keeping the pin next to
    * the `registry` definition (rather than hardcoded in the spec) is
    * what makes a stale-count red suite impossible to ship by
    * forgetting a second file. */
  val RegisteredQueryCount: Int = 336
  // round 7: every query is oracled — the 18 approximate rungs now
  // register their invariant VERDICTS (exact counterpart + boolean
  // contract) instead of rows-only dumps. Round 8 adds the 8 streaming
  // batch-parity verdicts (q313-q320), lexicon sentiment (q321), and
  // streaming ANN-index maintenance (q322) + the persisted MinHash index
  // probe (q323), all oracled; q325 is incremental dedup-group
  // maintenance, oracled against the full recompute (exact equality).
  // Round 9 adds the index-lifecycle verdicts: q326 streaming MinHash
  // ingest (stream face == batch face), q327 IVF-PQ health report,
  // q328 IVF-PQ delta compaction (bit-equal serve, bounded files),
  // q329 MinHash index health report, q330 streaming probe-at-ingest
  // (stream probe union == one-shot batch probe). Round 10 adds q331
  // (drift-triggered IVF-PQ rebuild) and q332 (MinHash online
  // compaction + vacuum); round 11 adds q333 (MinHash parameter
  // rebuild: re-band the indexed population, planted-pair recall
  // recovers, replay no-op). Round 12 adds q334 (the composed disaster
  // drill: build → append → stream → crash-sim → rebuild mid-stream →
  // compact → vacuum → replay volley → fresh-checkpoint refusal, seam
  // invariants asserted throughout). Round 13 adds q335 (the same
  // composed drill for the IVF-PQ family, with an explicit n_cells
  // re-anchor at the rebuild seam) and q336 (batched fused IVF-PQ
  // serving: one union-of-probed-cells scan, per query bit-identical
  // to the single-query serve).
  val OracledQueryCount: Int = 336

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship shape (SURVEY §7.2): clean fact inner-joined
    * to broadcast dims, fact columns projected. */
  def entry(spark: SparkSession): DataFrame =
    registry("q09_star_fact").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, qd) => name -> qd.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }

  /** Serving-only faces of the verdict rungs (ANN ladder, MinHash/
    * SimHash): the operator without its in-query exact verification.
    * Timed by Bench into the artifact's "serving" section so the
    * serving path's cost stays observable round-over-round; NOT part
    * of the oracled registry (the verdict rows are the correctness
    * gate). */
  def servingQueries: Map[String, (SparkSession, String) => DataFrame] =
    EmbeddingQueries.servingDefs ++ TextQueries.servingDefs
}
