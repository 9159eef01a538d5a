package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's single production entry point for Catalyst extension
  * injection — the standard `SparkSessionExtensions` path, so a
  * deployment enables EVERYTHING from session start with one config:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftSessionExtensions
  * }}}
  *
  * or programmatically
  * `SparkSession.builder().withExtensions(new GraftSessionExtensions)`.
  *
  * Injects, in one pass:
  *  - the custom codegen'd SQL functions (rolling_hash64, simhash64,
  *    array_dot_long, array_l2_long, dedup_lines, nfc_normalize,
  *    minhash_sig) via [[graft.functions.GraftExtensions]];
  *  - the materialized-rollup rewrite ([[graft.plans.RollupRewrite]])
  *    and the range-join bucketing rewrite
  *    ([[graft.plans.RangeJoinRewrite]]) as post-optimizer rules —
  *    both are internally gated (an empty rollup registry / unset
  *    bucket width match nothing), so injection is free until an
  *    operator enables them;
  *  - the planner strategy for the custom logical nodes
  *    ([[graft.plans.GraftStrategy]]: DecayedScan, HoltScan).
  *
  * The operators' runtime self-registration via
  * `spark.experimental.*` stays in place (idempotent) so ad-hoc
  * sessions keep working without the config; on an extensions-built
  * session the self-registration is a harmless duplicate — both rules
  * are fixed-point (they never re-fire on their own output), and the
  * strategy returns the same physical node either way.
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    new graft.functions.GraftExtensions().apply(e)
    e.injectOptimizerRule(_ => graft.plans.RollupRewrite)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}
