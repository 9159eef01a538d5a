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
  *  - the planner strategy for the custom logical nodes
  *    ([[graft.plans.GraftStrategy]]: DecayedScan, HoltScan).
  *
  * The two GATED rewrites — [[graft.plans.RollupRewrite]] and
  * [[graft.plans.RangeJoinRewrite]] — are deliberately NOT injected
  * here. `injectOptimizerRule` would place them inside the fixed-point
  * operator-optimization batch, but both are specified to run AFTER
  * the main optimizer batches (they match fully-normalized Aggregate /
  * Join shapes), and both already self-register on the correct hook:
  * `RollupRewrite.materializeAndRegister` / `RangeJoinRewrite.enable`
  * append the singleton rule to `spark.experimental.extraOptimizations`
  * exactly once — the last optimizer batch, i.e. the documented
  * placement — so an enabled session carries exactly ONE instance of
  * each (pinned by GraftSessionExtensionsSpec). Until enabled they are
  * absent from the optimizer entirely: zero per-query probe cost.
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    new graft.functions.GraftExtensions().apply(e)
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}
