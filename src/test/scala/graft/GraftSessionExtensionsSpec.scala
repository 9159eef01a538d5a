package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.LongType

/** The production wire-up: `spark.sql.extensions=
  * graft.GraftSessionExtensions` is a STATIC conf set on the conf that
  * creates the SparkContext (SparkSpec's builder — the same line a
  * cluster's spark-defaults carries), and every session built on that
  * context — including a fresh one with no programmatic registration
  * anywhere — must carry the SQL functions and the custom-plan strategy
  * from session start, via the reflective config path. The gated
  * rewrites are NOT part of the extension: they self-append to
  * extraOptimizations (the final optimizer batch) on enable/register,
  * exactly once. */
class GraftSessionExtensionsSpec extends SparkSpec {

  test("config-only session: functions, optimizer rules, strategy all injected") {
    val orig = spark // force the shared (extensions-configured) context
    assert(orig.sparkContext.getConf.get("spark.sql.extensions") ==
      "graft.GraftSessionExtensions")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // A FRESH session over the configured context: extensions come
      // only from the reflective static-conf path.
      val ext = SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(ext ne orig, "builder must create a fresh session, not reuse")

      // SQL functions resolve with zero programmatic registration.
      val r = ext.sql(
        """SELECT rolling_hash64('hello') AS h,
                  array_dot_long(array(1L, 2L), array(3L, 4L)) AS d,
                  array_l2_long(array(1L, 2L), array(3L, 4L)) AS l2,
                  dedup_lines('a\na\nb') AS dl,
                  nfc_normalize('é') AS n,
                  sparse_dot_long(array('a', 'c'), array(2L, 3L),
                                  array('b', 'c'), array(5L, 7L)) AS sd
        """).collect().head
      assert(r.getLong(1) == 11L)
      assert(r.getLong(2) == 8L)
      assert(r.getString(3) == "a\nb")
      assert(r.getString(4) == "é")
      assert(r.getLong(5) == 21L)

      // The GATED rewrites are NOT injected by the extension (their
      // documented placement is extraOptimizations, appended on
      // enable/register) — until an operator enables them the optimizer
      // must not carry them at all...
      def instances(s: SparkSession) = {
        val rules = s.sessionState.optimizer.batches.flatMap(_.rules)
        (rules.count(_ eq graft.plans.RollupRewrite),
          rules.count(_ eq graft.plans.RangeJoinRewrite))
      }
      assert(instances(ext) == ((0, 0)),
        "gated rewrites must be absent until enabled")
      // ...and once enabled, exactly ONE instance each, in the
      // post-main-batches User Provided Optimizers slot (the double
      // registration the old injectOptimizerRule path produced — rule
      // both mid-batch and appended — is the regression this pins).
      graft.plans.RangeJoinRewrite.enable(ext, 3600L)
      val cubeDir = java.nio.file.Files
        .createTempDirectory("graft-ext-cube").toString
      val docs = graft.queries.t(ext, sf, "documents")
      graft.plans.RollupRewrite.materializeAndRegister(ext, "ext_spec_cube",
        docs, s"$sf/documents.parquet", dims = Seq("lang"),
        measures = Seq("n_chars"), cubeDir)
      try {
        assert(instances(ext) == ((1, 1)),
          "enabled session must carry exactly one instance of each rewrite")
        // ...in the post-main-batches User Provided Optimizers slot
        // (extraOptimizations), after every operator-optimization batch
        val batches = ext.sessionState.optimizer.batches
        val upo = batches.indexWhere(_.name == "User Provided Optimizers")
        assert(upo >= 0, batches.map(_.name).mkString(", "))
        assert(batches(upo).rules.exists(_ eq graft.plans.RollupRewrite)
          && batches(upo).rules.exists(_ eq graft.plans.RangeJoinRewrite),
          "rewrites must sit in the extraOptimizations batch")
        assert(upo > batches.indexWhere(_.name.contains("Operator Optimization")),
          "extraOptimizations must run after the main operator-optimization batches")
      } finally {
        graft.plans.RangeJoinRewrite.disable()
        graft.plans.RollupRewrite.deregister("ext_spec_cube")
      }

      // The custom-plan strategy plans a DecayedScan with NO runtime
      // self-registration: extraStrategies stays empty, so the injected
      // strategy is the only thing that can have planned the node.
      assert(ext.sessionState.experimentalMethods.extraStrategies.isEmpty)
      val df = ext.createDataFrame(Seq(
        (1L, 1L, 100L), (1L, 2L, 50L), (2L, 1L, 10L), (2L, 2L, 10L)))
        .toDF("k", "o", "v")
      val node = graft.plans.DecayedScan(
        Shim.expression(df.col("k")), Seq(Shim.expression(df.col("o"))),
        Shim.expression(df.col("v")), 1L, 2L,
        AttributeReference("s", LongType, nullable = false)(),
        df.queryExecution.analyzed)
      val out = Shim.ofRows(ext, node)
        .select("k", "o", "s").collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
      assert(out == Map((1L, 1L) -> 100L, (1L, 2L) -> 100L,
        (2L, 1L) -> 10L, (2L, 2L) -> 15L))
      assert(ext.sessionState.experimentalMethods.extraStrategies.isEmpty,
        "planning must not have self-registered the strategy")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
