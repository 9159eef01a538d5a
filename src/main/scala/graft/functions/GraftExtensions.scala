package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * codegen'd expressions as SQL functions, so
  * `spark.sql("SELECT rolling_hash64(text) ...")` and
  * `array_dot_long(a, b)` work next to the built-ins.
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("array_dot_long"),
      new ExpressionInfo(classOf[ArrayDotLong].getName, "array_dot_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot_long(a, b) takes 2 arguments")
        ArrayDotLong(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("array_l2_long"),
      new ExpressionInfo(classOf[ArrayL2Long].getName, "array_l2_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_l2_long(a, b) takes 2 arguments")
        ArrayL2Long(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("sparse_dot_long"),
      new ExpressionInfo(classOf[SparseDotLong].getName, "sparse_dot_long"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "sparse_dot_long(termsA, weightsA, termsB, weightsB) takes 4 arguments")
        SparseDotLong(args(0), args(1), args(2), args(3))
      }))
    e.injectFunction((
      new FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_hash64(s) takes 1 argument")
        RollingHash64(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens) takes 1 argument")
        new SimHash64(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("dedup_lines"),
      new ExpressionInfo(classOf[DedupLinesExpr].getName, "dedup_lines"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "dedup_lines(s) takes 1 argument")
        DedupLinesExpr(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(s) takes 1 argument")
        new NfcNormalize(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(hashes, k) takes 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $other")
        }
        MinHashSig(args.head, k)
      }))
  }
}
