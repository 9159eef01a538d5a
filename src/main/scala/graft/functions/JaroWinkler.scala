package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, scaled to e6 integer micro-units.
  *
  * Record-linkage scoring for short identifier-like strings (names,
  * codes) where Levenshtein over-penalizes transpositions. Spark has no
  * built-in; a native expression keeps the scorer inside whole-stage
  * codegen on the candidate-pair hot path (the generated code calls one
  * static method — same shape as Spark's own string expressions).
  *
  * Algorithm (standard Jaro + Winkler prefix boost, the same variant
  * DuckDB 1.0 ships, verified bit-identical over 32k real pairs):
  *   - empty either side -> 0 (NOT the "both empty -> 1" variant);
  *   - match window = max(l1,l2)/2 - 1 (floor, min 0), greedy
  *     left-to-right matching, transpositions = half the mismatched
  *     matched positions;
  *   - jaro = (m/l1 + m/l2 + (m-t)/m) / 3, IEEE double in exactly
  *     this operation order;
  *   - if jaro > 0.7: += commonPrefix(<=4) * 0.1 * (1 - jaro).
  * The e6 rounding (`floor(x*1e6 + 0.5)`) happens inside the
  * expression so the public output type is BIGINT — inside the
  * registry's driver-canonicalization envelope (no raw doubles at a
  * query edge).
  *
  * The scorer is O(l1*l2) per pair — callers MUST block first (prefix
  * buckets, SymSpell neighborhoods, LSH) so it only ever runs on
  * candidate pairs, never n².
  */
case class JaroWinklerE6(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler_e6 requires string inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_e6"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerE6.simE6(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerE6.simE6($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerE6 =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerE6 {

  /** Static entry point shared by eval and generated code. Operates on
    * java.lang.String code units — the test corpus is ASCII; for
    * supplementary-plane text the per-char comparison is still
    * deterministic (both sides compare UTF-16 units). */
  def simE6(a: UTF8String, b: UTF8String): Long = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0L
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // IEEE double, exactly this operation order (parity contract with
    // the DuckDB oracle — do NOT refactor the arithmetic)
    var sim = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      sim += p * 0.1 * (1.0 - sim)
    }
    math.floor(sim * 1e6 + 0.5).toLong
  }

  /** Column wrapper: `jaro_winkler_e6(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Shim.column(new JaroWinklerE6(Shim.expression(a), Shim.expression(b)))
}
