package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First-occurrence-preserving line dedup of a document (the CCNet-style
  * repetition filter's core): keeps each line's first occurrence in
  * order, drops repeats. One hash-set pass — O(total chars) per row —
  * replacing the `filter(lines, (x, i) => array_position(lines, x) ==
  * i+1)` formulation, which scans the line array per element (O(lines²):
  * a scraped page with 10⁵ repeated lines would pin one task at 10¹⁰
  * comparisons). Still a pure per-row projection: no shuffle at any
  * scale, and the codegen'd call keeps the enclosing stage compiled.
  */
case class DedupLinesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dedup_lines requires string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "dedup_lines"

  override def nullSafeEval(v: Any): Any =
    DedupLinesExpr.dedupe(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupLinesExpr$$.MODULE$$.dedupe($c)")

  override protected def withNewChildInternal(newChild: Expression): DedupLinesExpr =
    copy(child = newChild)
}

object DedupLinesExpr {
  /** Semantics match `split(text, "\n", -1)` + keep-first + join:
    * trailing empty lines preserved, line order preserved. */
  def dedupe(s: UTF8String): UTF8String = {
    val lines = s.toString.split("\n", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < lines.length) { seen.add(lines(i)); i += 1 }
    if (seen.size == lines.length) s // nothing repeated: zero-copy
    else UTF8String.fromString(String.join("\n", seen))
  }

  def apply(c: Column): Column = Shim.column(new DedupLinesExpr(Shim.expression(c)))
}
