package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) runs
  * interpreted — higher-order functions don't participate in whole-stage
  * codegen, and the lambda allocates per element. For similarity search
  * the dot product sits in the innermost loop (corpus × candidates ×
  * dim), so this is the single hottest expression in the engine; a tight
  * generated loop over the unsafe array data is ~10-50× the interpreted
  * lambda. Null elements are treated as 0 (quantized embeddings are
  * never element-null).
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot_long requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed locals: two instances of this expression in
      // ONE generated method (e.g. several dot products in a single
      // projection over non-nullable inputs) would otherwise declare
      // duplicate variables — janino fails and the whole stage silently
      // falls back to interpreted, defeating the expression's purpose
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

object ArrayDotLong {
  /** Column wrapper: `array_dot_long(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Shim.column(new ArrayDotLong(Shim.expression(a), Shim.expression(b)))
}
