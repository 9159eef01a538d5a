package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes
  * (h = h * 0x100000001b3 ^ byte — the FNV-1a-style recurrence used for
  * content fingerprinting / content-defined chunking). A single codegen'd
  * pass over the bytes; wraparound arithmetic is fine here because the
  * expression owns its own generated code (ANSI mode only constrains SQL
  * arithmetic operators).
  *
  * This is the engine-native document fingerprint: ~10× cheaper than
  * md5 (no digest allocation), stable across runs and partitionings.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h * 0x100000001b3L) ^ (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, not fixed locals — see ArrayDotLong.doGenCode: fixed
      // names collide when two instances land in one generated method
      // and the whole stage silently drops to interpreted
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * 0x100000001b3L) ^ ($b[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  def apply(c: Column): Column = Shim.column(new RollingHash64(Shim.expression(c)))
}
