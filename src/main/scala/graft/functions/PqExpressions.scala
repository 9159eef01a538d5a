package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Product-quantization inner loops as compiled expressions. The
  * column-algebra formulation (nSub × nCodes × subDim distance structs)
  * builds a multi-thousand-node Catalyst tree whose generated code runs
  * to megabytes — planning alone dominated the operator. Here the
  * codebook rides along as a flat constant and the argmin runs as a
  * tight JVM loop per row (CodegenFallback's one virtual call per ROW
  * is noise at document granularity — same trade as SimHash64).
  *
  * Tie-break parity: strict `<` keeps the FIRST minimal j, identical to
  * array_min over (distance, j) structs.
  */
abstract class PqBase extends UnaryExpression with CodegenFallback {
  def codebook: Seq[Long] // flattened [sub][code][dim]
  def nSub: Int
  def nCodes: Int
  def subDim: Int

  @transient protected lazy val cb: Array[Long] = codebook.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  /** Fail with a diagnosable message instead of an opaque
    * ArrayIndexOutOfBounds when a row's vector is shorter than the
    * codebook's nSub×subDim layout (schema drift, truncated embedding). */
  protected final def checkLength(arr: ArrayData): Unit =
    if (arr.numElements() < nSub * subDim)
      throw new IllegalArgumentException(
        s"$prettyName: input vector has ${arr.numElements()} elements, " +
          s"codebook expects at least ${nSub * subDim} (nSub=$nSub × subDim=$subDim)")

  /** (assigned code, distance to it) for subspace s of vector `arr`. */
  protected final def assign(arr: ArrayData, s: Int): (Int, Long) = {
    var best = Long.MaxValue
    var bj = 0
    var j = 0
    while (j < nCodes) {
      var d = 0L
      var i = 0
      val off = (s * nCodes + j) * subDim
      while (i < subDim) {
        val x = arr.getLong(s * subDim + i) - cb(off + i)
        d += x * x
        i += 1
      }
      if (d < best) { best = d; bj = j }
      j += 1
    }
    (bj, best)
  }
}

/** pq_encode(qv: array<bigint>) -> array<int> of per-subspace codes. */
case class PqEncode(child: Expression, codebook: Seq[Long],
                    nSub: Int, nCodes: Int, subDim: Int) extends PqBase {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    checkLength(arr)
    val codes = new Array[Int](nSub)
    var s = 0
    while (s < nSub) { codes(s) = assign(arr, s)._1; s += 1 }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** pq_quant_err(qv: array<bigint>) -> bigint total squared distance to
  * the assigned centroids (the per-row k-means objective term). */
case class PqQuantErr(child: Expression, codebook: Seq[Long],
                      nSub: Int, nCodes: Int, subDim: Int) extends PqBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_quant_err"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    checkLength(arr)
    var err = 0L
    var s = 0
    while (s < nSub) { err += assign(arr, s)._2; s += 1 }
    err
  }

  override protected def withNewChildInternal(newChild: Expression): PqQuantErr =
    copy(child = newChild)
}

object PqExpressions {
  private def flat(cb: Array[Array[Array[Long]]]): Seq[Long] =
    cb.flatten.flatten.toIndexedSeq

  def encode(c: Column, cb: Array[Array[Array[Long]]]): Column =
    Shim.column(PqEncode(Shim.expression(c), flat(cb),
      cb.length, cb(0).length, cb(0)(0).length))

  def quantErr(c: Column, cb: Array[Array[Array[Long]]]): Column =
    Shim.column(PqQuantErr(Shim.expression(c), flat(cb),
      cb.length, cb(0).length, cb(0)(0).length))
}
