package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Sketch expressions: the per-document inner loops of SimHash and
  * MinHash as single compiled expressions instead of explode + k
  * aggregate columns. Per-row granularity means one virtual call per
  * DOCUMENT (CodegenFallback is fine); the token×bit / shingle×seed
  * loops run as tight JVM loops over primitive arrays — no shuffle, no
  * row explosion, no wide agg buffers.
  *
  * Hash compatibility: XxHash64Function with seed 42 == SQL `xxhash64`
  * with its default seed, so results are bit-identical to the
  * explode+aggregate formulations (asserted in SketchExpressionsSpec).
  */

/** simhash64(tokens: array<string>) -> bigint */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column = Shim.column(new SimHash64(Shim.expression(c)))
}

/** minhash_sig(shingleHashes: array<bigint>, k) -> array<bigint>
  * (k min values of xxhash64(seed=i, h), matching
  * Dedup.minhashSignatureFromHashes bit-for-bit). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // an empty hash array yields a NULL signature (below), whatever the
  // child's nullability
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // array_min over an empty transform is NULL in the SQL formulation —
    // match it exactly (a MaxValue sentinel here would give the two
    // "bit-identical" paths different band hashes on shingle-less docs)
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val isNull = arr.isNullAt(i)
      var s = 0
      while (s < k) {
        // xxhash64(seed=s, h): seed int hashed first, then the long —
        // matches the SQL expression xxhash64(lit(s), h). xxhash64
        // SKIPS null children (the chain value passes through), so a
        // null element contributes the seed chain alone — again
        // matching, not dropping the element as an earlier version did
        val seeded = XxHash64Function.hash(s, IntegerType, 42L)
        val hv = if (isNull) seeded
          else XxHash64Function.hash(arr.getLong(i), LongType, seeded)
        if (hv < mins(s)) mins(s) = hv
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, k: Int): Column =
    Shim.column(new MinHashSig(Shim.expression(c), k))
}

/** bloom_keep_hashes(shingleHashes: array<bigint>) -> array<bigint>:
  * keeps only the hashes a serialized benchmark Bloom filter MIGHT
  * contain — the map-side prefilter of Curation.contaminationBloom.
  * One virtual call per DOCUMENT; the per-hash probe loop runs tight
  * over the primitive array. The filter bytes travel in the serialized
  * expression (MB-scale for millions of benchmark shingles) and
  * deserialize lazily once per executor. Bloom filters have no false
  * negatives, so dropping non-members here never loses a contaminated
  * shingle; false positives are removed downstream by the exact
  * semi-join verify. */
case class BloomKeepHashes(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_keep_hashes requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_keep_hashes"

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        if (bloom.mightContainLong(h)) out += h
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): BloomKeepHashes =
    copy(child = newChild)
}

object BloomKeepHashes {
  def apply(c: Column, bloomBytes: Array[Byte]): Column =
    Shim.column(new BloomKeepHashes(Shim.expression(c), bloomBytes))
}
