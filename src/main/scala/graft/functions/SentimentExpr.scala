package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd lexicon sentiment scoring over a token array: one
  * pass per document emitting `struct(n_scored_tokens bigint,
  * sentiment_score bigint)`, with the standard unigram-negation rule (a
  * matched token's valence flips sign when the immediately preceding
  * token is a negation cue) folded into the same pass.
  *
  * Replaces the interpreted higher-order-function route
  * (`filter`/`aggregate`/`zip_with` with per-token `element_at` map
  * probes — three separate interpreted lambda walks per document):
  * HOFs don't participate in whole-stage codegen and allocate per
  * element, and this projection runs over EVERY document of the corpus
  * (the same §7.3 finding that produced [[ArrayL2Long]], which measured
  * q287 12.8 → 1.0 s). A/B measurement lives in
  * TextAnalysis.sentimentScore's scaladoc. The lexicon and negator set
  * ride the plan as reference objects (KBs — the broadcast-join
  * degenerate case, same as the map-literal they replace).
  *
  * Differential-specced against the HOF formulation
  * (TextAnalysis.sentimentScoreHof) in SentimentExprSpec. */
case class SentimentExpr(child: Expression,
                         lexicon: Map[String, Long],
                         negators: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sentiment_expr requires array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_scored_tokens", LongType, nullable = false),
    StructField("sentiment_score", LongType, nullable = false)))
  override def prettyName: String = "sentiment_expr"

  // UTF8String-keyed lookup structures, built once per task (transient:
  // rebuilt after deserialization on executors, never shipped as JVM
  // object graphs inside the expression tree)
  @transient private lazy val lexMap: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](lexicon.size * 2)
    lexicon.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val negSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(negators.size * 2, 4))
    negators.foreach(n => s.add(UTF8String.fromString(n)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var cnt = 0L
    var score = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) prev = null
      else {
        val t = toks.getUTF8String(i)
        val w = lexMap.get(t)
        if (w != null) {
          val v = if (prev != null && negSet.contains(prev)) -w.longValue()
            else w.longValue()
          cnt += 1L
          score += v
        }
        prev = t
      }
      i += 1
    }
    InternalRow(cnt, score)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lexRef = ctx.addReferenceObj("lexMap", lexMap,
      classOf[java.util.HashMap[UTF8String, java.lang.Long]].getName)
    val negRef = ctx.addReferenceObj("negSet", negSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val score = ctx.freshName("score")
      val prev = ctx.freshName("prev")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val w = ctx.freshName("w")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long $cnt = 0L;
         |long $score = 0L;
         |UTF8String $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $prev = null; continue; }
         |  UTF8String $t = $a.getUTF8String($i);
         |  java.lang.Long $w = (java.lang.Long) $lexRef.get($t);
         |  if ($w != null) {
         |    long $v = ($prev != null && $negRef.contains($prev))
         |      ? -$w.longValue() : $w.longValue();
         |    $cnt += 1L;
         |    $score += $v;
         |  }
         |  $prev = $t;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[] { $cnt, $score });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SentimentExpr =
    copy(child = newChild)
}

object SentimentExpr {
  /** Column wrapper: `sentiment_expr(tokens)` with a static lexicon and
    * (possibly empty) negation-cue list. */
  def apply(tokens: Column, lexicon: Map[String, Int],
            negators: Seq[String]): Column =
    Shim.column(new SentimentExpr(Shim.expression(tokens),
      lexicon.map { case (k, v) => k -> v.toLong }, negators))
}
