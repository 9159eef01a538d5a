package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the engine's `Aggregator[IN, BUF, OUT]` story, SURVEY
  * §2.9): length-weighted mean quality score per group. Buffers are tiny
  * (two doubles), merge is associative+commutative — partial aggregation
  * happens map-side and only 16 bytes per group cross the shuffle. */
object WeightedQuality {

  final case class Scored(weight: Double, score: Double)
  final case class Buf(var wsum: Double, var swsum: Double)

  val agg: Aggregator[Scored, Buf, Double] = new Aggregator[Scored, Buf, Double] {
    def zero: Buf = Buf(0.0, 0.0)
    def reduce(b: Buf, a: Scored): Buf = {
      b.wsum += a.weight; b.swsum += a.score * a.weight; b
    }
    def merge(x: Buf, y: Buf): Buf = {
      x.wsum += y.wsum; x.swsum += y.swsum; x
    }
    def finish(b: Buf): Double = if (b.wsum == 0) 0.0 else b.swsum / b.wsum
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
