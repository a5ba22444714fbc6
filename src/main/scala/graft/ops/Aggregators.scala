package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` demos (SURVEY §7.5): custom aggregation
  * state machines that still run as Tungsten hash aggregates with map-side
  * partial merge — the idiomatic Spark form of a UDAF.
  *
  * The buffer keeps EXACT decimal sums so the result is order-independent and
  * hash-comparable against a SQL oracle (a double-accumulating UDAF would be
  * partition-order dependent).
  */
object Aggregators {

  /** Weighted mean of `value` weighted by `weight`, with exact decimal sums.
    * Returns (sum(value·weight), sum(weight)) so callers derive the mean as
    * one deterministic double division.
    */
  final case class WSumBuf(swv: BigDecimal, sw: BigDecimal)

  object WeightedSums extends Aggregator[(Double, Double), WSumBuf, (BigDecimal, BigDecimal)] {
    private def d(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    override def zero: WSumBuf = WSumBuf(BigDecimal(0), BigDecimal(0))
    override def reduce(b: WSumBuf, in: (Double, Double)): WSumBuf =
      WSumBuf(b.swv + d(in._1) * d(in._2), b.sw + d(in._2))
    override def merge(a: WSumBuf, b: WSumBuf): WSumBuf =
      WSumBuf(a.swv + b.swv, a.sw + b.sw)
    override def finish(b: WSumBuf): (BigDecimal, BigDecimal) = (b.swv, b.sw)
    override def bufferEncoder: Encoder[WSumBuf] = Encoders.product[WSumBuf]
    override def outputEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]
  }
}
