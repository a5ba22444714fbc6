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

  /** Misra–Gries heavy-hitter summary: at most `k` counters of bounded state
    * per partial aggregate, mergeable (the summary of a union is the merge of
    * summaries), with the classic guarantee: every item with true frequency
    * > n/(k+1) survives in the output, and a surviving counter undercounts
    * its item by at most n/(k+1). Run it as the bounded-memory CANDIDATE
    * stage and verify candidates against exact counts — same
    * sketch-then-verify cascade as the MinHash and Bloom paths.
    */
  final case class MGBuf(counts: Map[String, Long])

  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: MGBuf = MGBuf(Map.empty)

    override def reduce(b: MGBuf, t: String): MGBuf = {
      val m = b.counts
      if (m.contains(t)) MGBuf(m.updated(t, m(t) + 1L))
      else if (m.size < k) MGBuf(m.updated(t, 1L))
      else {
        // decrement-all step: drop one from every counter (the incoming item
        // cancels against k others), removing exhausted counters
        MGBuf(m.flatMap { case (key, c) => if (c > 1L) Some(key -> (c - 1L)) else None })
      }
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val sum = (a.counts.keySet ++ b.counts.keySet).iterator
        .map(key => key -> (a.counts.getOrElse(key, 0L) + b.counts.getOrElse(key, 0L)))
        .toMap
      if (sum.size <= k) MGBuf(sum)
      else {
        // standard mergeable-summaries reduction (Agarwal et al.): subtract
        // the (k+1)-th largest count from every counter, keep positives —
        // at most k survive and the guarantee is preserved
        val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        MGBuf(sum.flatMap { case (key, c) => if (c > d) Some(key -> (c - d)) else None })
      }
    }

    override def finish(b: MGBuf): Map[String, Long] = b.counts
    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Count–min sketch over pre-hashed 64-bit keys (feed `xxhash64(col)` so
    * the hashing is identical and deterministic on both the build and the
    * probe side): a depth×width counter table where row r increments slot
    * `(lo + r·hi) mod width` (Carter–Wegman from the two 32-bit halves of
    * the key hash). Estimates — `min` over the depth slots, computed on the
    * PROBE side with plain `element_at`/`least` Columns against the
    * finished table — NEVER undercount, so `est ≥ exact` is a deterministic
    * property a correctness gate can assert, not a probabilistic one. The
    * buffer is a fixed depth·width Long array: bounded state per partial,
    * mergeable by elementwise add (runs as an ObjectHashAggregate with
    * map-side partials; the table, not the stream, crosses the shuffle).
    *
    * Width must be a power of two so the mod is a mask, bias-free over the
    * uniform xxhash halves.
    */
  final case class CMSBuf(table: Array[Long])

  final class CountMin(depth: Int, width: Int)
      extends Aggregator[Long, CMSBuf, Array[Long]] {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8]: $depth")
    require(width >= 16 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 16: $width")

    /** Slot for hash `h` in row `r` — mirrored exactly by the SQL probe
      * expression `((h & 4294967295) + r * shiftrightunsigned(h, 32)) % width`.
      */
    def slot(h: Long, r: Int): Int = {
      val hi = h >>> 32
      val lo = h & 0xffffffffL
      ((lo + r.toLong * hi) & (width - 1).toLong).toInt
    }

    override def zero: CMSBuf = CMSBuf(Array.ofDim[Long](depth * width))

    override def reduce(b: CMSBuf, h: Long): CMSBuf = {
      var r = 0
      while (r < depth) { b.table(r * width + slot(h, r)) += 1L; r += 1 }
      b
    }

    override def merge(a: CMSBuf, b: CMSBuf): CMSBuf = {
      var i = 0
      while (i < a.table.length) { a.table(i) += b.table(i); i += 1 }
      a
    }

    override def finish(b: CMSBuf): Array[Long] = b.table
    override def bufferEncoder: Encoder[CMSBuf] = Encoders.product[CMSBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
