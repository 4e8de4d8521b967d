package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable-buffer column statistics (the chooser's inputs as a SQL aggregate). */
final case class LongStatsBuf(
    var n: Long,
    var mn: Long,
    var mx: Long,
    var maxBw: Long)

final case class LongStatsOut(n: Long, mn: Long, mx: Long, maxbw: Long)

/**
 * Typed aggregate computing the per-column stats the codec chooser consumes
 * (SURVEY.md §2.2 "stats collection for codec selection" as a UDAF): count, min,
 * max, and the max zigzag bit-width (== the BITPACK width the block would need).
 * Partial/final merge comes from Catalyst; usable in SQL via `graft_stats(col)`.
 */
class LongStatsAggregator extends Aggregator[Long, LongStatsBuf, LongStatsOut] {
  override def zero: LongStatsBuf = LongStatsBuf(0L, Long.MaxValue, Long.MinValue, 0L)

  override def reduce(b: LongStatsBuf, v: Long): LongStatsBuf = {
    b.n += 1
    if (v < b.mn) b.mn = v
    if (v > b.mx) b.mx = v
    val zz = (v << 1) ^ (v >> 63)
    val bw = 64 - java.lang.Long.numberOfLeadingZeros(zz)
    if (bw > b.maxBw) b.maxBw = bw
    b
  }

  override def merge(a: LongStatsBuf, b: LongStatsBuf): LongStatsBuf = {
    a.n += b.n
    if (b.mn < a.mn) a.mn = b.mn
    if (b.mx > a.mx) a.mx = b.mx
    if (b.maxBw > a.maxBw) a.maxBw = b.maxBw
    a
  }

  override def finish(b: LongStatsBuf): LongStatsOut =
    if (b.n == 0) LongStatsOut(0L, 0L, 0L, 0L) else LongStatsOut(b.n, b.mn, b.mx, b.maxBw)

  override def bufferEncoder: Encoder[LongStatsBuf] = Encoders.product[LongStatsBuf]
  override def outputEncoder: Encoder[LongStatsOut] = Encoders.product[LongStatsOut]
}

object StatsAggregator {
  /** Column form: `graft_stats(c)` -> struct<n, mn, mx, maxbw>. */
  def graft_stats(c: Column): Column = udaf(new LongStatsAggregator).apply(c)
}
